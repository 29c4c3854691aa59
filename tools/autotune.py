"""Measure the fused attention kernels on THIS chip and cache the pick.

  python tools/autotune.py [--refresh] [--trainable-only]

Prints one JSON line with the per-kernel timings and the pick; the pick is
cached per device kind (~/.cache/vadcl_tpu/autotune.json) for drivers that
want the measured-fastest kernel without paying the ~20 s measurement every
launch.  ``tools/train.py --attn-kernel auto`` stays a static default
('fold'); pass the printed pick explicitly to use the tuned one.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--refresh", action="store_true",
                    help="re-measure even if cached")
    ap.add_argument("--trainable-only", action="store_true",
                    help="exclude inference-only kernels (packed)")
    args = ap.parse_args()

    import jax

    from vadcl_tpu.utils.autotune import (
        measure_attn_kernels,
        tuned_attn_kernel,
    )

    if jax.default_backend() == "cpu":
        print(json.dumps({"pick": "base", "note": "cpu backend, no fused path"}))
        return
    times = measure_attn_kernels()
    pick = tuned_attn_kernel(
        trainable_only=args.trainable_only, refresh=True
    )
    print(
        json.dumps(
            {
                "device_kind": jax.devices()[0].device_kind,
                "times_ms": {k: round(v * 1e3, 3) for k, v in times.items()},
                "pick": pick,
                "trainable_only": args.trainable_only,
            }
        )
    )


if __name__ == "__main__":
    main()

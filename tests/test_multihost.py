"""2-process jax.distributed CPU test (SURVEY §2.3 comm-backend row).

Launches tests/multihost_worker.py twice against a local coordinator; the
workers exercise the ``process_count() > 1`` branches of parallel/sharding.py
and HostDataLoader host slicing that single-process tests can never reach.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_multihost(tmp_path):
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    # the axon sitecustomize (PYTHONPATH) force-registers the TPU plugin in
    # every python process; the workers must be plain-CPU jax
    for var in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH", "PALLAS_AXON_POOL_IPS"):
        env.pop(var, None)
    env["VADCL_MH_DIR"] = str(tmp_path)  # shared output_dir for the 2-proc train()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, str(pid), "2"],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=570)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid}: multihost checks passed" in out

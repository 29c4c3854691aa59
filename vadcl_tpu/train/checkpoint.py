"""Checkpoint manager: save/restore named pytrees with auto-resume.

Replaces the reference's ad-hoc ``torch.save(model.state_dict())`` every epoch
*and* every 10 iterations (``main_predict.py:203-204, 339-340``), the tolerant
partial loader that strips the DDP ``module.`` prefix (``misc/utils.py:51-76``),
and adds the auto-resume the live code lacks (its dead DINO path had it,
``有用的函数包.py:174-206``).

Storage is a flat path->array npz per checkpoint ("/"-joined pytree paths as
keys) — self-contained, synchronous, and the same flat namespace the
torch-weight translator produces, so translated reference checkpoints load
through the identical tolerant-merge path.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import tempfile
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def flatten_state(tree: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        flat[_path_str(path)] = np.asarray(leaf)
    return flat


def unflatten_into(template: Any, flat: Dict[str, np.ndarray]) -> Any:
    def fill(path, leaf):
        key = _path_str(path)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key}")
        arr = flat[key]
        return jnp.asarray(arr, leaf.dtype).reshape(leaf.shape)

    return jax.tree_util.tree_map_with_path(fill, template)


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.max_to_keep = max_to_keep

    def _path(self, tag: str) -> str:
        return os.path.join(self.directory, f"ckpt_{tag}.npz")

    def save(self, tag: str, state: Any, metadata: Optional[dict] = None):
        flat = flatten_state(state)
        if metadata is not None:
            flat["__meta__"] = np.frombuffer(
                json.dumps(metadata).encode(), dtype=np.uint8
            )
        # atomic write: tmp file + rename
        fd, tmp = tempfile.mkstemp(dir=self.directory, suffix=".tmp")
        os.close(fd)
        with open(tmp, "wb") as f:
            np.savez(f, **flat)
        os.replace(tmp, self._path(str(tag)))
        self._gc()

    def restore(self, tag: str, template: Any) -> Any:
        with np.load(self._path(str(tag))) as z:
            flat = {k: z[k] for k in z.files if k != "__meta__"}
        return unflatten_into(template, flat)

    def metadata(self, tag: str) -> dict:
        with np.load(self._path(str(tag))) as z:
            if "__meta__" in z.files:
                return json.loads(z["__meta__"].tobytes().decode())
        return {}

    def latest_tag(self) -> Optional[str]:
        """Highest numeric tag (auto-resume target); 'best' is excluded."""
        best = None
        for name in os.listdir(self.directory):
            m = re.fullmatch(r"ckpt_(\d+)\.npz", name)
            if m:
                v = int(m.group(1))
                if best is None or v > best:
                    best = v
        return str(best) if best is not None else None

    def _gc(self):
        """Keep the newest ``max_to_keep`` numeric checkpoints (+ 'best')."""
        if not self.max_to_keep:
            return
        numeric = []
        for name in os.listdir(self.directory):
            m = re.fullmatch(r"ckpt_(\d+)\.npz", name)
            if m:
                numeric.append(int(m.group(1)))
        numeric.sort()
        for v in numeric[: -self.max_to_keep]:
            try:
                os.remove(self._path(str(v)))
            except OSError:
                pass


def tolerant_merge(
    template: Any, loaded_flat: Dict[str, np.ndarray]
) -> Tuple[Any, List[str], List[str]]:
    """Partial-load semantics of ``misc/utils.py:51-76``: update every leaf
    whose '/'-joined path matches a loaded key (with matching shape), keep the
    rest, and report hits/misses."""
    hits: List[str] = []
    misses: List[str] = []

    def merge(path, leaf):
        key = _path_str(path)
        if key in loaded_flat and tuple(loaded_flat[key].shape) == tuple(leaf.shape):
            hits.append(key)
            return jnp.asarray(loaded_flat[key], leaf.dtype)
        misses.append(key)
        return leaf

    merged = jax.tree_util.tree_map_with_path(merge, template)
    return merged, hits, misses

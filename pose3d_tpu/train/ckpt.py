"""Checkpointing: orbax save/restore with best-model copy + auto-resume.

Aux-subsystem parity (SURVEY.md §5 'Checkpoint / resume'):
  * per-epoch checkpoint + best-accuracy copy (reference utils.py:39-53,
    training.py:334-350) — here one orbax directory per role with a
    `best` subdir;
  * lenient partial restore: only matching subtrees are loaded, mismatches
    are skipped with a report (reference utils.py:56-73 silently drops —
    we log what was dropped);
  * auto-resume: `latest_epoch()` finds the newest step so an interrupted
    run continues without flags (the reference requires manual --model).

PyTorch .pth import lives in pose3d_tpu.train.torch_import.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, name: str, tree: Any, overwrite: bool = True) -> None:
        path = self._path(name)
        if overwrite and os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        self._ckptr.save(path, tree)
        self._ckptr.wait_until_finished()

    def restore(self, name: str, target: Any | None = None) -> Any:
        if target is not None:
            return self._ckptr.restore(self._path(name), target=target)
        # targetless restore: load as plain numpy so checkpoints written on
        # one platform (TPU) restore on another (CPU) — the saved sharding
        # metadata references devices that may not exist here
        path = self._path(name)
        ckptr = ocp.PyTreeCheckpointer()
        meta = ckptr.metadata(path).item_metadata
        tree = meta.tree if hasattr(meta, "tree") else meta
        restore_args = jax.tree.map(
            lambda m: ocp.RestoreArgs(restore_type=np.ndarray), tree)
        return ckptr.restore(path, restore_args=restore_args)

    def exists(self, name: str) -> bool:
        return os.path.isdir(self._path(name))

    def save_epoch(self, epoch: int, tree: Any, is_best: bool = False) -> None:
        self.save("checkpoint", tree)
        with open(self._path("EPOCH"), "w") as f:
            f.write(str(epoch))
        if is_best:
            self.save("best", tree)

    def latest_epoch(self) -> int | None:
        p = self._path("EPOCH")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())


def merge_partial(target: Any, restored: Any, path: str = "") -> tuple[Any, list[str]]:
    """Lenient merge: take values from `restored` where the structure + shape
    matches `target`, keep target values elsewhere; returns (merged, skipped)."""
    skipped: list[str] = []

    def _merge(t, r, p):
        if isinstance(t, dict):
            if not isinstance(r, dict):
                skipped.append(p)
                return t
            out = {}
            for k, v in t.items():
                if k in r:
                    out[k] = _merge(v, r[k], f"{p}/{k}")
                else:
                    skipped.append(f"{p}/{k}")
                    out[k] = v
            return out
        t_arr = np.asarray(t)
        r_arr = np.asarray(r)
        if t_arr.shape != r_arr.shape:
            skipped.append(f"{p} (shape {r_arr.shape} != {t_arr.shape})")
            return t
        return r

    merged = _merge(jax.tree.map(lambda x: x, target), restored, path)
    return merged, skipped

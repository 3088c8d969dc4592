"""Orbax checkpointing with the reference's best+last semantics.

The reference keeps top-1 on ``val_loss`` plus ``save_last`` with the metric
embedded in the filename, and ``--test`` re-parses the metric out of the
filename (``train_mask_bev.py:26-27,55-63,104-111``). Here the same policy is
explicit: ``best`` and ``last`` checkpoint dirs plus a small json index
mapping names to metrics — no filename parsing.
"""
from __future__ import annotations

import json
import pathlib
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, ckpt_dir: str):
        self.dir = pathlib.Path(ckpt_dir).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self._index_path = self.dir / "index.json"
        self.index: Dict[str, Any] = (
            json.loads(self._index_path.read_text())
            if self._index_path.exists() else {"best_val_loss": None,
                                               "best_step": None,
                                               "last_step": None})
        self._ckptr = ocp.StandardCheckpointer()

    def _write_index(self):
        self._index_path.write_text(json.dumps(self.index, indent=2))

    def _save(self, name: str, state) -> None:
        path = self.dir / name
        # orbax refuses to overwrite; stage to tmp then swap
        tmp = self.dir / f"{name}.tmp"
        if tmp.exists():
            import shutil

            shutil.rmtree(tmp)
        self._ckptr.save(tmp, jax.tree.map(np.asarray, state))
        self._ckptr.wait_until_finished()
        if path.exists():
            import shutil

            shutil.rmtree(path)
        tmp.rename(path)

    def save_last(self, state, step: int, epoch: int,
                  meta: Optional[Dict[str, Any]] = None) -> None:
        self._save("last", state)
        self.index["last_step"] = int(step)
        self.index["last_epoch"] = int(epoch)
        if meta is not None:
            self.index["last_meta"] = meta
        self._write_index()

    def save_best(self, state, step: int, epoch: int, val_loss: float,
                  meta: Optional[Dict[str, Any]] = None) -> bool:
        """Keep top-1 by val_loss (reference ModelCheckpoint semantics)."""
        best = self.index.get("best_val_loss")
        if best is None or val_loss < best:
            self._save("best", state)
            self.index["best_val_loss"] = float(val_loss)
            self.index["best_step"] = int(step)
            self.index["best_epoch"] = int(epoch)
            if meta is not None:
                self.index["best_meta"] = meta
            self._write_index()
            return True
        return False

    def meta(self, which: str = "last") -> Dict[str, Any]:
        """Host-side training metadata (plateau/early-stop state) saved
        alongside a checkpoint; empty for external checkpoint paths."""
        return dict(self.index.get(f"{which}_meta") or {})

    def restore(self, target, which: str = "last"):
        """which: 'last' | 'best' | explicit path."""
        path = {"last": self.dir / "last", "best": self.dir / "best"}.get(
            which, pathlib.Path(which))
        if not path.exists():
            return None
        return self._ckptr.restore(path, target=jax.tree.map(np.asarray, target))

    @property
    def has_last(self) -> bool:
        return (self.dir / "last").exists()

"""HPO trial-pruning hook for the train loop.

Rebuild of reference ``utils/optuna_prune_callback.py:8-41`` without a hard
optuna dependency: any object exposing ``report(value, step)`` and
``should_prune() -> bool`` (optuna's ``Trial`` qualifies) can prune training
at validation boundaries. In a multi-host deployment only process 0 makes the
decision; the result is broadcast through a host allgather.
"""
from __future__ import annotations

from typing import Optional, Protocol


class TrialLike(Protocol):
    def report(self, value: float, step: int) -> None: ...

    def should_prune(self) -> bool: ...


class TrialPruned(Exception):
    pass


class PruneCallback:
    def __init__(self, trial: TrialLike, monitor: str = "val_loss"):
        self.trial = trial
        self.monitor = monitor

    def on_validation_end(self, epoch: int, metrics: dict) -> None:
        value = metrics.get(self.monitor)
        if value is None:
            import warnings

            warnings.warn(
                f"metric '{self.monitor}' missing from validation metrics; "
                "cannot report to the trial")
            return
        import jax

        should_stop = False
        if jax.process_index() == 0:
            self.trial.report(float(value), step=epoch)
            should_stop = self.trial.should_prune()
        if jax.process_count() > 1:
            import jax.numpy as jnp
            from jax.experimental import multihost_utils

            should_stop = bool(multihost_utils.broadcast_one_to_all(
                jnp.asarray(should_stop)))
        if should_stop:
            raise TrialPruned(f"Trial was pruned at epoch {epoch}.")

"""Device mesh + sharding helpers (the reference's DDP, the TPU way).

The reference distributes with PyTorch-Lightning DDP over NCCL
(``train_mask_bev.py:92-96``) — one process per GPU, gradient allreduce,
``reduce_mean`` for loss normalizers, metric state reduction. Here a single
program spans the mesh: parameters/optimizer state are replicated, the batch
is sharded over the ``data`` axis, and jit emits the ICI collectives
(gradient psum, global loss normalizers) automatically because the step
function is written against the global batch.

Multi-host: call :func:`init_distributed` per host before building the mesh;
per-host data loading feeds only the local shard via
``jax.make_array_from_process_local_data``.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize the jax distributed runtime on multi-host deployments."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def maybe_init_distributed_from_env() -> bool:
    """Wire :func:`init_distributed` from the environment; returns whether a
    multi-process runtime was started.

    Replaces the reference's DDP process-group setup (Lightning
    ``strategy='ddp'``, ``train_mask_bev.py:92-96``): each host runs this
    same program, the jax runtime stitches their local devices into one
    global mesh. Env contract (explicit vars win over SLURM):

    - ``MASKBEV_COORDINATOR`` (host:port), ``MASKBEV_NUM_PROCESSES``,
      ``MASKBEV_PROCESS_ID``; or
    - SLURM: ``SLURM_NTASKS`` > 1 with ``SLURM_PROCID`` and
      ``MASKBEV_COORDINATOR`` pointing at task 0.
    """
    import os

    n = os.environ.get("MASKBEV_NUM_PROCESSES") or os.environ.get(
        "SLURM_NTASKS")
    if not n or int(n) <= 1:
        return False
    pid = os.environ.get("MASKBEV_PROCESS_ID") or os.environ.get(
        "SLURM_PROCID")
    coord = os.environ.get("MASKBEV_COORDINATOR")
    init_distributed(coord, int(n), int(pid) if pid is not None else None)
    return True


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding for input pytrees."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, jax.Array], mesh: Mesh,
                axis: str = "data") -> Dict[str, jax.Array]:
    """Place a host batch onto the mesh, sharded along the leading dim."""
    n = mesh.devices.size
    for k, v in batch.items():
        if hasattr(v, "shape") and v.shape and v.shape[0] % n != 0:
            raise ValueError(
                f"batch leading dim {v.shape[0]} of '{k}' is not divisible "
                f"by the {n}-device mesh; set batch_size to a multiple of "
                f"the device count (or restrict the Trainer's devices)")
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate_state(state, mesh: Mesh):
    """Replicate a TrainState (params/opt/batch_stats) across the mesh."""
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), state)


def local_batch_to_global(batch: Dict[str, np.ndarray], mesh: Mesh,
                          axis: str = "data") -> Dict[str, jax.Array]:
    """Multi-host: assemble a global array from per-host local shards."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, x), batch)

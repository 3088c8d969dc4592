"""Two-process jax.distributed smoke test (the reference's DDP boundary).

Spawns 2 plugin-stripped CPU subprocesses that initialize the jax
distributed runtime over localhost, build a global data-parallel mesh from
both processes' virtual devices, assemble a global batch from per-process
local shards via ``local_batch_to_global``, and check a jitted global
reduction agrees with the single-process answer. This makes the multi-host
claims of ``parallel/mesh.py`` executable (reference counterpart:
Lightning DDP process group, ``train_mask_bev.py:92-96``).
"""
import os
import socket
import subprocess
import sys

import numpy as np

_CHILD = r"""
import os, sys
import numpy as np
import jax, jax.numpy as jnp

pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
from mask_bev_tpu.parallel.mesh import (
    init_distributed, local_batch_to_global, make_mesh)

init_distributed(f"127.0.0.1:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
mesh = make_mesh()  # all global devices, both processes
ndev = len(jax.devices())
assert ndev == 4, ndev  # 2 procs x 2 virtual cpu devices

# deterministic global batch; each process holds its own half
full = np.arange(4 * 3 * 5, dtype=np.float32).reshape(4, 3, 5)
local = full[pid * 2:(pid + 1) * 2]
batch = local_batch_to_global({"x": local}, mesh)
assert batch["x"].shape == full.shape, batch["x"].shape

@jax.jit
def global_stats(b):
    # cross-shard reduction: jit inserts the collectives
    return b["x"].sum(), (b["x"] ** 2).mean()

s, m = global_stats(batch)
np.testing.assert_allclose(float(s), full.sum(), rtol=1e-6)
np.testing.assert_allclose(float(m), (full ** 2).mean(), rtol=1e-6)
print(f"proc {pid}: ok sum={float(s)}")
"""


def test_two_process_mesh(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    env = dict(os.environ)
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and "axon_site" not in p]
    env["PYTHONPATH"] = os.pathsep.join([repo] + pp)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("PJRT_DEVICE", None)

    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", port],
            env=env, cwd=repo, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid}: ok" in out, out

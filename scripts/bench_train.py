#!/usr/bin/env python3
"""Train-step timing on the flagship config (reference envelope: batch 4,
fp32, 1 GPU — ``/root/reference/train_mask_bev.py:96-101``).

Prints one JSON line per compute_dtype with steps/s and ms/step, using the
relay-aware timing recipe (enqueue K steps, one data-dependent host read).
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    import jax
    import jax.numpy as jnp

    from mask_bev_tpu.config import semantic_kitti_default
    from mask_bev_tpu.datasets.synthetic import make_batch
    from mask_bev_tpu.train.step import create_train_state, make_train_step

    batch = int(os.environ.get("BENCH_TRAIN_BATCH", "4"))
    iters = int(os.environ.get("BENCH_TRAIN_ITERS", "10"))
    dtypes = os.environ.get("BENCH_TRAIN_DTYPES", "bfloat16,float32").split(",")

    for dt in dtypes:
        cfg = semantic_kitti_default().replace(
            max_points_per_scan=131072, max_num_pillars=32768,
            batch_size=batch, compute_dtype=dt)
        model, state = create_train_state(cfg, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(model, cfg), donate_argnums=0)

        rng = np.random.default_rng(0)
        batches = []
        for s in range(2):
            b = make_batch(rng, cfg, batch_size=batch)
            batches.append({k: jnp.asarray(v) for k, v in b.items()
                            if k != "num_instances"})

        t0 = time.time()
        state, logs, _ = step(state, batches[0], jax.random.PRNGKey(1))
        loss0 = float(logs["loss"])
        compile_s = time.time() - t0

        t0 = time.time()
        for i in range(iters):
            state, logs, _ = step(state, batches[i % 2],
                                  jax.random.PRNGKey(2 + i))
        loss_last = float(logs["loss"])  # device-stream barrier
        ms = (time.time() - t0) / iters * 1e3
        print(json.dumps({
            "metric": "train_step_ms", "value": round(ms, 2), "unit": "ms",
            "compute_dtype": dt, "batch": batch,
            "scans_per_sec": round(batch / ms * 1e3, 2),
            "compile_s": round(compile_s, 1),
            "loss_first": round(loss0, 3), "loss_last": round(loss_last, 3),
            "device": jax.devices()[0].device_kind,
        }), flush=True)


if __name__ == "__main__":
    main()

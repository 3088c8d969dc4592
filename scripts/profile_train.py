#!/usr/bin/env python3
"""Measured train-step time on the flagship config (VERDICT r2 #6).

Times the full jitted train step (forward + loss + Hungarian matching +
backward + optimizer update) at the reference's training envelope
(batch 4, ``/root/reference/train_mask_bev.py:96-101``), under both
``compute_dtype: float32`` and ``bfloat16``, using the relay-safe timing
recipe (enqueue K steps, one data-dependent scalar read of the last loss).
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def run(compute_dtype: str, batch: int, iters: int, n_points: int,
        trace_dir: str | None = None) -> float:
    import jax
    import jax.numpy as jnp

    from mask_bev_tpu.config import semantic_kitti_default
    from mask_bev_tpu.datasets.synthetic import make_batch
    from mask_bev_tpu.train.step import create_train_state, make_train_step

    cfg = semantic_kitti_default().replace(
        max_points_per_scan=n_points, max_num_pillars=32768,
        batch_size=batch, compute_dtype=compute_dtype)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, cfg), donate_argnums=0)

    rng = np.random.default_rng(0)
    staged = []
    for s in range(3):
        b = make_batch(np.random.default_rng(10 + s), cfg, batch_size=batch)
        staged.append({k: jnp.asarray(v) for k, v in b.items()
                       if k != "num_instances"})

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    state, logs, _ = step(state, staged[0], key)
    loss = float(logs["loss"])
    compile_s = time.time() - t0
    assert np.isfinite(loss), loss

    # warmup + timed window; one host sync at the end (relay-safe barrier)
    for s in staged:
        state, logs, _ = step(state, s, key)
    float(logs["loss"])
    t0 = time.time()
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            for i in range(iters):
                state, logs, _ = step(state, staged[i % 3], key)
            float(logs["loss"])
        print(f"trace written to {trace_dir}")
    else:
        for i in range(iters):
            state, logs, _ = step(state, staged[i % 3], key)
        float(logs["loss"])
    ms = (time.time() - t0) / iters * 1e3
    print(f"train step [{compute_dtype:9s}] b{batch}: {ms:8.2f} ms/step "
          f"({ms / batch:.2f} ms/scan, compile {compile_s:.1f}s, "
          f"loss {float(logs['loss']):.3f})")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--points", type=int, default=131072)
    ap.add_argument("--dtypes", type=str, default="float32,bfloat16")
    ap.add_argument("--trace", type=str, default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the timed window")
    args = ap.parse_args()
    for d in args.dtypes.split(","):
        run(d, args.batch, args.iters, args.points, trace_dir=args.trace)


if __name__ == "__main__":
    main()

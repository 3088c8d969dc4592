#!/bin/bash
# One serialized TPU measurement session (relay jobs must never overlap —
# concurrent client inits wedge the attachment relay, see NOTES.md).
# Usage: bash scripts/tpu_session.sh [outdir]
set -u
OUT=${1:-/tmp/tpu_session_$(date +%H%M)}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
# scripts/*.py import the package from the repo root; keep .axon_site (TPU plugin)
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

run() { # name, cmd...
  local name=$1; shift
  echo "=== $name: $* ==="
  timeout 1800 "$@" >"$OUT/$name.log" 2>&1
  echo "rc=$? (tail):"; tail -3 "$OUT/$name.log"
}

# 0. fast Mosaic-lowering smoke of every kernel flag combo
run smoke python scripts/tpu_smoke.py
# 1. bench at batch 8 (headline) — cold compile time is part of the result
run bench_b8 python bench.py
# 2. batch sweep (the round-2 b16<b8 anomaly)
BENCH_BATCH=4  run bench_b4  python bench.py
BENCH_BATCH=12 run bench_b12 python bench.py
BENCH_BATCH=16 run bench_b16 python bench.py
# 3. per-stage split + jax.profiler trace artifact
run profile python scripts/profile_model.py --batch 8 --trace "$OUT/trace"
# 3b. banded col-major backbone A/B
run profile_col python scripts/profile_model.py --batch 8 --band-layout col
# 3c. fused decoder-layer kernel A/B
run profile_head python scripts/profile_model.py --batch 8 --pallas-head
# 3d. int8-quantized backbone A/B
run profile_int8 python scripts/profile_model.py --batch 8 --int8
# 4. train-step timing, f32 vs bf16 (VERDICT r2 #6)
run train_time python scripts/profile_train.py --batch 4 --iters 6
echo "session artifacts in $OUT"

#!/bin/bash
# Round-5 session-2 serialized TPU battery: A/B the fused-eval scan unroll
# and the bf16-pooling PFN kernel, then trace the FULL bench graph for
# source-scope attribution of the residual glue.
set -u
OUT=${1:-/tmp/tpu_r5b}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

run() { # name, cmd...
  local name=$1; shift
  echo "=== $name: $* ==="
  timeout 2400 "$@" >"$OUT/$name.log" 2>&1
  echo "rc=$? (tail):"; tail -4 "$OUT/$name.log"
}

# 1. per-stage walls, new defaults (unroll_eval + pfn bf16 pooling)
run profile_new python scripts/profile_model.py --batch 8 --iters 15
# 2. A/B: keep the nn.scan step at eval (old behavior)
run profile_scan python scripts/profile_model.py --batch 8 --scan-eval
# 3. A/B: bf16 PFN pooling (packed-lane rolls; skipped if Mosaic rejects)
run profile_pfn16 python scripts/profile_model.py --batch 8 --pfn-bf16
# 4. full-graph forward + trace (the bench configuration)
run profile_full python scripts/profile_model.py --batch 8 --full \
    --trace "$OUT/trace_full"
run trace_sum python scripts/trace_summary.py "$OUT/trace_full" --top 40
# 5. batch sweep at the new perf point
BENCH_TRAIN=0 BENCH_BATCH=12 run bench_b12 python bench.py
BENCH_TRAIN=0 BENCH_BATCH=16 run bench_b16 python bench.py
echo "session artifacts in $OUT"

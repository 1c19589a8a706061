#!/bin/bash
# Push-button A/B sequence for when the TPU tunnel returns.
#
# Runs, each in a fresh process (never two TPU processes at once):
#   1. profile_stage legacy / --mxu / --mxu --i16taps   (per-piece ms)
#   2. bench.py 1080p-only: legacy vs MXU vs MXU+int16 knobs
# and saves every log under /tmp/tpu_ab/.  Inspect the logs, flip the
# winning PlaneSpec defaults, then run the full bench (with 4K) + parity.
set -u
OUT=/tmp/tpu_ab
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # run <name> <timeout-s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ($*)"
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  tail -25 "$OUT/$name.log"
  echo "--- $name rc=$rc"
}

run probe 120 python -c "import jax,numpy as np,jax.numpy as jnp; print(jax.devices()); x=jnp.ones((8,8)); print(np.asarray(x.sum()))"
grep -q "TPU" "$OUT/probe.log" || { echo "TPU not reachable; aborting"; exit 1; }

run profile_legacy 1200 python tools/profile_stage.py
run profile_mxu    1200 python tools/profile_stage.py --mxu
run profile_mxu_i16 1200 python tools/profile_stage.py --mxu --i16taps

run bench_legacy 2400 env VVC_BENCH_4K=0 python bench.py
run bench_mxu 2400 env VVC_BENCH_4K=0 VVC_BENCH_MXU=1 python bench.py
run bench_mxu_i16 2400 env VVC_BENCH_4K=0 VVC_BENCH_MXU=1 VVC_BENCH_I16=1 python bench.py

echo "=== summary (grep) ==="
grep -H "reduce_pred\|evaluate\|full stage" "$OUT"/profile_*.log
grep -H '"metric"' "$OUT"/bench_*.log

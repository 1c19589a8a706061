#!/bin/bash
# Round-3 follow-on A/B: the f32 warp-kernel MAC-field variant
# (PlaneSpec.f32_warp) vs the int32 baseline, plus knob combinations.
# Sequential fresh processes, never two TPU procs at once; logs under
# /tmp/tpu_ab (same dir as tools/tpu_return.sh).
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

run profile_f32 2400 python tools/profile_stage.py --f32
run bench_f32 2400 env VVC_BENCH_4K=0 VVC_BENCH_F32=1 python bench.py
run bench_f32_mxu 2400 env VVC_BENCH_4K=0 VVC_BENCH_F32=1 VVC_BENCH_MXU=1 python bench.py

echo "=== summary (grep) ==="
grep -H "warp\|evaluate\|full stage" "$OUT"/profile_f32.log
grep -H '"metric"' "$OUT"/bench_*.log

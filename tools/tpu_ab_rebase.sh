#!/bin/bash
# Round-3 A/B, part 3: the base-relative dispatcher (PlaneSpec.rebase),
# alone and combined with the f32 MAC fields.  Run AFTER tools/tpu_ab_f32.sh.
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

run profile_rb_f32 2400 python tools/profile_stage.py --rebase --f32
run bench_rb_f32 2400 env VVC_BENCH_4K=0 VVC_BENCH_F32=1 VVC_BENCH_REBASE=1 python bench.py
run bench_rb 2400 env VVC_BENCH_4K=0 VVC_BENCH_REBASE=1 python bench.py

echo "=== summary (grep) ==="
grep -H "warp\|evaluate\|full stage" "$OUT"/profile_rb_f32.log
grep -H '"metric"' "$OUT"/bench_*.log

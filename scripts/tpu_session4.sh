#!/bin/bash
# Round-4 session C: finish the interrupted compaction measurements.
# 1) twohands at the realistic framing with the active-tile grid (the
#    r4b run was cut off), 2) demo full-res with compaction (the 479 ms
#    record predates it; audited grid reduction x5.2), 3) fused-AB demo
#    A/B (fused saves a full grid pass of fixed overhead — matters most
#    where the tile count is largest), 4) op-level trace of prod at the
#    current default config for the next optimization round.
set -u
cd "$(dirname "$0")/.."
mkdir -p scripts/tpu_logs
L=scripts/tpu_logs/r4c.log
: >"$L"

run() { # name, timeout_s, cmd...
  local name=$1 t=$2; shift 2
  echo "=== $name $(date +%H:%M:%S) ===" >>"$L"
  timeout "$t" "$@" >>"$L" 2>&1
  echo "--- $name rc=$? $(date +%H:%M:%S) ---" >>"$L"
  sleep 20
}

run r4c_twohands 2000 python bench.py --preset twohands
run r4c_demo 4500 env FMHR_BENCH_TIMEOUT_S=2000 FMHR_BENCH_ATTEMPTS=2 \
    python bench.py --preset demo
run r4c_demo_fused 4500 env FMHR_FUSED_AB=1 FMHR_BENCH_TIMEOUT_S=2000 \
    FMHR_BENCH_ATTEMPTS=2 python bench.py --preset demo
run r4c_prod_trace 2400 env FMHR_BENCH_TIMEOUT_S=1100 \
    python bench.py --preset prod --trace
echo "ALL DONE $(date +%H:%M:%S)" >>"$L"

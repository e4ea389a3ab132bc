#!/bin/bash
# Reordered one-shot TPU measurement session (see tpu_session.sh for the
# environment notes): headline + evidence first, A/Bs after.
set -u
cd "$(dirname "$0")/.."
mkdir -p scripts/tpu_logs
L=scripts/tpu_logs

run() { # name, timeout_s, cmd...
  local name=$1 t=$2; shift 2
  echo "[tpu_session] $name: $*"
  timeout "$t" "$@" >"$L/$name.log" 2>&1
  echo "[tpu_session] $name exit=$? (log: $L/$name.log)"
  sleep 20
}

# 1) headline: prod bench (dense AA, default lists)
run bench_prod 2400 python bench.py --preset prod
# 2) component timings at ih geometry (clip vs projected core)
run profile_ih 1800 python scripts/profile_deferred.py --preset ih
# 3) op-level trace (ground truth for the next optimization target)
run trace_ih 1800 python scripts/trace_step.py --preset ih
# 4) compact-AA A/B
FMHR_AA_BUDGET=audit run bench_prod_aacompact 1800 python bench.py --preset prod
# 5) tile-shape A/B
FMHR_DEFERRED_TILE=16x32 run bench_prod_t16x32 1800 python bench.py --preset prod
# 6) pass-A DMA pipeline depth
FMHR_PASSA_DEPTH=4 run bench_prod_depth4 1800 python bench.py --preset prod
# 7) list-build A/B (scatter vs sort counting builds)
FMHR_DEFERRED_LISTS=sort run bench_prod_sortlists 1800 python bench.py --preset prod
# 8) production-density two-hands preset
run bench_twohands 1800 python bench.py --preset twohands
# 9) second tile shape
FMHR_DEFERRED_TILE=16x16 run bench_prod_t16x16 1800 python bench.py --preset prod

echo "[tpu_session] done; summary:"
for f in "$L"/bench_*.log; do
  echo "--- $f"; grep -h '^{' "$f" | tail -1
done

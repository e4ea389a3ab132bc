#!/bin/bash
# Round-3 one-shot TPU A/B matrix (VERDICT.md item 1): measure every
# built knob at the prod preset. Env vars are passed through `env`
# INSIDE the command (not as a prefix on the `run` function) so nothing
# leaks between steps (ADVICE.md round-2 finding #1).
set -u
cd "$(dirname "$0")/.."
mkdir -p scripts/tpu_logs
L=scripts/tpu_logs

run() { # name, timeout_s, cmd...
  local name=$1 t=$2; shift 2
  echo "[tpu_session3] $name: $*"
  timeout "$t" "$@" >"$L/$name.log" 2>&1
  echo "[tpu_session3] $name exit=$? (log: $L/$name.log)"
  sleep 15
}

# 1) baseline re-confirm
run r3_prod_base 2400 python bench.py --preset prod
# 2) pass-A DMA pipeline depth 4
run r3_prod_depth4 1800 env FMHR_PASSA_DEPTH=4 python bench.py --preset prod
# 3) tile shape 16x32
run r3_prod_t16x32 1800 env FMHR_DEFERRED_TILE=16x32 python bench.py --preset prod
# 4) tile shape 16x16
run r3_prod_t16x16 1800 env FMHR_DEFERRED_TILE=16x16 python bench.py --preset prod
# 5) list build: sort variant
run r3_prod_sortlists 1800 env FMHR_DEFERRED_LISTS=sort python bench.py --preset prod
# 6) depth4 + 16x32 combo
run r3_prod_d4t16x32 1800 env FMHR_PASSA_DEPTH=4 FMHR_DEFERRED_TILE=16x32 python bench.py --preset prod
# 7) two-hands preset baseline
run r3_twohands 1800 python bench.py --preset twohands

echo "[tpu_session3] done; summary:"
for f in "$L"/r3_*.log; do
  echo "--- $f"; grep -h '^{' "$f" | tail -1
done

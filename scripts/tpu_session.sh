#!/bin/bash
# One-shot TPU measurement session: run the moment the axon tunnel is back.
# Collects every pending A/B into logs under scripts/tpu_logs/.
#
# Environment notes (TODO.md): the tunneled TPU flakes on the FIRST large
# compile of a process; bench.py's supervisor retries + the persistent
# compile cache handle that. NEVER kill a TPU process mid-run (poisons the
# claim ~5-10 min) — every step here runs under `timeout`, which sends
# SIGTERM and lets the process exit cleanly.
set -u
cd "$(dirname "$0")/.."
mkdir -p scripts/tpu_logs
L=scripts/tpu_logs

probe() {
  timeout 180 python -c "
import jax, jax.numpy as jnp
print(jax.devices()); print(jnp.ones((8,128)).sum())" \
    >"$L/probe.log" 2>&1
}

echo "[tpu_session] probing tunnel..."
if ! probe; then
  echo "[tpu_session] tunnel DOWN (see $L/probe.log)"; exit 1
fi
echo "[tpu_session] tunnel UP"

run() { # name, timeout_s, cmd...
  local name=$1 t=$2; shift 2
  echo "[tpu_session] $name: $*"
  timeout "$t" "$@" >"$L/$name.log" 2>&1
  echo "[tpu_session] $name exit=$? (log: $L/$name.log)"
  sleep 20   # let the claim settle between processes
}

# 1) headline: prod bench (dense AA, default lists)
run bench_prod 1800 python bench.py --preset prod
# 2) compact-AA A/B
FMHR_AA_BUDGET=audit run bench_prod_aacompact 1800 python bench.py --preset prod
# 3) list-build A/B (scatter vs sort counting builds)
FMHR_DEFERRED_LISTS=sort run bench_prod_sortlists 1800 python bench.py --preset prod
# 4) component timings at ih geometry
run profile_ih 1800 python scripts/profile_deferred.py --preset ih
# 5) op-level trace (ground truth for the next optimization target)
run trace_ih 1800 python scripts/trace_step.py --preset ih
# 6) production-density two-hands preset
run bench_twohands 1800 python bench.py --preset twohands
# 7) tile-shape A/B: pass-A element work 0.55x (16x32) / 0.31x (16x16)
#    vs 32x32 at ih geometry — if pass A is compute-bound these win big;
#    if grid-step overhead dominates they lose (see deferred.py header)
FMHR_DEFERRED_TILE=16x32 run bench_prod_t16x32 1800 python bench.py --preset prod
FMHR_DEFERRED_TILE=16x16 run bench_prod_t16x16 1800 python bench.py --preset prod
# 8) pass-A DMA pipeline depth (wins iff pass A is DMA-latency bound)
FMHR_PASSA_DEPTH=4 run bench_prod_depth4 1800 python bench.py --preset prod

echo "[tpu_session] done; summary:"
for f in "$L"/bench_*.log; do
  echo "--- $f"; grep -h '^{' "$f" | tail -1
done

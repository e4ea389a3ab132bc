#!/bin/bash
# Round-4 session D (runs after tpu_session4.sh writes ALL DONE):
# 1) demo bench under the tile-fraction-scaled microbatch sizing
#    (expect view_microbatch 8 = unchunked; the segment OOM fallback
#    covers a misestimate),
# 2) full-res pipeline RESUME in runs/full1 (orbax restores the
#    finished HAM stage B + both NR phases; records the on-chip NR
#    render fps added to the quality JSON, and proves full-scale
#    checkpoint/resume),
# 3) tile-shape A/B at prod WITH the active-tile grid: 8x16 and 4x32
#    halve the per-pair [P, K] element work for ~1.3x pairs; the r3
#    verdict (small tiles lose on per-grid-step overhead) predates the
#    compacted grid, which removed 77% of grid steps.
set -u
cd "$(dirname "$0")/.."
L=scripts/tpu_logs/r4d.log
: >"$L"

while ! grep -q "ALL DONE" scripts/tpu_logs/r4c.log 2>/dev/null; do
  sleep 60
done
sleep 60

run() { # name, timeout_s, cmd...
  local name=$1 t=$2; shift 2
  echo "=== $name $(date +%H:%M:%S) ===" >>"$L"
  timeout "$t" "$@" >>"$L" 2>&1
  echo "--- $name rc=$? $(date +%H:%M:%S) ---" >>"$L"
  sleep 20
}

run r4d_demo_mb 4500 env FMHR_BENCH_TIMEOUT_S=2000 FMHR_BENCH_ATTEMPTS=2 \
    python bench.py --preset demo

( cd runs/full1 && \
  PYTHONPATH=/root/repo:/root/.axon_site:${PYTHONPATH:-} \
  FMHR_HAM_SYNC=1 FMHR_MAX_SEG_STEPS=60 \
  timeout 3600 python -m fmhr_tpu.cli.demo_pipeline \
    --data_path /root/reference/demo_data --scan_id 1 \
    --res_scale 1.0 --holdout 2 --nr_batch 1 --checkpoints \
    >> pipeline_resume.log 2>&1
  echo "--- resume rc=$? $(date +%H:%M:%S) ---" >> pipeline_resume.log )
echo "=== pipeline resume done, see runs/full1/pipeline_resume.log ===" >>"$L"
sleep 20

run r4d_prod_t8x16 2400 env FMHR_DEFERRED_TILE=8x16 \
    FMHR_BENCH_TIMEOUT_S=1100 python bench.py --preset prod
run r4d_prod_t4x32 2400 env FMHR_DEFERRED_TILE=4x32 \
    FMHR_BENCH_TIMEOUT_S=1100 python bench.py --preset prod
echo "ALL DONE $(date +%H:%M:%S)" >>"$L"

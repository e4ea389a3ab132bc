#!/bin/bash
# Round-5 final measurement session: regenerate the committed bench
# compile cache from COLD with the final code/template, then verify the
# driver scenario (timeout 900 python bench.py) twice warm, then record
# demo + twohands. Run from /root/repo with the TPU free.
set -x
cd /root/repo
rm -rf .jax_bench_cache
ts() { date +%H:%M:%S; }
echo "=== cold prod (cache regen) $(ts)"
timeout 1500 python bench.py --_worker --preset prod 2>&1 | grep -v WARNING | tail -6
echo "=== warm verify 1 $(ts)"
timeout 900 python bench.py 2>&1 | grep -v WARNING | tail -3
echo "rc=$?"
echo "=== warm verify 2 $(ts)"
timeout 900 python bench.py 2>&1 | grep -v WARNING | tail -3
echo "rc=$?"
echo "=== demo $(ts)"
timeout 1500 python bench.py --_worker --preset demo 2>&1 | grep -v WARNING | tail -4
echo "=== twohands $(ts)"
timeout 1500 python bench.py --_worker --preset twohands 2>&1 | grep -v WARNING | tail -4
echo "=== done $(ts)"
du -sh .jax_bench_cache

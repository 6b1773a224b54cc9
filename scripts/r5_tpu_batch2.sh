#!/bin/bash
# Round-5 TPU batch 2: neighbor-width A/B on the production cluster config
# (K=32 is the round-2 default, never re-tested after unit granularity +
# grid/edge queries made candidates much sparser). K cuts the CC sweep's
# (K, N) gather and the edge re-interleave sort linearly. Accuracy is
# guarded by the golden oracle (run at the winning K before adopting).
set -x
cd /root/repo
MINSU3D_BENCH_BIG=0 MINSU3D_BENCH_OVERRIDES="data.caps.neighbors=16" \
  python bench.py 8 1 pointgroup > logs/r5b_k16.log 2> logs/r5b_k16.err
MINSU3D_BENCH_BIG=0 MINSU3D_BENCH_OVERRIDES="data.caps.neighbors=8" \
  python bench.py 8 1 pointgroup > logs/r5b_k8.log 2> logs/r5b_k8.err
MINSU3D_BENCH_BIG=0 MINSU3D_BENCH_OVERRIDES="data.caps.cell_window=16" \
  python bench.py 8 1 pointgroup > logs/r5b_w16.log 2> logs/r5b_w16.err
echo ALLDONE

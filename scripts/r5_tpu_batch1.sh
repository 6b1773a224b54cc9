#!/bin/bash
# Round-5 TPU batch 1 (sequential — the tunnel serves one process):
#  1. golden evals x3 (bit-identity oracle after cc_coarsen default flip)
#  2. PointGroup bench A/B: coarsen_sweeps=1
#  3. HAIS + SoftGroup benches (resume the interrupted session-3 queue)
#  4. PointGroup train bench: full gates + prepare phase decomposition
set -x
cd /root/repo
bash scripts/eval_synth_pointgroup.sh > logs/r5b_eval_pg.log 2> logs/r5b_eval_pg.err
bash scripts/eval_synth_hais.sh       > logs/r5b_eval_hais.log 2> logs/r5b_eval_hais.err
bash scripts/eval_synth_softgroup.sh  > logs/r5b_eval_sg.log 2> logs/r5b_eval_sg.err
MINSU3D_BENCH_BIG=0 MINSU3D_BENCH_OVERRIDES="data.caps.cc_coarsen_sweeps=1" \
  python bench.py 8 1 pointgroup > logs/r5b_sweeps1.log 2> logs/r5b_sweeps1.err
MINSU3D_BENCH_BIG=0 python bench.py 8 1 hais      > logs/r5b_hais.log 2> logs/r5b_hais.err
MINSU3D_BENCH_BIG=0 python bench.py 8 1 softgroup > logs/r5b_sg.log 2> logs/r5b_sg.err
MINSU3D_BENCH_BIG=0 MINSU3D_BENCH_TRAIN=1 \
  python bench.py 8 1 pointgroup > logs/r5b_train999.log 2> logs/r5b_train999.err
MINSU3D_BENCH_BIG=0 MINSU3D_BENCH_TRAIN=1 MINSU3D_BENCH_TRAIN_EPOCH=0 \
  python bench.py 8 1 pointgroup > logs/r5b_train0.log 2> logs/r5b_train0.err
echo ALLDONE

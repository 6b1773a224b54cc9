#!/bin/bash
# Round-5c TPU batch 2 (sequential — the tunnel serves one process):
#  1. golden evals x3: bit-identity oracle after the threshold-aware
#     clusters_dropped counter (membership is unchanged by construction —
#     tests/test_cluster.py::test_compact_labels_big_thre_counter — but the
#     oracle is the ground truth for any clustering-adjacent change)
#  2. PointGroup train A/B: blocked-window subm conv OFF in the train step
#     (the lax.scan window loop may serialize the backward; inference keeps
#     blocked_subm — only train_scenes_per_sec is read from this run)
#  3. SoftGroup bench (the round-5b run died mid-compile with its session)
set -x
cd /root/repo
bash scripts/eval_synth_pointgroup.sh > logs/r5c_eval_pg.log 2> logs/r5c_eval_pg.err
bash scripts/eval_synth_hais.sh       > logs/r5c_eval_hais.log 2> logs/r5c_eval_hais.err
bash scripts/eval_synth_softgroup.sh  > logs/r5c_eval_sg.log 2> logs/r5c_eval_sg.err
MINSU3D_BENCH_BIG=0 MINSU3D_BENCH_TRAIN_EPOCH=999 \
  MINSU3D_BENCH_OVERRIDES="model.network.blocked_subm=[]" \
  python bench.py 8 1 pointgroup > logs/r5c_train_noblocked.log 2> logs/r5c_train_noblocked.err
MINSU3D_BENCH_BIG=0 python bench.py 8 1 softgroup > logs/r5c_sg.log 2> logs/r5c_sg.err
echo ALLDONE

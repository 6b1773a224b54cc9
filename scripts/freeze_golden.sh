#!/bin/bash
# Snapshot the freshly trained synthetic checkpoints into the FROZEN golden
# oracle paths (eval_synth_*.sh / bench.py / microbench tools read ONLY
# these), so training runs can never silently move the oracle again
# (round-3 postmortem in BENCH_NOTES). Run AFTER the train chain completes;
# then run the three eval_synth_*.sh and commit output/golden/ to git
# (the .gitignore already whitelists it).
set -eu
cd /root/repo
rm -rf output/golden
mkdir -p output/golden
cp -r output/Synthetic/PointGroup/synth_convergence/training/epoch_120 \
      output/golden/pointgroup_epoch_120
cp -r output/Synthetic/HAIS/synth_hais2/training/epoch_100 \
      output/golden/hais_epoch_100
cp -r output/Synthetic/SoftGroup/synth_softgroup/training/epoch_100 \
      output/golden/softgroup_epoch_100
du -sh output/golden/*
echo "frozen. Now: bash scripts/eval_synth_pointgroup.sh etc, then git add output/golden"

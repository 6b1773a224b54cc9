#!/bin/bash
# HAIS golden harness: with the frozen output/golden/hais_epoch_100 snapshot
# this eval must report AP 0.939 / AP50 0.962 / AP25 0.962 / mIoU 95.292 on
# TPU with NO capacity-overflow warning (round-4 retrain, committed to git;
# caps re-sized clean: eval_voxels 49152->65536, clusters 512->16384)
# (regenerate via train_synth_hais2.sh, 100 epochs; size-ordered cluster
# compaction fixed round-2's 0.885/0.923 — noise components were evicting
# kept fragments/primaries at the clusters=512 cap; 0.972 -> 0.983 came from
# the round-3 retrain whose checkpoint is now frozen under output/golden/).
cd /root/repo
exec python -u test.py model=hais data=synthetic \
  model.ckpt_path=output/golden/hais_epoch_100 \
  model.network.prepare_epochs=25 model.trainer.num_sanity_val_steps=0 \
  model.network.cal_iou_based_on_mask_start_epoch=40 \
  model.network.use_mask_filter_score_feature_start_epoch=40 \
  data.synthetic.train_scenes=12 data.synthetic.val_scenes=3 \
  data.synthetic.num_objects=8 data.synthetic.points_per_object=3000 \
  data.synthetic.floor_points=16000 \
  data.batch_size=2 \
  data.caps.points=98304 data.caps.voxels=90112 \
  data.caps.eval_points=57344 data.caps.eval_voxels=65536 \
  data.caps.cluster_units=49152 \
  data.caps.instances=64 data.caps.eval_instances=64 \
  data.caps.clusters=16384 data.caps.proposals=128 \
  experiment_name=synth_hais2 "$@"

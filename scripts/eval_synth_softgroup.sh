#!/bin/bash
# SoftGroup golden harness: after train_synth_softgroup.sh (100 epochs), this
# eval must report AP 0.924 / AP50 0.949 / mIoU 96.5 (epoch-100 ckpt;
# size-ordered cluster compaction lifted round-2's 0.769/0.782).
cd /root/repo
exec python -u test.py model=softgroup data=synthetic \
  model.ckpt_path=output/golden/softgroup_epoch_100 \
  model.network.prepare_epochs=25 model.trainer.num_sanity_val_steps=0 \
  data.synthetic.train_scenes=12 data.synthetic.val_scenes=3 \
  data.synthetic.num_objects=8 data.synthetic.points_per_object=3000 \
  data.synthetic.floor_points=16000 \
  data.batch_size=2 \
  data.caps.points=98304 data.caps.voxels=90112 \
  data.caps.eval_points=57344 data.caps.eval_voxels=49152 \
  data.caps.cluster_units=49152 \
  data.caps.instances=64 data.caps.eval_instances=64 \
  data.caps.clusters=512 data.caps.proposals=128 \
  experiment_name=synth_softgroup "$@"

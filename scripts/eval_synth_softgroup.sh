#!/bin/bash
# SoftGroup golden harness: with the frozen output/golden/softgroup_epoch_100
# snapshot this eval must report AP 0.983 / AP50 1.000 / AP25 1.000 /
# mIoU 96.688 on TPU with NO capacity-overflow warning (round-4 retrain,
# committed to git; caps re-sized clean: eval_voxels 49152->65536,
# clusters 512->16384).
cd /root/repo
exec python -u test.py model=softgroup data=synthetic \
  model.ckpt_path=output/golden/softgroup_epoch_100 \
  model.network.prepare_epochs=25 model.trainer.num_sanity_val_steps=0 \
  data.synthetic.train_scenes=12 data.synthetic.val_scenes=3 \
  data.synthetic.num_objects=8 data.synthetic.points_per_object=3000 \
  data.synthetic.floor_points=16000 \
  data.batch_size=2 \
  data.caps.points=98304 data.caps.voxels=90112 \
  data.caps.eval_points=57344 data.caps.eval_voxels=65536 \
  data.caps.cluster_units=49152 \
  data.caps.instances=64 data.caps.eval_instances=64 \
  data.caps.clusters=16384 data.caps.proposals=128 \
  experiment_name=synth_softgroup "$@"

#!/bin/bash
# SoftGroup convergence run on synthetic scenes, real TPU — same recipe
# proportions as the converged PointGroup run (see train_synth_hais2.sh).
cd /root/repo
exec python -u train.py model=softgroup data=synthetic \
  model.trainer.max_epochs=100 model.trainer.check_val_every_n_epoch=25 \
  model.network.prepare_epochs=25 model.trainer.num_sanity_val_steps=0 \
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
  experiment_name=synth_softgroup

#!/bin/bash
# PointGroup convergence run on synthetic scenes, real TPU.
cd /root/repo
exec python -u train.py model=pointgroup data=synthetic \
  model.trainer.max_epochs=60 model.trainer.check_val_every_n_epoch=20 \
  model.network.prepare_epochs=20 model.trainer.num_sanity_val_steps=0 \
  data.synthetic.train_scenes=12 data.synthetic.val_scenes=3 \
  data.synthetic.num_objects=8 data.synthetic.points_per_object=3000 \
  data.synthetic.floor_points=16000 \
  data.batch_size=2 model.trainer.devices=1 \
  data.caps.points=131072 data.caps.voxels=131072 \
  data.caps.eval_points=131072 data.caps.eval_voxels=98304 \
  data.caps.instances=64 data.caps.eval_instances=64 \
  data.caps.clusters=512 data.caps.proposals=128 \
  model.network.cluster.cluster_npoint_thre=50 \
  model.optimizer.lr=0.004 model.lr_decay.decay_start_epoch=30 \
  experiment_name=synth_convergence

#!/bin/bash
# PointGroup extension run: round-2 retrain ended at mIoU 58 (still climbing)
# when the cosine decay bottomed out; resume from epoch 60 for a second
# cosine cycle to 120 (warm restart, Adam state restored).
cd /root/repo
exec python -u train.py model=pointgroup data=synthetic \
  model.ckpt_path=output/Synthetic/PointGroup/synth_convergence/training/epoch_60 \
  model.trainer.max_epochs=120 model.trainer.check_val_every_n_epoch=20 \
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
  model.optimizer.lr=0.004 model.lr_decay.decay_start_epoch=60 \
  experiment_name=synth_convergence

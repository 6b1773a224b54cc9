"""Shared test fixtures: tiny configs + synthetic batches."""

import numpy as np

from minsu3d_tpu.config import load_config
from minsu3d_tpu.data.batching import collate, device_arrays, shard_caps
from minsu3d_tpu.data.dataset import GeneralDataset
from minsu3d_tpu.data.synthetic import make_scene

TINY_CAPS = [
    "data.caps.points=16384",
    "data.caps.voxels=16384",
    "data.caps.eval_points=16384",
    "data.caps.eval_voxels=16384",
    "data.caps.instances=64",
    "data.caps.eval_instances=64",
    "data.caps.clusters=128",
    "data.caps.proposals=64",
    "data.caps.proposal_voxels=16384",
    "data.caps.neighbors=16",
    "data.caps.cell_window=16",
    "data.batch_size=2",
    # small net: CPU XLA compile of the full 7-level UNet is minutes-slow
    "model.network.blocks=[1,2,3]",
    "model.network.m=8",
    "model.network.block_reps=1",
    "model.trainer.num_sanity_val_steps=0",  # avoid extra eval-graph compiles
]


def tiny_cfg(model="pointgroup", extra=()):
    return load_config([f"model={model}", "data=scannetv2", *TINY_CAPS, *extra])


def tiny_scenes(n=2, seed=0, num_objects=5, points_per_object=600, floor_points=3000,
                **scene_kw):
    return [
        make_scene(seed=seed + i, num_objects=num_objects,
                   points_per_object=points_per_object, floor_points=floor_points,
                   **scene_kw)
        for i in range(n)
    ]


def make_batch(cfg, split="train", n_scenes=2, seed=0, **scene_kw):
    ds = GeneralDataset(cfg, split, scenes=tiny_scenes(n_scenes, seed, **scene_kw))
    items = [ds[i] for i in range(min(n_scenes, len(ds)))]
    batch = collate(items, shard_caps(cfg, split))
    return batch, device_arrays(batch), items

"""Per-tap kernel-map density probe — sizes model.network.tap_compact.

For each UNet level of a bench-scale synthetic scene's grid plan, reports
the per-tap valid-pair counts (min/mean/max over the 26 non-center taps) as
fractions of the level capacity. ``tap_compact[l]`` must cover the MAX tap
fraction at level l or pairs drop (diag/tap_dropped).

CPU-only (host plan builder). Usage: python tools/probe_tap_density.py
"""
import sys

sys.path.insert(0, ".")
import os

os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np

from minsu3d_tpu.config import load_config
from minsu3d_tpu.data.batching import collate, shard_caps
from minsu3d_tpu.data.dataset import GeneralDataset
from minsu3d_tpu.data.synthetic import make_scene
from minsu3d_tpu.csrc import native

cfg = load_config(["model=pointgroup", "data=scannetv2",
                   "data.caps.eval_points=139264",
                   "data.caps.eval_voxels=122880"])
scenes = [make_scene(seed=s, num_objects=12, points_per_object=6000,
                     floor_points=40000, room=8.0) for s in range(2)]
ds = GeneralDataset(cfg, "val", scenes=scenes)
caps = shard_caps(cfg, "val")
from minsu3d_tpu.model.general_model import backbone_caps

vcaps = backbone_caps(cfg, "val")
num_levels = len(cfg.model.network.blocks)

for s in range(len(scenes)):
    b = collate([ds[s]], caps)
    plan = native.build_plan_host(b["voxel_batch"], b["voxel_coords"],
                                  b["voxel_mask"], vcaps, num_levels)
    print(f"# scene {s}")
    from minsu3d_tpu.ops.sparse import KERNEL_OFFSETS

    classes = {d: [k for k in range(27) if k != 13
                   and sum(abs(c) for c in KERNEL_OFFSETS[k]) == d]
               for d in (1, 2, 3)}
    for lvl in range(num_levels):
        nbr = plan[f"plan{lvl}_nbr"]
        cap = nbr.shape[0]
        count = int(plan[f"plan{lvl}_count"])
        taps = [k for k in range(27) if k != 13]
        cnts = np.array([(nbr[:, k] < cap).sum() for k in taps])
        cls_max = [max((nbr[:, k] < cap).sum() for k in ks) / cap
                   for ks in classes.values()]
        print(f"  L{lvl} cap={cap:7d} valid={count:7d} ({count/cap:5.1%})  "
              f"tap pairs/cap: min={cnts.min()/cap:6.3f} "
              f"mean={cnts.mean()/cap:6.3f} max={cnts.max()/cap:6.3f}  "
              f"class max f/e/c={cls_max[0]:.3f}/{cls_max[1]:.3f}/{cls_max[2]:.3f}  "
              f"rows dense=26cap={26*cap/1e6:.2f}M vs 2*sum={2*cnts.sum()/1e6:.2f}M")

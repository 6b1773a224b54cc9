"""CC pointer-jump count sweep on the real bench unit graphs (the fixpoint
is unique — every node ends at its component minimum — so labels are
identical for any jumps value; it is a pure speed knob).

Graph construction mirrors tools/microbench_cluster3.py (round-3 bench
fast-defaults, trained golden checkpoint). Timing = REPS enqueued
executions + one synchronize (the only pattern the axon tunnel reports
faithfully — see CLAUDE.md).

Usage: python tools/microbench_cc2.py [reps=10]
"""
import sys, time
sys.path.insert(0, ".")
from minsu3d_tpu.util.env import setup_jax_cache
setup_jax_cache()
import functools
import jax, jax.numpy as jnp, numpy as np
from minsu3d_tpu.config import load_config
from minsu3d_tpu.data.batching import collate, device_arrays, shard_caps
from minsu3d_tpu.data.dataset import GeneralDataset
from minsu3d_tpu.data.synthetic import make_scene
from minsu3d_tpu.model import get_model
from minsu3d_tpu.model import general_model as gm
from minsu3d_tpu.model.pointgroup import foreground_mask
from minsu3d_tpu.model.caps import StaticCaps
from minsu3d_tpu.ops.ballquery import ball_query_edge
from minsu3d_tpu.ops.cluster import connected_components

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 10

cfg = load_config(["model=pointgroup", "data=scannetv2",
    "model.trainer.precision=bfloat16",
    "data.caps.eval_points=139264", "data.caps.eval_voxels=122880",
    "data.caps.eval_instances=64",
    "data.caps.shifted_units=true",
    "data.caps.cluster_units_shifted=40960",
    "data.caps.cluster_cell_xyz=0.03",
    "data.caps.cluster_units=40960",
    "data.caps.neighbors=16",
    "data.caps.bq_edge_factor=28",
    "data.caps.bq_edge_factor_xyz=8"])
scenes = [make_scene(seed=0, num_objects=12, points_per_object=6000,
                     floor_points=40000, room=8.0)]
ds = GeneralDataset(cfg, "val", scenes=scenes)
caps = shard_caps(cfg, "val")
b = device_arrays(collate([ds[0]], caps))
b = jax.device_put(b); jax.block_until_ready(b)

bundle = get_model("PointGroup")
net = bundle.make_net(cfg, "val")
import orbax.checkpoint as ocp, os
restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(
    "output/golden/pointgroup_epoch_120"))
variables = {"params": restored["params"], "batch_stats": restored["batch_stats"]}

scaps = StaticCaps.from_cfg(cfg, "val")
radius = cfg.model.network.cluster.cluster_radius
ignore = tuple(cfg.data.ignore_classes)
K, W = max(scaps.neighbors // 2, 8), max(scaps.window // 4, 8)
u_cap = scaps.cluster_units

out = jax.jit(lambda v, bb: net.apply(v, bb, False, False))(variables, b)
sem_preds = jnp.argmax(out["semantic_scores"], axis=1).astype(jnp.int32)
obj = foreground_mask(sem_preds, b["point_mask"], ignore)
xyz = b["point_xyz"]
shifted = xyz + out["point_offsets"]
bids = b["vert_batch_ids"]
jax.block_until_ready((sem_preds, obj, shifted))


def agg(coords, uid_in, *, cap):
    uid = jnp.where(obj & (uid_in < cap), uid_in, cap)
    w = (uid < cap).astype(jnp.float32)
    csum = jnp.zeros((cap + 1, 3), jnp.float32).at[uid].add(coords * w[:, None])
    cnt = jnp.zeros((cap + 1,), jnp.float32).at[uid].add(w)
    u_coords = (csum / jnp.maximum(cnt, 1.0)[:, None])[:cap]
    u_active = cnt[:cap] > 0
    u_batch = jnp.full((cap + 1,), -1, jnp.int32).at[uid].max(
        jnp.where(uid < cap, bids, -1))[:cap]
    u_group = jnp.full((cap + 1,), -1, jnp.int32).at[uid].max(
        jnp.where(uid < cap, sem_preds, -1))[:cap]
    return u_coords, u_batch, u_active, u_group


graphs = {}
for name, coords, cell, ucap, ef in [
        ("xyz", xyz, scaps.xyz_grid_cell, u_cap, scaps.edge_factor_xyz),
        ("shifted", shifted, float(cfg.data.voxel_size),
         scaps.cluster_units_shifted, scaps.edge_factor)]:
    units, _ = jax.jit(functools.partial(
        gm.make_units_grid, u_cap=ucap, cell_size=cell))(
        bids, coords, sem_preds, obj)
    u_coords, u_batch, u_active, u_group = jax.jit(
        functools.partial(agg, cap=ucap))(coords, units)
    nbr_idx, nbr_valid, _ = jax.jit(functools.partial(
        ball_query_edge, radius=radius, k=K, window=W,
        edge_cap=(ef or scaps.edge_factor) * ucap,
        half_space=scaps.half_space, group=u_group))(
        u_coords, u_batch, u_active)
    graphs[name] = jax.block_until_ready(
        (nbr_idx, nbr_valid, u_active, u_group))

for name, (nbr_idx, nbr_valid, u_active, u_group) in graphs.items():
    ref = None
    for jumps in (2, 3, 4, 6, 8):
        f = jax.jit(functools.partial(
            connected_components, max_iters=scaps.cc_iters, jumps=jumps))
        r = f(nbr_idx, nbr_valid, u_active, u_group)
        np.asarray(r[:1])
        t0 = time.perf_counter()
        rs = [f(nbr_idx, nbr_valid, u_active, u_group) for _ in range(REPS)]
        jax.block_until_ready(rs)
        np.asarray(rs[-1][:1])
        dt = (time.perf_counter() - t0) / REPS
        same = True if ref is None else bool(jnp.all(r == ref))
        if ref is None:
            ref = r
        print(f"# CC {name:8s} jumps={jumps}  {dt*1000:8.2f} ms  "
              f"labels_match={same}", flush=True)

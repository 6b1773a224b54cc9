"""Cluster-stage decomposition at the ROUND-3 bench fast-defaults (grid
units, cap 40960, edge-buffer ball query, 3cm xyz cells) with the trained
epoch_120 checkpoint. Timing = many enqueued executions + one synchronize
(the only pattern the axon tunnel reports faithfully — see CLAUDE.md).

Usage: python tools/microbench_cluster3.py [reps=10]
"""
import sys, time
sys.path.insert(0, ".")
from minsu3d_tpu.util.env import setup_jax_cache
setup_jax_cache()
import jax, jax.numpy as jnp, numpy as np
from minsu3d_tpu.config import load_config
from minsu3d_tpu.data.batching import collate, device_arrays, shard_caps
from minsu3d_tpu.data.dataset import GeneralDataset
from minsu3d_tpu.data.synthetic import make_scene
from minsu3d_tpu.model import get_model
from minsu3d_tpu.model import general_model as gm
from minsu3d_tpu.model.pointgroup import foreground_mask, merge_clusterings
from minsu3d_tpu.model.caps import StaticCaps
from minsu3d_tpu.ops.ballquery import ball_query_edge
from minsu3d_tpu.ops.cluster import connected_components, compact_labels

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 10

cfg = load_config(["model=pointgroup", "data=scannetv2",
    "model.trainer.precision=bfloat16",
    "data.caps.eval_points=139264", "data.caps.eval_voxels=122880",
    "data.caps.eval_instances=64",
    "data.caps.shifted_units=true",
    "data.caps.cluster_units_shifted=40960",
    "data.caps.cluster_cell_xyz=0.03",
    "data.caps.cluster_units=40960",
    # production-tuned round-3 defaults (bench.py MODELS cluster_overrides)
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


def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args); jax.block_until_ready(r)   # compile + warm
    t0 = time.perf_counter()
    rs = [f(*args) for _ in range(REPS)]
    jax.block_until_ready(rs)
    dt = (time.perf_counter() - t0) / REPS
    print(f"# {name:42s} {dt*1000:9.2f} ms", flush=True)
    return rs[0]


# --- sub-stage probes (mirror pointgroup.py __call__ + cluster_units) -------
def f_units_xyz(xyz, sem_preds, obj):
    return gm.make_units_grid(bids, xyz, sem_preds, obj, u_cap, scaps.xyz_grid_cell)

def f_units_shift(shifted, sem_preds, obj):
    return gm.make_units_grid(bids, shifted, sem_preds, obj,
                              scaps.cluster_units_shifted, float(cfg.data.voxel_size))

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
    return u_coords, u_batch, u_active, u_group, uid

def f_bq(u, *, ef=None):
    u_coords, u_batch, u_active, u_group, _ = u
    return ball_query_edge(u_coords, u_batch, u_active, radius, K, W,
                           (ef or scaps.edge_factor) * u_coords.shape[0],
                           half_space=scaps.half_space, group=u_group)

def f_cc(u, nbr):
    _, _, u_active, u_group, _ = u
    nbr_idx, nbr_valid, _ = nbr
    return connected_components(nbr_idx, nbr_valid, u_active, u_group,
                                scaps.cc_iters)

def f_compact(u, u_label, *, cap):
    uid = u[4]
    ext = jnp.concatenate([u_label, jnp.full((1,), xyz.shape[0], jnp.int32)])
    point_label = jnp.where(uid < cap, ext[jnp.minimum(uid, cap)], xyz.shape[0])
    return compact_labels(point_label, uid < cap, scaps.clusters)

def f_cluster_full(xyz, shifted, sem_preds, obj):
    units, _ = gm.make_units_grid(bids, xyz, sem_preds, obj, u_cap,
                                  scaps.xyz_grid_cell)
    clus = gm.cluster_step(xyz, bids, obj, sem_preds, radius, scaps, units)
    units_s, _ = gm.make_units_grid(bids, shifted, sem_preds, obj,
                                    scaps.cluster_units_shifted,
                                    float(cfg.data.voxel_size))
    clus_s = gm.cluster_step(shifted, bids, obj, sem_preds, radius, scaps,
                             units_s, u_cap=scaps.cluster_units_shifted)
    return merge_clusterings([clus, clus_s], [50] * 2, xyz.shape[0],
                             scaps.proposals)[0]


units_xyz = timeit("make_units_grid xyz(3cm)", f_units_xyz, xyz, sem_preds, obj)[0]
units_sh = timeit("make_units_grid shifted(2cm)", f_units_shift, shifted, sem_preds, obj)[0]
import functools
u1 = timeit("unit agg xyz", functools.partial(agg, cap=u_cap), xyz, units_xyz)
u2 = timeit("unit agg shifted",
            functools.partial(agg, cap=scaps.cluster_units_shifted), shifted, units_sh)
print("# active units xyz:", int(jnp.sum(u1[2])), "shifted:", int(jnp.sum(u2[2])))
nbr1 = timeit("ball_query_edge xyz", functools.partial(
    f_bq, ef=scaps.edge_factor_xyz or None), u1)
nbr2 = timeit("ball_query_edge shifted", f_bq, u2)
print("# edges_dropped:", int(nbr1[2]), int(nbr2[2]),
      "valid nbrs/unit:", float(jnp.sum(nbr1[1])) / max(1, int(jnp.sum(u1[2]))),
      float(jnp.sum(nbr2[1])) / max(1, int(jnp.sum(u2[2]))))
lab1 = timeit("CC xyz", f_cc, u1, nbr1)
lab2 = timeit("CC shifted", f_cc, u2, nbr2)
timeit("compact xyz", functools.partial(f_compact, cap=u_cap), u1, lab1)
timeit("compact shifted",
       functools.partial(f_compact, cap=scaps.cluster_units_shifted), u2, lab2)
timeit("FULL cluster stage", f_cluster_full, xyz, shifted, sem_preds, obj)

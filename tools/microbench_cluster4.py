"""Round-4 cluster-stage decomposition at EXACT bench production settings.

Mirrors pointgroup.py's dual clustering (xyz 3cm W=1 grid + shifted 2cm
edge-buffer path) with the trained golden checkpoint, timing each substage:
unit-grid build, unit table, ball query, CC, compaction, merge. Fetch-forced
timing (np.asarray of a scalar) including the ~27ms fetch roundtrip, which
is reported for calibration.

Usage: python tools/microbench_cluster4.py [reps=5]
"""
import os, sys, time
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
from minsu3d_tpu.ops.ballquery import ball_query, ball_query_edge
from minsu3d_tpu.ops.cluster import (connected_components, cluster_units,
                                     _unit_table, _unit_points_compact)

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5

cfg = load_config(["model=pointgroup", "data=scannetv2",
    "model.trainer.precision=bfloat16",
    "data.caps.eval_points=139264", "data.caps.eval_voxels=131072",
    "data.caps.eval_instances=64", "data.caps.clusters=16384",
    "data.caps.shifted_units=true", "data.caps.cluster_units_shifted=40960",
    "data.caps.cluster_cell_xyz=0.03", "data.caps.cluster_units=40960",
    "data.caps.neighbors=16", "data.caps.bq_edge_factor=28",
    "data.caps.bq_edge_factor_xyz=8"])
scenes = [make_scene(seed=0, num_objects=12, points_per_object=6000,
                     floor_points=40000, room=8.0)]
ds = GeneralDataset(cfg, "val", scenes=scenes)
caps = shard_caps(cfg, "val")
b = device_arrays(collate([ds[0]], caps))
b = jax.device_put(b)

bundle = get_model("PointGroup")
net = bundle.make_net(cfg, "val")
import orbax.checkpoint as ocp
restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(
    "output/golden/pointgroup_epoch_120"))
variables = {"params": restored["params"], "batch_stats": restored["batch_stats"]}

c = StaticCaps.from_cfg(cfg, "val")
radius = cfg.model.network.cluster.cluster_radius
ignore = tuple(cfg.data.ignore_classes)

bb = jax.jit(lambda v, b: net.apply(v, b, False, False))
out = bb(variables, b)
sem = out["semantic_scores"]; off = out["point_offsets"]
sem_preds = jnp.argmax(sem, axis=1).astype(jnp.int32)
obj = foreground_mask(sem_preds, b["point_mask"], ignore)
xyz = b["point_xyz"]; bids = b["vert_batch_ids"]
shifted = xyz + off
K = max(c.neighbors // 2, 8)
W_edge = max(c.window // 4, 8)
s_cell = c.shifted_grid_cell or float(cfg.data.voxel_size)

tfetch = jax.jit(lambda x: jnp.sum(x))
_ = np.asarray(tfetch(jnp.ones(8)))
t0 = time.perf_counter()
for _ in range(10):
    _ = np.asarray(tfetch(jnp.ones(8)))
FETCH = (time.perf_counter() - t0) / 10
print(f"# fetch roundtrip {FETCH*1000:.1f} ms (included in timings below)")


def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(REPS):
        r = f(*args)
        np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    print(f"# {name:44s} {(time.perf_counter()-t0)/REPS*1000:9.1f} ms",
          flush=True)
    return r


timeit("backbone fwd (reference)", lambda v, bb_: net.apply(v, bb_, False, False),
       variables, b)

# ---- xyz clustering (3cm grid, W=1 fused path) ----
units_x, _ = timeit("make_units_grid xyz 3cm",
                    lambda: gm.make_units_grid(bids, xyz, sem_preds, obj,
                                               c.cluster_units, c.xyz_grid_cell))
timeit("cluster_step xyz e2e (W=1)",
       lambda co: gm.cluster_step(co, bids, obj, sem_preds, radius, c, units_x,
                                  edge_factor=c.edge_factor_xyz or None,
                                  grid_cell=c.xyz_grid_cell), xyz)
ut_x = timeit("  _unit_table xyz",
              lambda co: _unit_table(co, bids, obj, sem_preds, units_x,
                                     c.cluster_units), xyz)
ucx, ubx, uax, ugx, uidx, ucntx = ut_x
bq_x = timeit("  ball_query xyz W=1 fused",
              lambda cc: ball_query(cc, ubx, uax, radius, K, 1,
                                    half_space=c.half_space, group=ugx), ucx)
from minsu3d_tpu.ops.ballquery import ball_query_grid
timeit("  ball_query_grid xyz m=1",
       lambda cc: ball_query_grid(cc, ubx, uax, radius, K, c.xyz_grid_cell,
                                  half_space=c.half_space, group=ugx), ucx)
timeit("  CC xyz", lambda n, o: connected_components(n, o, uax, ugx),
       bq_x[0], bq_x[1])
lblx = connected_components(bq_x[0], bq_x[1], uax, ugx)
timeit("  compact xyz",
       lambda l: _unit_points_compact(l, uidx, c.cluster_units, xyz.shape[0],
                                      c.clusters, u_counts=ucntx), lblx)

# ---- shifted clustering (2cm grid units, edge-buffer path) ----
units_s, _ = timeit("make_units_grid shifted 2cm",
                    lambda co: gm.make_units_grid(bids, co, sem_preds, obj,
                                                  c.cluster_units_shifted,
                                                  s_cell), shifted)
timeit("cluster_step shifted e2e (edge)",
       lambda co: gm.cluster_step(co, bids, obj, sem_preds, radius, c, units_s,
                                  u_cap=c.cluster_units_shifted,
                                  grid_cell=s_cell), shifted)
ut_s = timeit("  _unit_table shifted",
              lambda co: _unit_table(co, bids, obj, sem_preds, units_s,
                                     c.cluster_units_shifted), shifted)
ucs, ubs, uas, ugs, uids, ucnts = ut_s
E = c.edge_factor * c.cluster_units_shifted
bq_s = timeit(f"  ball_query_edge shifted E={c.edge_factor}x W={W_edge}",
              lambda cc: ball_query_edge(cc, ubs, uas, radius, K, W_edge, E,
                                         half_space=c.half_space, group=ugs),
              ucs)
print(f"#   edges dropped: {int(bq_s[2])}")
timeit(f"  ball_query_grid shifted m=2 (cell {s_cell})",
       lambda cc: ball_query_grid(cc, ubs, uas, radius, K, s_cell,
                                  half_space=c.half_space, group=ugs), ucs)
timeit("  CC shifted", lambda n, o: connected_components(n, o, uas, ugs),
       bq_s[0], bq_s[1])
lbls = connected_components(bq_s[0], bq_s[1], uas, ugs)
timeit("  compact shifted",
       lambda l: _unit_points_compact(l, uids, c.cluster_units_shifted,
                                      xyz.shape[0], c.clusters,
                                      u_counts=ucnts), lbls)

# ---- merge ----
clus = gm.cluster_step(xyz, bids, obj, sem_preds, radius, c, units_x,
                       edge_factor=c.edge_factor_xyz or None,
                       grid_cell=c.xyz_grid_cell)
clus_s = gm.cluster_step(shifted, bids, obj, sem_preds, radius, c, units_s,
                         u_cap=c.cluster_units_shifted, grid_cell=s_cell)
npt = cfg.model.network.cluster.cluster_npoint_thre
timeit("merge_clusterings",
       lambda a, bcl: merge_clusterings([a, bcl], [npt] * 2, xyz.shape[0],
                                        c.proposals)[0], clus, clus_s)

# CC sweep counts (how many rounds does the while_loop actually run?)
def count_sweeps(nbr, ok, ua, ug):
    n = nbr.shape[0]
    lbl = connected_components(nbr, ok, ua, ug)
    # re-run manually to count
    import minsu3d_tpu.ops.cluster as cl
    return lbl

print("# done")

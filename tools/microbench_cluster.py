"""Decompose the cluster stage on the real TPU with the trained checkpoint:
make_units / ball_query fused / ball_query loop / CC / compact, at bench caps."""
import sys, time, json
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
from minsu3d_tpu.model.pointgroup import foreground_mask
from minsu3d_tpu.model.caps import StaticCaps
from minsu3d_tpu.ops.ballquery import ball_query
from minsu3d_tpu.ops.cluster import connected_components, compact_labels, cluster_units

cfg = load_config(["model=pointgroup", "data=scannetv2",
    "model.trainer.precision=bfloat16",
    "data.caps.eval_points=139264", "data.caps.eval_voxels=114688",
    "data.caps.eval_instances=64", "data.caps.cluster_units=57344"])
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

bb = jax.jit(lambda v, b: net.apply(v, b, False, False))
out = bb(variables, b); jax.block_until_ready(out)
sem = out["semantic_scores"]; off = out["point_offsets"]

sem_preds = jnp.argmax(sem, axis=1).astype(jnp.int32)
obj = foreground_mask(sem_preds, b["point_mask"], ignore)
units, nd = gm.make_units(b["p2v"], sem_preds, obj, scaps.cluster_units)
units = jax.block_until_ready(units)
print("# units dropped:", int(nd), "active units:",
      int(jnp.sum(jnp.unique(jnp.where(obj, units, scaps.cluster_units),
                             size=scaps.cluster_units+1) < scaps.cluster_units)))

# unit-level arrays (mirror cluster_units internals)
u_cap = scaps.cluster_units
uid = jnp.where(obj & (units < u_cap), units, u_cap)
w = (uid < u_cap).astype(jnp.float32)
K, W = max(scaps.neighbors // 2, 8), max(scaps.window // 4, 8)

def prep(coords):
    csum = jnp.zeros((u_cap + 1, 3), jnp.float32).at[uid].add(coords * w[:, None])
    cnt = jnp.zeros((u_cap + 1,), jnp.float32).at[uid].add(w)
    u_coords = (csum / jnp.maximum(cnt, 1.0)[:, None])[:u_cap]
    u_active = cnt[:u_cap] > 0
    u_batch = jnp.full((u_cap + 1,), -1, jnp.int32).at[uid].max(
        jnp.where(uid < u_cap, b["vert_batch_ids"], -1))[:u_cap]
    u_group = jnp.full((u_cap + 1,), -1, jnp.int32).at[uid].max(
        jnp.where(uid < u_cap, sem_preds, -1))[:u_cap]
    return u_coords, u_batch, u_active, u_group

shifted = b["point_xyz"] + off
uc, ub, ua, ug = jax.block_until_ready(jax.jit(prep)(shifted))

def timeit(name, fn, *args, reps=5):
    # block_until_ready does NOT reliably block on the axon tunnel — fetch a
    # scalar each rep (CLAUDE.md); report includes the ~30ms fetch roundtrip
    f = jax.jit(fn)
    r = f(*args)
    np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
        np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    print(f"# {name:28s} {(time.perf_counter()-t0)/reps*1000:9.1f} ms (incl ~30ms fetch)")
    return r

timeit("make_units+prep", lambda c: prep(c), shifted)
bq_f = timeit("ball_query fused K%d W%d" % (K, W),
              lambda c: ball_query(c, ub, ua, radius, K, W, group=ug, fused=True), uc)
bq_l = timeit("ball_query loop", 
              lambda c: ball_query(c, ub, ua, radius, K, W, group=ug, fused=False), uc)
timeit("ball_query fused nogroup",
       lambda c: ball_query(c, ub, ua, radius, K, W, fused=True), uc)
timeit("ball_query fused halfspace",
       lambda c: ball_query(c, ub, ua, radius, K, W, half_space=True, group=ug, fused=True), uc)

from minsu3d_tpu.ops.ballquery import ball_query_edge
for ef in (16, 24, 32):
    E = ef * u_cap
    r_full = timeit(f"ball_query edge E={ef}x full",
                    lambda c: ball_query_edge(c, ub, ua, radius, K, W, E, group=ug), uc)
    r_half = timeit(f"ball_query edge E={ef}x halfspace",
                    lambda c: ball_query_edge(c, ub, ua, radius, K, W, E,
                                              half_space=True, group=ug), uc)
    print(f"#   edges dropped full={int(r_full[2])} half={int(r_half[2])}")
nbr, ok = bq_f
timeit("connected_components", lambda a, o: connected_components(a, o, ua, ug), nbr, ok)
timeit("CC maxiter8", lambda a, o: connected_components(a, o, ua, ug, max_iters=8), nbr, ok)
lbl = connected_components(nbr, ok, ua, ug)
timeit("compact_labels", lambda l: compact_labels(l, ua, scaps.clusters), lbl)
timeit("cluster_units e2e", lambda c: cluster_units(
    c, b["vert_batch_ids"], obj, sem_preds, units, u_cap, radius, K, W,
    scaps.clusters, scaps.cc_iters), shifted)

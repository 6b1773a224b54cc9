"""CC convergence analysis on the REAL xyz unit graph (the dominant cost)."""
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
from minsu3d_tpu.model.pointgroup import foreground_mask
from minsu3d_tpu.model.caps import StaticCaps
from minsu3d_tpu.ops.ballquery import ball_query

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
sem_preds = jnp.argmax(out["semantic_scores"], axis=1).astype(jnp.int32)
obj = foreground_mask(sem_preds, b["point_mask"], ignore)
units, _ = gm.make_units(b["p2v"], sem_preds, obj, scaps.cluster_units)
u_cap = scaps.cluster_units
uid = jnp.where(obj & (units < u_cap), units, u_cap)
w = (uid < u_cap).astype(jnp.float32)
K, W = 16, 8

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

for name, coords in [("xyz", b["point_xyz"]),
                     ("shifted", b["point_xyz"] + out["point_offsets"])]:
    uc, ubat, ua, ug = jax.block_until_ready(jax.jit(prep)(coords))
    for half in (True, False):
        nbr, ok = jax.block_until_ready(jax.jit(
            lambda c: ball_query(c, ubat, ua, radius, K, W, half_space=half, group=ug))(uc))
        n = nbr.shape[0]
        # instrumented sweeps: count to fixpoint, time one sweep
        nbr_t = nbr.T; valid_t = ok.T
        g_ext = jnp.concatenate([ug, jnp.full((1,), -2, jnp.int32)])
        valid_t = valid_t & (g_ext[nbr_t] == ug[None, :])
        a_ext = jnp.concatenate([ua, jnp.zeros((1,), bool)])
        valid_t = valid_t & ua[None, :] & a_ext[nbr_t]
        nbr_safe = jnp.where(valid_t, nbr_t, n)

        def make_sweep(jumps):
            def sweep(label):
                ext = jnp.concatenate([label, jnp.full((1,), n, jnp.int32)])
                rv = jnp.where(valid_t, ext[nbr_t], n)
                m = jnp.minimum(jnp.min(rv, axis=0), label)
                ext = jnp.concatenate([label, jnp.full((1,), n, jnp.int32)])
                ext = ext.at[jnp.minimum(label, n)].min(m)
                ext = ext.at[rv].min(jnp.broadcast_to(label[None, :], rv.shape), mode="drop")
                label = jnp.minimum(label, ext[:n])
                for _ in range(jumps):
                    ext = jnp.concatenate([label, jnp.full((1,), n, jnp.int32)])
                    label = jnp.minimum(label, ext[label])
                return jnp.where(ua, label, n)
            return jax.jit(sweep)

        for jumps in (2, 4, 8):
            sw = make_sweep(jumps)
            label = jnp.where(ua, jnp.arange(n, dtype=jnp.int32), n)
            label = jax.block_until_ready(sw(label))  # warm + first
            sweeps = 1
            t0 = time.perf_counter()
            while sweeps < 64:
                new = jax.block_until_ready(sw(label))
                sweeps += 1
                if bool(jnp.all(new == label)):
                    break
                label = new
            dt = time.perf_counter() - t0
            print(f"# {name:8s} half={half} jumps={jumps:2d}: {sweeps:2d} sweeps, "
                  f"{dt*1000:7.1f} ms total, {dt/max(sweeps-1,1)*1000:6.1f} ms/sweep")

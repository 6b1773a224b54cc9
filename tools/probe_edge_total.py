"""Measure the REAL candidate-edge totals at the round-3 bench defaults
(grid units): run ball_query_edge with a tiny edge_cap so edges_dropped
reveals the exact total (total = dropped + cap). Informs bq_edge_factor."""
import sys
sys.path.insert(0, ".")
from minsu3d_tpu.util.env import setup_jax_cache
setup_jax_cache()
import jax, jax.numpy as jnp
from minsu3d_tpu.config import load_config
from minsu3d_tpu.data.batching import collate, device_arrays, shard_caps
from minsu3d_tpu.data.dataset import GeneralDataset
from minsu3d_tpu.data.synthetic import make_scene
from minsu3d_tpu.model import get_model
from minsu3d_tpu.model import general_model as gm
from minsu3d_tpu.model.pointgroup import foreground_mask
from minsu3d_tpu.model.caps import StaticCaps
from minsu3d_tpu.ops.ballquery import ball_query_edge

cfg = load_config(["model=pointgroup", "data=scannetv2",
    "model.trainer.precision=bfloat16",
    "data.caps.eval_points=139264", "data.caps.eval_voxels=122880",
    "data.caps.eval_instances=64",
    "data.caps.shifted_units=true",
    "data.caps.cluster_units_shifted=40960",
    "data.caps.cluster_cell_xyz=0.03",
    "data.caps.cluster_units=40960"])
scaps = StaticCaps.from_cfg(cfg, "val")
radius = cfg.model.network.cluster.cluster_radius
ignore = tuple(cfg.data.ignore_classes)
K, W = max(scaps.neighbors // 2, 8), max(scaps.window // 4, 8)

bundle = get_model("PointGroup")
net = bundle.make_net(cfg, "val")
import orbax.checkpoint as ocp, os
restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(
    "output/golden/pointgroup_epoch_120"))
variables = {"params": restored["params"], "batch_stats": restored["batch_stats"]}
bb = jax.jit(lambda v, x: net.apply(v, x, False, False))


@jax.jit
def probe(b):
    out = bb(variables, b)
    sem_preds = jnp.argmax(out["semantic_scores"], axis=1).astype(jnp.int32)
    obj = foreground_mask(sem_preds, b["point_mask"], ignore)
    xyz = b["point_xyz"]
    shifted = xyz + out["point_offsets"]
    bids = b["vert_batch_ids"]
    res = {}
    for tag, coords, cap, cell in [
            ("xyz", xyz, scaps.cluster_units, scaps.xyz_grid_cell),
            ("shifted", shifted, scaps.cluster_units_shifted,
             float(cfg.data.voxel_size))]:
        units, _ = gm.make_units_grid(bids, coords, sem_preds, obj, cap, cell)
        uid = jnp.where(obj & (units < cap), units, cap)
        w = (uid < cap).astype(jnp.float32)
        csum = jnp.zeros((cap + 1, 3), jnp.float32).at[uid].add(coords * w[:, None])
        cnt = jnp.zeros((cap + 1,), jnp.float32).at[uid].add(w)
        u_coords = (csum / jnp.maximum(cnt, 1.0)[:, None])[:cap]
        u_active = cnt[:cap] > 0
        u_batch = jnp.full((cap + 1,), -1, jnp.int32).at[uid].max(
            jnp.where(uid < cap, bids, -1))[:cap]
        u_group = jnp.full((cap + 1,), -1, jnp.int32).at[uid].max(
            jnp.where(uid < cap, sem_preds, -1))[:cap]
        _, _, dropped = ball_query_edge(u_coords, u_batch, u_active, radius,
                                        K, W, 1024, half_space=scaps.half_space,
                                        group=u_group)
        res[tag] = {"total_edges": dropped + 1024,
                    "active_units": jnp.sum(u_active)}
    return res


ds = GeneralDataset(cfg, "val", scenes=[
    make_scene(seed=s, num_objects=12, points_per_object=6000,
               floor_points=40000, room=8.0) for s in range(8)])
caps = shard_caps(cfg, "val")
for i in range(8):
    b = jax.device_put(device_arrays(collate([ds[i]], caps)))
    r = jax.device_get(probe(b))
    print({k: {kk: int(vv) for kk, vv in v.items()} for k, v in r.items()},
          flush=True)

"""Stage decomposition of the edge-buffer ball query (v2) on the real TPU at
production unit-clustering caps, using the trained epoch_120 checkpoint's
foreground (same setup as microbench_cluster.py)."""
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
from minsu3d_tpu.ops import hashing as hs
from minsu3d_tpu.ops.ballquery import (ball_query, ball_query_edge,
                                       _CELL_OFFSET, _GROUP_SHIFT, _pow2)

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
out = jax.jit(lambda v, bb: net.apply(v, bb, False, False))(variables, b)
sem = out["semantic_scores"]; off = out["point_offsets"]
sem_preds = jnp.argmax(sem, axis=1).astype(jnp.int32)
obj = foreground_mask(sem_preds, b["point_mask"], ignore)
units, _ = gm.make_units(b["p2v"], sem_preds, obj, scaps.cluster_units)

u_cap = scaps.cluster_units
uid = jnp.where(obj & (units < u_cap), units, u_cap)
w_pt = (uid < u_cap).astype(jnp.float32)
K, W = max(scaps.neighbors // 2, 8), max(scaps.window // 4, 8)

def prep(coords):
    csum = jnp.zeros((u_cap + 1, 3), jnp.float32).at[uid].add(coords * w_pt[:, None])
    cnt = jnp.zeros((u_cap + 1,), jnp.float32).at[uid].add(w_pt)
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
    f = jax.jit(fn)
    r = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = jax.block_until_ready(f(*args))
    print(f"# {name:36s} {(time.perf_counter()-t0)/reps*1000:9.1f} ms", flush=True)
    return r

HALF = True
n = u_cap

def prefix(coords, batch, valid, group, half_space):
    cell = jnp.floor(coords / radius).astype(jnp.int32) + _CELL_OFFSET
    cell = jnp.clip(cell, 0, hs.COORD_MAX - 1)
    key_hi = batch.astype(jnp.int32)
    key_hi = (key_hi << _GROUP_SHIFT) | jnp.clip(group.astype(jnp.int32),
                                                 0, (1 << _GROUP_SHIFT) - 1)
    khi, klo = hs.pack(key_hi, cell)
    khi, klo = hs.mask_invalid(khi, klo, valid)
    perm = hs.lexsort_pairs(khi, klo).astype(jnp.int32)
    s_hi, s_lo = khi[perm], klo[perm]
    offsets = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]
    if half_space:
        offsets = [o for o in offsets if o >= (0, 0, 0)]
    offs = jnp.array(offsets, jnp.int32)
    n_off = len(offsets)
    q_cell = cell[None, :, :] + offs[:, None, :]
    in_rng = jnp.all((q_cell >= 0) & (q_cell < hs.COORD_MAX), axis=-1) & valid[None, :]
    q_hi, q_lo = hs.pack(jnp.broadcast_to(key_hi[None, :], (n_off, n)),
                         jnp.clip(q_cell, 0, hs.COORD_MAX - 1))
    q_hi, q_lo = hs.mask_invalid(q_hi, q_lo, in_rng)
    _, _, starts = hs.lookup_sorted_union(s_hi, s_lo, q_hi.reshape(-1), q_lo.reshape(-1) - 1)
    _, _, ends = hs.lookup_sorted_union(s_hi, s_lo, q_hi.reshape(-1), q_lo.reshape(-1))
    run_len = jnp.where(in_rng.reshape(-1),
                        jnp.clip(ends - starts, 0, W), 0).astype(jnp.int32)
    run_len = run_len.reshape(n_off, n).T.reshape(-1)
    starts_pm = starts.reshape(n_off, n).T.reshape(-1)
    return perm, run_len, starts_pm, n_off

n_off_half = 14
E = 52 * u_cap

def st_lookups(coords):
    perm, run_len, starts_pm, _ = prefix(coords, ub, ua, ug, HALF)
    return perm[0] + run_len[0] + starts_pm[0]

def st_enum(coords):
    perm, run_len, starts_pm, n_off = prefix(coords, ub, ua, ug, HALF)
    base = jnp.cumsum(run_len) - run_len
    run_ids = jnp.arange(run_len.shape[0], dtype=jnp.int32)
    run = jax.lax.cummax(jnp.zeros((E,), jnp.int32).at[base].max(run_ids, mode="drop"))
    base_e = jax.lax.cummax(jnp.zeros((E,), jnp.int32).at[base].max(base, mode="drop"))
    e = jnp.arange(E, dtype=jnp.int32)
    w_e = e - base_e
    pos = jnp.minimum(starts_pm[run] + w_e, n)
    return pos[0] + run[0]

def st_gather(coords):
    perm, run_len, starts_pm, n_off = prefix(coords, ub, ua, ug, HALF)
    base = jnp.cumsum(run_len) - run_len
    total = base[-1] + run_len[-1]
    run_ids = jnp.arange(run_len.shape[0], dtype=jnp.int32)
    run = jax.lax.cummax(jnp.zeros((E,), jnp.int32).at[base].max(run_ids, mode="drop"))
    base_e = jax.lax.cummax(jnp.zeros((E,), jnp.int32).at[base].max(base, mode="drop"))
    e = jnp.arange(E, dtype=jnp.int32)
    e_valid = e < jnp.minimum(total, E)
    w_e = e - base_e
    pos = jnp.minimum(starts_pm[run] + w_e, n)
    p_e = run // n_off
    coords_s = coords[perm]
    zero1 = jnp.zeros((1,), coords.dtype)
    xs = jnp.concatenate([coords_s[:, 0], zero1])
    ys = jnp.concatenate([coords_s[:, 1], zero1])
    zs = jnp.concatenate([coords_s[:, 2], zero1])
    qx, qy, qz = coords[:, 0], coords[:, 1], coords[:, 2]
    dx = xs[pos] - qx[p_e]; dy = ys[pos] - qy[p_e]; dz = zs[pos] - qz[p_e]
    ok = e_valid & (dx * dx + dy * dy + dz * dz <= jnp.float32(radius * radius))
    return jnp.sum(ok.astype(jnp.int32)), total

def st_full(coords):
    return ball_query_edge(coords, ub, ua, radius, K, W, E, half_space=HALF, group=ug)

timeit("lookups+runlens", st_lookups, uc)
timeit("+enumeration (scatter/cummax)", st_enum, uc)
r = timeit("+coord gathers +distance", st_gather, uc)
print(f"#   ok_edges={int(r[0])} total_cand={int(r[1])} E={E}", flush=True)
rf = timeit("full edge v2 (sort+scatter)", st_full, uc)
print(f"#   dropped={int(rf[2])}", flush=True)
timeit("fused halfspace (baseline)",
       lambda c: ball_query(c, ub, ua, radius, K, W, half_space=True, group=ug), uc)

"""Stage decomposition of ball_query_edge on the SHIFTED-grid units (the
round-3 dominant cluster cost: ~97 ms of the ~290 ms cluster stage), plus a
CC pointer-jump sweep. Production config: cap 40960, 2cm cells, K=8, W=8,
half-space (n_off=14), edge factor 28. Timing = many enqueued executions +
one value FETCH (axon tunnel; see CLAUDE.md).

Usage: python tools/microbench_bqe3.py [reps=10]
"""
import sys, time, functools
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
from minsu3d_tpu.ops.ballquery import _CELL_OFFSET, _GROUP_SHIFT, _pow2
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
out = jax.jit(lambda v, bb: net.apply(v, bb, False, False))(variables, b)
sem_preds = jnp.argmax(out["semantic_scores"], axis=1).astype(jnp.int32)
obj = foreground_mask(sem_preds, b["point_mask"], ignore)
xyz = b["point_xyz"]
shifted = xyz + out["point_offsets"]
bids = b["vert_batch_ids"]
jax.block_until_ready((sem_preds, obj, shifted))

U = scaps.cluster_units_shifted
units_sh, _ = gm.make_units_grid(bids, shifted, sem_preds, obj, U,
                                 float(cfg.data.voxel_size))
uid = jnp.where(obj & (units_sh < U), units_sh, U)
w_pt = (uid < U).astype(jnp.float32)
csum = jnp.zeros((U + 1, 3), jnp.float32).at[uid].add(shifted * w_pt[:, None])
cnt = jnp.zeros((U + 1,), jnp.float32).at[uid].add(w_pt)
u_coords = (csum / jnp.maximum(cnt, 1.0)[:, None])[:U]
u_active = cnt[:U] > 0
u_batch = jnp.full((U + 1,), -1, jnp.int32).at[uid].max(
    jnp.where(uid < U, bids, -1))[:U]
u_group = jnp.full((U + 1,), -1, jnp.int32).at[uid].max(
    jnp.where(uid < U, sem_preds, -1))[:U]
jax.block_until_ready(u_coords)

K, W = 8, 8
EDGE_CAP = 28 * U
CALIB = None


def timeit(name, fn, *args):
    global CALIB
    f = jax.jit(fn)
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(REPS - 1):
        f(*args)
    last = f(*args)
    # FETCH a scalar: the only sync the axon tunnel honors (CLAUDE.md)
    s = float(np.asarray(jax.tree_util.tree_leaves(last)[0].sum()))
    dt = (time.perf_counter() - t0) / REPS
    if CALIB is None and name != "calib":
        pass
    print(f"# {name:34s} {dt*1000:9.2f} ms  (sum={s:.3g})", flush=True)
    return r


# trivial op first: measures the fetch roundtrip to subtract mentally
timeit("calib (fetch roundtrip/REPS)", lambda x: x + 1.0, jnp.float32(1.0))


def stage(upto):
    """Re-run ball_query_edge internals up to a named stage."""
    def fn(coords, batch, valid, group):
        n = coords.shape[0]
        cell = jnp.floor(coords / radius).astype(jnp.int32) + _CELL_OFFSET
        cell = jnp.clip(cell, 0, hs.COORD_MAX - 1)
        key_hi = (batch.astype(jnp.int32) << _GROUP_SHIFT) | jnp.clip(
            group.astype(jnp.int32), 0, (1 << _GROUP_SHIFT) - 1)
        khi, klo = hs.pack(key_hi, cell)
        khi, klo = hs.mask_invalid(khi, klo, valid)
        perm = hs.lexsort_pairs(khi, klo).astype(jnp.int32)
        s_hi, s_lo = khi[perm], klo[perm]
        offsets = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                   for dz in (-1, 0, 1) if (dx, dy, dz) >= (0, 0, 0)]
        offs = jnp.array(offsets, jnp.int32)
        n_off = len(offsets)
        q_cell = cell[None, :, :] + offs[:, None, :]
        in_rng = jnp.all((q_cell >= 0) & (q_cell < hs.COORD_MAX), axis=-1) & valid[None, :]
        q_hi, q_lo = hs.pack(jnp.broadcast_to(key_hi[None, :], (n_off, n)),
                             jnp.clip(q_cell, 0, hs.COORD_MAX - 1))
        q_hi, q_lo = hs.mask_invalid(q_hi, q_lo, in_rng)
        _, _, starts = hs.lookup_sorted_union(s_hi, s_lo, q_hi.reshape(-1), q_lo.reshape(-1) - 1)
        _, _, ends = hs.lookup_sorted_union(s_hi, s_lo, q_hi.reshape(-1), q_lo.reshape(-1))
        if upto == "bounds":
            return starts.sum() + ends.sum()
        run_len = jnp.where(in_rng.reshape(-1),
                            jnp.clip(ends - starts, 0, W), 0).astype(jnp.int32)
        run_len = run_len.reshape(n_off, n).T.reshape(-1)
        starts_pm = starts.reshape(n_off, n).T.reshape(-1)
        base = jnp.cumsum(run_len) - run_len
        total = base[-1] + run_len[-1]
        run_ids = jnp.arange(run_len.shape[0], dtype=jnp.int32)
        run = jax.lax.cummax(jnp.zeros((EDGE_CAP,), jnp.int32).at[base].max(
            run_ids, mode="drop"))
        base_e = jax.lax.cummax(jnp.zeros((EDGE_CAP,), jnp.int32).at[base].max(
            base, mode="drop"))
        e = jnp.arange(EDGE_CAP, dtype=jnp.int32)
        e_valid = e < jnp.minimum(total, EDGE_CAP)
        w_e = e - base_e
        if upto == "extents":
            return run.sum() + w_e.sum()

        def fill(vals):
            deltas = vals - jnp.concatenate([vals[:1] * 0, vals[:-1]])
            return jnp.cumsum(jnp.zeros((EDGE_CAP,), jnp.int32).at[base].add(
                deltas, mode="drop"))

        pos = jnp.minimum(fill(starts_pm) + w_e, n)
        if upto == "posfill":
            return pos.sum()
        p_e = run // n_off
        o_e = run - p_e * n_off
        coords_s = coords[perm]
        cxy = jnp.concatenate([
            jax.lax.complex(coords_s[:, 0], coords_s[:, 1]),
            jnp.zeros((1,), jnp.complex64)])
        zs = jnp.concatenate([coords_s[:, 2], jnp.zeros((1,), coords.dtype)])
        perm_ext = jnp.concatenate([perm, jnp.full((1,), n, jnp.int32)])

        def fill_coord(col):
            qi = jax.lax.bitcast_convert_type(coords[:, col], jnp.int32)
            rep = jnp.repeat(qi, n_off)
            return jax.lax.bitcast_convert_type(fill(rep), jnp.float32)

        cand_xy = cxy[pos]
        if upto == "candgather":
            return jnp.real(cand_xy).sum() + zs[pos].sum()
        dx = jnp.real(cand_xy) - fill_coord(0)
        dy = jnp.imag(cand_xy) - fill_coord(1)
        dz = zs[pos] - fill_coord(2)
        r2 = jnp.float32(radius * radius)
        ok = e_valid & (dx * dx + dy * dy + dz * dz <= r2)
        if upto == "dist":
            return ok.sum()
        op2 = _pow2(n_off)
        key = jnp.where(ok, (p_e * W + w_e) * op2 + o_e, hs.SENTINEL)
        key_s, pos_s = jax.lax.sort((key, pos), num_keys=1)
        if upto == "sort":
            return key_s.sum() + pos_s.sum()
        ok_s = key_s != hs.SENTINEL
        p_s = jnp.where(ok_s, key_s // (W * op2), n)
        first = jnp.concatenate([jnp.ones((1,), bool), p_s[1:] != p_s[:-1]])
        seg_start = jax.lax.cummax(jnp.where(first, e, -1))
        col = e - seg_start
        store = ok_s & (col < K)
        col_c = jnp.where(store, col, K)
        cand = jnp.where(store, perm_ext[pos_s], n)
        nbr_idx = jnp.zeros((n, K), jnp.int32).at[p_s, col_c].set(cand, mode="drop")
        nbr_valid = jnp.zeros((n, K), bool).at[p_s, col_c].set(store, mode="drop")
        return jnp.where(nbr_valid, nbr_idx, n).sum() + nbr_valid.sum()
    return fn


for s in ("bounds", "bounds", "extents", "posfill", "candgather", "dist",
          "sort", "full"):
    timeit(f"bqe upto:{s}", stage(s), u_coords, u_batch, u_active, u_group)

if len(sys.argv) > 2 and sys.argv[2] == "cc":
    from minsu3d_tpu.ops.ballquery import ball_query_edge
    nbr_idx, nbr_valid, _ = jax.jit(functools.partial(
        ball_query_edge, radius=radius, k=K, window=W, edge_cap=EDGE_CAP,
        half_space=True))(u_coords, u_batch, u_active, group=u_group)
    jax.block_until_ready(nbr_idx)
    
    import minsu3d_tpu.ops.cluster as cl
    
    def cc_with_jumps(jumps):
        src = connected_components  # count rounds via while-loop state return
    
        def fn(nbr_idx, nbr_valid, active, group):
            n = nbr_idx.shape[0]
            nbr_t = nbr_idx.T
            valid_t = nbr_valid.T
            g_ext = jnp.concatenate([group, jnp.full((1,), -2, group.dtype)])
            valid_t = valid_t & (g_ext[nbr_t] == group[None, :])
            active_ext = jnp.concatenate([active, jnp.zeros((1,), bool)])
            valid_t = valid_t & active[None, :] & active_ext[nbr_t]
            label0 = jnp.where(active, jnp.arange(n, dtype=jnp.int32), n)
    
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
                return jnp.where(active, label, n)
    
            def cond(state):
                i, label, done = state
                return (~done) & (i < 64)
    
            def body(state):
                i, label, _ = state
                new = sweep(label)
                return i + 1, new, jnp.all(new == label)
    
            it, label, _ = jax.lax.while_loop(cond, body, (0, sweep(label0), False))
            return it, label
        return fn
    
    
    ref_label = None
    for j in (1, 2, 3, 4, 6):
        r = timeit(f"CC shifted jumps={j}", cc_with_jumps(j),
                   nbr_idx, nbr_valid, u_active, u_group)
        it = int(r[0])
        lab = np.asarray(r[1])
        if ref_label is None:
            ref_label = lab
        print(f"#   rounds={it} identical={bool((lab == ref_label).all())}", flush=True)

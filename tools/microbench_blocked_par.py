"""Parallel (vmapped batched-gather) blocked-window subm conv vs the
lax.scan blocked form vs the dense 27-gather, on a REAL bench-scale plan.

The scan form won 2.2x/1.5x per-conv in isolation but only +3.5% end-to-end
(BENCH_NOTES: the sequential window scan serializes what the random-gather
form overlaps). This probes the parallel formulation: halo = block, so each
window is exactly the 3 adjacent blocks (pure reshape + concat, no
dynamic_slice), and the 27-tap gather is one BATCHED gather over (NB, 3B+1, C)
windows — XLA sees independent per-window gathers whose operands fit VMEM.

Fetch-forced timing (np.asarray of a scalar) minus the fetch roundtrip;
block_until_ready does not reliably block on the axon tunnel (CLAUDE.md).

Usage: python tools/microbench_blocked_par.py [reps=10]
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
from minsu3d_tpu.model import general_model as gm
from minsu3d_tpu.model.caps import StaticCaps
from minsu3d_tpu.ops import sparse_conv as sc

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 10

cfg = load_config(["model=pointgroup", "data=scannetv2",
    "model.trainer.precision=bfloat16",
    "data.caps.eval_points=139264", "data.caps.eval_voxels=122880",
    "data.caps.eval_instances=64"])
scenes = [make_scene(seed=0, num_objects=12, points_per_object=6000,
                     floor_points=40000, room=8.0)]
ds = GeneralDataset(cfg, "val", scenes=scenes)
caps = shard_caps(cfg, "val")
b = device_arrays(collate([ds[0]], caps))
b = jax.device_put(b)

scaps = StaticCaps.from_cfg(cfg, "val")
n_levels = len(cfg.model.network.blocks)
plan, _, _ = jax.jit(lambda bb: gm.build_scene_plan(
    bb, list(scaps.voxel_caps), n_levels))(b)

tr = jax.jit(lambda x: jnp.sum(x))
_ = np.asarray(tr(jnp.ones(8)))
t0 = time.perf_counter()
for _ in range(10):
    _ = np.asarray(tr(jnp.ones(8)))
FETCH = (time.perf_counter() - t0) / 10
print(f"# fetch roundtrip {FETCH*1000:.1f} ms")


def subm_conv_blocked_par(feats, level, weight, compute_dtype=None, block=4096):
    """halo = block parallel window conv (probe-local copy)."""
    v, cin = feats.shape
    cout = weight.shape[-1]
    nblk = v // block
    xw = feats if compute_dtype is None else feats.astype(compute_dtype)
    w2 = weight.reshape(27 * cin, cout)
    if compute_dtype is not None:
        w2 = w2.astype(compute_dtype)
    blocks = jnp.pad(xw, ((block, block), (0, 0))).reshape(nblk + 2, block, cin)
    win = jnp.concatenate([blocks[:-2], blocks[1:-1], blocks[2:]], axis=1)
    # trash row per window for out-of-window / invalid neighbors
    win = jnp.concatenate(
        [win, jnp.zeros((nblk, 1, cin), win.dtype)], axis=1)   # (NB, 3B+1, C)
    r = jnp.arange(v, dtype=jnp.int32)
    li = level.nbr_idx - ((r // block) * block)[:, None] + block
    li = jnp.where((level.nbr_idx < v) & (li >= 0) & (li < 3 * block),
                   li, 3 * block).reshape(nblk, block, 27)
    g = jax.vmap(lambda w, i: w[i])(win, li)                   # (NB, B, 27, C)
    out = jax.lax.dot_general(
        g.reshape(v, 27 * cin), w2,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out.astype(feats.dtype)


def timeit(name, fn, *args):
    f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    r = f(*args)
    _ = np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(REPS):
        r = f(*args)
    v = np.asarray(r)
    t = (time.perf_counter() - t0) / REPS - FETCH / REPS
    print(f"# {name:44s} {t*1000:9.2f} ms  (sum {v:.1f})", flush=True)


rng = np.random.default_rng(0)
for li_, blk in ((0, 4096), (1, 4096), (2, 2048)):
    lvl = plan.levels[li_]
    V = lvl.nbr_idx.shape[0]
    C = int(cfg.model.network.m) * (li_ + 1)
    x = jnp.array(rng.normal(0, 1, (V, C)), jnp.bfloat16)
    w27 = jnp.array(rng.normal(0, 0.1, (27, C, C)), jnp.bfloat16)
    timeit(f"L{li_} subm_conv (dense 27-gather)",
           lambda x, lvl=lvl, w27=w27: sc.subm_conv(x, lvl, w27, jnp.bfloat16), x)
    halo = (2560, 1536, 768)[li_]
    lb = sc.add_block_meta(lvl, halo=halo)
    timeit(f"L{li_} subm_conv_blocked (scan, H={halo})",
           lambda x, lb=lb, w27=w27: sc.subm_conv_blocked(x, lb, w27, jnp.bfloat16), x)
    timeit(f"L{li_} blocked_par (vmap, H=B={blk})",
           lambda x, lvl=lvl, w27=w27, blk=blk:
           subm_conv_blocked_par(x, lvl, w27, jnp.bfloat16, block=blk), x)

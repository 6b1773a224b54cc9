"""Does unrolling the blocked-window subm conv's window scan recover the
microbench 2x that the end-to-end bench didn't see?

BENCH_NOTES round 4 blamed the gap on the scan SERIALIZING window slices and
GEMMs that the random-gather form overlaps. ``lax.scan(unroll=k)`` emits k
window bodies per iteration, letting XLA software-pipeline the dynamic-slice
of window i+1 against the GEMM of window i without the 4x operand blowup that
sank the fully-vmapped variant (tools/microbench_blocked_par.py).

Times, on the REAL level-0/1 kernel maps at m=16: dense subm_conv baseline,
subm_conv_blocked as shipped (unroll=1), and unroll in {2, 4, 8}.

Usage: python tools/microbench_unroll.py [reps=10]
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
b = jax.device_put(b); jax.block_until_ready(b)

scaps = StaticCaps.from_cfg(cfg, "val")
n_levels = len(cfg.model.network.blocks)
plan, _, _ = jax.jit(lambda bb: gm.build_scene_plan(
    bb, list(scaps.voxel_caps), n_levels))(b)
jax.block_until_ready(plan)


def blocked_unroll(feats, level, weight, compute_dtype, unroll):
    """subm_conv_blocked with an unrolled window scan (same math)."""
    v, cin = feats.shape
    nblk, block, _ = level.blk_li.shape
    halo = level.blk_halo.shape[0]
    s_win = block + 2 * halo
    cout = weight.shape[-1]
    xw = feats if compute_dtype is None else feats.astype(compute_dtype)
    w2 = weight.reshape(27 * cin, cout)
    if compute_dtype is not None:
        w2 = w2.astype(compute_dtype)
    xp = jnp.pad(xw, ((halo, halo + 1), (0, 0)))
    starts = jnp.arange(nblk, dtype=jnp.int32) * block
    zero = jnp.zeros((1, cin), xw.dtype)

    def step(carry, si):
        s0, li = si
        win = jnp.concatenate(
            [jax.lax.dynamic_slice(xp, (s0, 0), (s_win, cin)), zero])
        g = win[li]
        ob = jax.lax.dot_general(
            g.reshape(block, 27 * cin), w2,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return carry, ob

    _, ys = jax.lax.scan(step, 0, (starts, level.blk_li), unroll=unroll)
    return ys.reshape(v, cout).astype(feats.dtype)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(REPS - 1):
        f(*args)
    last = f(*args)
    s = float(np.asarray(jnp.sum(
        jax.tree_util.tree_leaves(last)[0].astype(jnp.float32))))
    t = (time.perf_counter() - t0) / REPS
    print(f"# {name:46s} {t*1000:9.2f} ms  (sum={s:.6g})", flush=True)
    return r


rng = np.random.default_rng(0)
for li, halo in ((0, 2560), (1, 1536)):
    lvl = plan.levels[li]
    lvl_b = jax.jit(lambda l: sc.add_block_meta(l, halo))(lvl)
    jax.block_until_ready(lvl_b)
    V = lvl.nbr_idx.shape[0]
    C = 16 if li == 0 else 32
    x = jnp.array(rng.normal(0, 1, (V, C)), jnp.bfloat16)
    w27 = jnp.array(rng.normal(0, 0.1, (27, C, C)), jnp.bfloat16)
    print(f"# level {li}: V={V} C={C} halo={halo} "
          f"nblk={lvl_b.blk_li.shape[0]} block={lvl_b.blk_li.shape[1]}",
          flush=True)
    timeit("calib", lambda v: v + 1.0, jnp.float32(1.0))
    base = timeit("dense subm_conv", lambda x: sc.subm_conv(
        x, lvl, w27, compute_dtype=jnp.bfloat16), x)
    b1 = timeit("blocked (shipped, unroll=1)", lambda x: sc.subm_conv_blocked(
        x, lvl_b, w27, compute_dtype=jnp.bfloat16), x)
    for u in (2, 4, 8):
        bu = timeit(f"blocked unroll={u}", lambda x, u=u: blocked_unroll(
            x, lvl_b, w27, jnp.bfloat16, u), x)
        np.testing.assert_array_equal(np.asarray(bu), np.asarray(b1))
print("# unrolled results bit-identical to shipped blocked conv", flush=True)

"""Packed-pairs (CSR) submanifold conv cost study on the REAL level-0 kernel
map: can gather+GEMM+scatter over only the VALID (output, tap) pairs beat the
dense 27-tap formulation (which gathers a zero row for the ~82% invalid taps
at level 0)?

Times, at m=16 on the real plan:
  * dense row-major subm_conv and channel-major subm_conv_cm (baselines)
  * raw column gather (C, V+1)[:, idx] at E valid-pair indices
  * raw column scatter-add (C, E) -> (C, V+1)
  * the full packed conv: per-tap transform y_t = W_t f (27 small GEMMs),
    one flat column gather from the (C, 27(V+1)) table, scatter-add by output

Usage: python tools/microbench_conv.py [reps=10]
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

lvl0 = plan.levels[0]
V = lvl0.nbr_idx.shape[0]
C = int(cfg.model.network.m)

nbr = np.asarray(lvl0.nbr_idx)           # (V, 27), V = missing
row_valid = np.asarray(lvl0.valid)
pairs = np.argwhere((nbr < V) & row_valid[:, None])   # (E, 2) = (i, t)
E_real = len(pairs)
print(f"# V={V} C={C} E_real={E_real} (={E_real/(27*row_valid.sum()):.3f} of "
      f"27*valid rows)", flush=True)
E = int(np.ceil(E_real / 8192)) * 8192   # static cap, 8k-aligned
i_out = np.full(E, V, np.int32); i_out[:E_real] = pairs[:, 0]
tap = np.full(E, 0, np.int32); tap[:E_real] = pairs[:, 1]
j_in = np.full(E, V, np.int32); j_in[:E_real] = nbr[pairs[:, 0], pairs[:, 1]]
# sort by (tap, out) so the y-table gather below streams per-tap segments
order = np.lexsort((i_out, tap))
i_out, tap, j_in = i_out[order], tap[order], j_in[order]
flat_idx = jnp.array(tap.astype(np.int64) * (V + 1) + j_in, jnp.int32)
i_out_d = jnp.array(i_out)
j_in_d = jnp.array(j_in)

rng = np.random.default_rng(0)
dt = jnp.bfloat16
x = jnp.array(rng.normal(0, 1, (V, C)), dt)
x_cm = x.T.copy()
w27 = jnp.array(rng.normal(0, 0.1, (27, C, C)), dt)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(REPS - 1):
        f(*args)
    last = f(*args)
    s = float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(last)[0]).astype(jnp.float32)))
    t = (time.perf_counter() - t0) / REPS
    print(f"# {name:46s} {t*1000:9.2f} ms  (sum={s:.3g})", flush=True)
    return r


timeit("calib", lambda v: v + 1.0, jnp.float32(1.0))
timeit("dense subm_conv (row-major)", lambda x: sc.subm_conv(
    x, lvl0, w27, compute_dtype=jnp.bfloat16), x)
timeit("dense subm_conv_cm (channel-major)", lambda x: sc.subm_conv_cm(
    x, lvl0, w27, compute_dtype=jnp.bfloat16), x_cm)
timeit("dense subm_conv_cm warm", lambda x: sc.subm_conv_cm(
    x, lvl0, w27, compute_dtype=jnp.bfloat16), x_cm)

# raw pieces at E
def col_gather(x_cm, idx):
    fe = sc.ext_zero_cm(x_cm)
    return fe[:, idx]
timeit(f"raw column gather (C,V+1) at E={E}", col_gather, x_cm, j_in_d)

def col_scatter(g, i):
    return jnp.zeros((C, V + 1), jnp.float32).at[:, i].add(g)
g_const = jnp.array(rng.normal(0, 1, (C, E)), jnp.float32)
timeit("raw column scatter-add (C,E)->(C,V+1)", col_scatter, g_const, i_out_d)
g_bf = g_const.astype(dt)
timeit("raw column scatter-add bf16 updates", col_scatter, g_bf, i_out_d)

# full packed conv: transform-first (27 GEMMs at V), flat gather, scatter-add
def packed_conv(x_cm, flat_idx, i_out):
    # y[t] = W_t^T f: (27, C, V) via one dot_general (27 batched GEMMs)
    y = jnp.einsum("tio,iv->tov", w27.astype(dt), x_cm,
                   preferred_element_type=jnp.float32)
    y = jnp.concatenate([y, jnp.zeros((27, C, 1), jnp.float32)], -1)
    y = y.astype(dt).transpose(1, 0, 2).reshape(C, 27 * (V + 1))
    g = y[:, flat_idx]                       # (C, E) column gather
    out = jnp.zeros((C, V + 1), jnp.float32).at[:, i_out].add(
        g.astype(jnp.float32))
    return out[:, :V]
timeit("packed conv (27 GEMM + gather + scatter)", packed_conv,
       x_cm, flat_idx, i_out_d)
timeit("packed conv warm", packed_conv, x_cm, flat_idx, i_out_d)

# gather-side-only packed variant: gather inputs, GEMM per tap segment is
# replaced by gather + one big masked GEMM is NOT possible (per-pair tap);
# instead time gather(C,E) + 27-tap dense GEMM for scale reference
def gemm27(x):
    return jax.lax.dot_general(
        x, w27.reshape(27 * C, C).astype(dt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
timeit("GEMM only (V,27C)x(27C,C)",
       gemm27, jnp.array(rng.normal(0, 1, (V, 27 * C)), dt))

"""Probe the two hot ball_query_edge patterns on the real TPU:

1. per-edge coordinate fetch: three 1-D gathers vs complex64-packed (2
   gathers) vs ONE column gather from a channel-major (4, V) table
   (output (4, E) keeps E minor — tile-friendly, unlike an (E, 4) temp);
2. piecewise-constant fill: four separate scatter+cumsum passes vs one
   (4, E) multi-channel scatter + axis-1 cumsum.

Synthetic shapes = production shifted config (V=40960, E=1.147M).

Usage: python tools/microbench_fill.py [reps=10]
"""
import sys, time
sys.path.insert(0, ".")
from minsu3d_tpu.util.env import setup_jax_cache
setup_jax_cache()
import jax, jax.numpy as jnp, numpy as np

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
V, E, R = 40960, 28 * 40960, 14 * 40960

rng = np.random.default_rng(0)
pos = jnp.array(rng.integers(0, V, E), jnp.int32)
# run bases: sorted (piecewise-constant fill pattern like the real one)
base = jnp.array(np.sort(rng.integers(0, E, R)), jnp.int32)
vals4 = jnp.array(rng.integers(-2**20, 2**20, (4, R)), jnp.int32)
coords = jnp.array(rng.normal(0, 3, (V, 3)), jnp.float32)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(REPS - 1):
        f(*args)
    last = f(*args)
    s = float(np.asarray(jax.tree_util.tree_leaves(last)[0].sum()))
    dt = (time.perf_counter() - t0) / REPS
    print(f"# {name:44s} {dt*1000:9.2f} ms  (sum={s:.3g})", flush=True)
    return r


timeit("calib", lambda x: x + 1.0, jnp.float32(1.0))

# --- coordinate fetch variants ---------------------------------------------
def g3(coords, pos):
    xs, ys, zs = coords[:, 0], coords[:, 1], coords[:, 2]
    return xs[pos] + ys[pos] + zs[pos]

def g_complex(coords, pos):
    cxy = jax.lax.complex(coords[:, 0], coords[:, 1])
    return jnp.real(cxy[pos]) + jnp.imag(cxy[pos]) + coords[:, 2][pos]

def g_cm(coords, pos):
    tbl = jnp.concatenate([coords.T, jnp.zeros((1, V), jnp.float32)], 0)  # (4, V)
    g = tbl[:, pos]                                     # (4, E) column gather
    return g[0] + g[1] + g[2]

def g_cm_pre(tbl, pos):
    g = tbl[:, pos]
    return g[0] + g[1] + g[2]

timeit("3x 1-D gather (E each)", g3, coords, pos)
timeit("3x 1-D gather (E each) warm", g3, coords, pos)
timeit("complex64 + z (2 gathers)", g_complex, coords, pos)
tbl = jnp.concatenate([coords.T, jnp.zeros((1, V), jnp.float32)], 0)
timeit("(4,V) column gather -> (4,E)", g_cm_pre, tbl, pos)
timeit("(4,V) column gather warm", g_cm_pre, tbl, pos)
# 64-bit packing: two f32 coords per int64 element, one 1-D gather
xy64 = jax.lax.bitcast_convert_type(
    jnp.stack([coords[:, 0], coords[:, 1]], -1), jnp.int64)
def g_64(xy64, z, pos):
    g = xy64[pos]
    both = jax.lax.bitcast_convert_type(g, jnp.float32)   # (E, 2)
    return both[:, 0] + both[:, 1] + z[pos]
timeit("int64-packed xy + z (2 gathers)", g_64, xy64, coords[:, 2], pos)

# --- fill variants -----------------------------------------------------------
def fill4_sep(vals4, base):
    out = 0
    for i in range(4):
        vals = vals4[i]
        deltas = vals - jnp.concatenate([vals[:1] * 0, vals[:-1]])
        out = out + jnp.cumsum(jnp.zeros((E,), jnp.int32).at[base].add(
            deltas, mode="drop"))
    return out

def fill4_fused(vals4, base):
    deltas = vals4 - jnp.concatenate([vals4[:, :1] * 0, vals4[:, :-1]], 1)
    acc = jnp.zeros((4, E), jnp.int32).at[:, base].add(deltas, mode="drop")
    f = jnp.cumsum(acc, axis=1)
    return f[0] + f[1] + f[2] + f[3]

timeit("4x separate fill (scatter+cumsum)", fill4_sep, vals4, base)
timeit("fused (4,E) fill", fill4_fused, vals4, base)
timeit("fused (4,E) fill warm", fill4_fused, vals4, base)

# single sort baseline for scale
keys = jnp.array(rng.integers(0, 2**30, E), jnp.int32)
pay = jnp.array(rng.integers(0, V, E), jnp.int32)
timeit("2-op sort of E", lambda k, p: jax.lax.sort((k, p), num_keys=1)[0], keys, pay)
# scatter of E rows into (V, 8) via .at[p, c].set
p_s = jnp.array(rng.integers(0, V, E), jnp.int32)
c_s = jnp.array(rng.integers(0, 8, E), jnp.int32)
timeit("(E)->(V,8) scatter set", lambda p, c, v: jnp.zeros(
    (V, 8), jnp.int32).at[p, c].set(v, mode="drop"), p_s, c_s, pay)

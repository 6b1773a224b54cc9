"""Measure neighbor-gather + conv layouts on the real TPU to decide the
channel-major backbone refactor (BENCH_NOTES lever 3 / VERDICT round-2 #2).

Variants at backbone scale (V voxels, C channels, 27-tap kernel map):
  * row-gather   x_vc[nbr]          from (V, C)  — current subm_conv layout
  * col-gather   x_cv[:, nbr]       from (C, V)  — channel-major candidate
  * subm row     full tap-group conv, row-major (current)
  * subm cm      full tap-group conv, channel-major prototype
"""
import sys, time
sys.path.insert(0, ".")
from minsu3d_tpu.util.env import setup_jax_cache
setup_jax_cache()
import jax, jax.numpy as jnp, numpy as np

V = 114688
C = 16
COUT = 16
TAPS = 27
rng = np.random.default_rng(0)
# kernel-map-like indices: mostly near-diagonal (neighbors are close in the
# sorted voxel table), ~20% missing (= V -> zero row)
base = np.arange(V)[:, None] + rng.integers(-64, 64, (V, TAPS))
nbr_np = np.clip(base, 0, V - 1)
nbr_np[rng.random((V, TAPS)) < 0.2] = V
nbr = jnp.array(nbr_np, jnp.int32)

def timeit(name, fn, *args, reps=10):
    # fetch-forced timing (block_until_ready is a no-op on the axon tunnel,
    # CLAUDE.md); includes the ~30ms fetch roundtrip
    f = jax.jit(fn)
    r = f(*args)
    np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
        np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / reps
    print(f"# {name:36s} {dt*1000:9.2f} ms (incl ~30ms fetch)", flush=True)
    return r

for dtype in (jnp.bfloat16, jnp.float32):
    dn = "bf16" if dtype == jnp.bfloat16 else "f32 "
    x_vc = jnp.array(rng.normal(0, 1, (V + 1, C)), dtype)
    x_cv = x_vc.T  # (C, V+1)
    w = jnp.array(rng.normal(0, 0.1, (TAPS, C, COUT)), dtype)

    timeit(f"{dn} row-gather (V,C)[nbr] all27",
           lambda x, i: x[i].sum(axis=(1,)), x_vc, nbr)
    timeit(f"{dn} col-gather (C,V)[:,nbr] all27",
           lambda x, i: x[:, i].sum(axis=(2,)), x_cv, nbr)
    timeit(f"{dn} 1d-gather x27 (per-channel c0)",
           lambda x, i: x[0][i].sum(axis=1), x_cv, nbr)

    def subm_row(x, i, w):
        v = i.shape[0]
        g = x[i]                                 # (V, 27, C)
        return jax.lax.dot_general(
            g.reshape(v, TAPS * C), w.reshape(TAPS * C, COUT),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def subm_cm(x, i, w):
        g = x[:, i]                              # (C, V, 27)
        return jax.lax.dot_general(
            w, g, dimension_numbers=(((0, 1), (2, 0)), ((), ())),
            preferred_element_type=jnp.float32)  # (COUT, V)

    timeit(f"{dn} subm_conv row-major (current)", subm_row, x_vc, nbr, w)
    timeit(f"{dn} subm_conv channel-major", subm_cm, x_cv, nbr, w)

    # tap-at-a-time channel-major (27 small GEMMs, no (C,V,27) temp)
    def subm_cm_loop(x, i, w):
        out = jnp.zeros((COUT, V), jnp.float32)
        for k in range(TAPS):
            g = x[:, i[:, k]]                    # (C, V)
            out = out + jax.lax.dot_general(
                w[k], g, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return out

    timeit(f"{dn} subm_conv cm tap-loop", subm_cm_loop, x_cv, nbr, w)

# --- gather locality: does sorted/near-sequential index order cut the
# ~9ns/element random-gather cost? Decides the sorted-space ball query.
E2 = 3_000_000
SRC = 57344
src = jnp.array(rng.normal(0, 1, (SRC + 1,)), jnp.float32)
idx_rand = jnp.array(rng.integers(0, SRC, E2), jnp.int32)
idx_sort = jnp.sort(idx_rand)
# near-sequential with small jitter (like run-local candidate fetches)
idx_seq = jnp.array(np.clip(np.arange(E2) * SRC // E2
                            + rng.integers(-8, 8, E2), 0, SRC - 1), jnp.int32)
idx_const = jnp.array(np.repeat(rng.integers(0, SRC, E2 // 64), 64)[:E2], jnp.int32)

timeit("1d gather 3M random", lambda s, i: s[i].sum(), src, idx_rand)
timeit("1d gather 3M sorted", lambda s, i: s[i].sum(), src, idx_sort)
timeit("1d gather 3M near-seq", lambda s, i: s[i].sum(), src, idx_seq)
timeit("1d gather 3M piecewise-const", lambda s, i: s[i].sum(), src, idx_const)
timeit("3x 1d gather 3M sorted", lambda s, i: s[i].sum() + s[jnp.minimum(i + 1, SRC)].sum()
       + s[jnp.minimum(i + 2, SRC)].sum(), src, idx_sort)

"""Does a sliced XLA gather (slice_sizes=(w, C)) cost per-INDEX or per-ROW
on this TPU? Decides the windowed-tap backbone idea: the 3 subm-conv taps
that differ only in dz live in a <=3-row window of the z-sorted voxel
table, so 9 window fetches could replace 27 row fetches IF a (3, C) slice
fetch costs about the same as a (1, C) row fetch (one HBM transaction
covers 3*16*2B = 96 B contiguous).

Usage: python tools/microbench_window_gather.py
"""
import sys, time

sys.path.insert(0, ".")
from minsu3d_tpu.util.env import setup_jax_cache

setup_jax_cache()
import jax, jax.numpy as jnp, numpy as np

V = 122880
C = 16
rng = np.random.default_rng(0)
# near-diagonal kernel-map-like indices (neighbors cluster near the row)
base = np.arange(V)[:, None] + rng.integers(-2048, 2048, (V, 27))
nbr27 = jnp.array(np.clip(base, 0, V - 1), jnp.int32)
nbr9 = nbr27[:, ::3]  # one window base per (dx,dy) group


def timeit(name, fn, *args, reps=10):
    f = jax.jit(fn)
    r = f(*args)
    np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
        np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / reps
    print(f"# {name:44s} {dt*1000:9.2f} ms (incl fetch)", flush=True)
    return r


def window_gather(x, idx, w):
    """(N,) indices -> (N, w, C) contiguous row slices via one XLA gather."""
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0,))
    return jax.lax.gather(
        x, idx[:, None], dn, slice_sizes=(w, x.shape[1]),
        mode=jax.lax.GatherScatterMode.CLIP)


for dtype in (jnp.bfloat16, jnp.float32):
    dn = "bf16" if dtype == jnp.bfloat16 else "f32 "
    x = jnp.array(rng.normal(0, 1, (V + 8, C)), dtype)

    timeit(f"{dn} 27 row gathers x[nbr27]",
           lambda x, i: x[i].sum(axis=1), x, nbr27)
    timeit(f"{dn} 9 row gathers x[nbr9]",
           lambda x, i: x[i].sum(axis=1), x, nbr9)
    timeit(f"{dn} 9 window(3) sliced gathers",
           lambda x, i: window_gather(x, i.reshape(-1), 3)
           .reshape(V, 9, 3, C).sum(axis=(1, 2)), x, nbr9)
    timeit(f"{dn} 9 window(8) sliced gathers",
           lambda x, i: window_gather(x, i.reshape(-1), 8)
           .reshape(V, 9, 8, C).sum(axis=(1, 2)), x, nbr9)
    timeit(f"{dn} 27 window(3) sliced gathers",
           lambda x, i: window_gather(x, i.reshape(-1), 3)
           .reshape(V, 27, 3, C).sum(axis=(1, 2)), x, nbr27)

"""Blocked-window submanifold conv probe: full conv (gather + 27-tap GEMM +
output) formulated as a lax.scan over row blocks with a dynamic-slice halo
window, vs the production subm_conv row-gather form. Includes a trivial-op
calibration of the axon fetch roundtrip.

Usage: python tools/microbench_blocked_conv.py [C=16] [COUT=16]
"""
import sys, time

sys.path.insert(0, ".")
from minsu3d_tpu.util.env import setup_jax_cache

setup_jax_cache()
import jax, jax.numpy as jnp, numpy as np
from functools import partial

V = 122880
C = int(sys.argv[1]) if len(sys.argv) > 1 else 16
COUT = int(sys.argv[2]) if len(sys.argv) > 2 else 16
H = 2048
rng = np.random.default_rng(0)
base = np.arange(V)[:, None] + rng.integers(-H, H, (V, 27))
nbr27 = np.clip(base, 0, V - 1)
CAL = [0.0]


def timeit(name, fn, *args, reps=10):
    f = jax.jit(fn)
    float(np.asarray(f(*args)))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(np.asarray(f(*args)))
    dt = (time.perf_counter() - t0) / reps
    print(f"# {name:46s} {dt*1000:9.2f} ms  (-cal: {(dt-CAL[0])*1000:7.2f})",
          flush=True)


def conv_rows(x, idx, w):
    """production subm_conv shape: 27 row gathers + (V, 27C)x(27C, COUT)."""
    g = x[idx]                                        # (V, 27, C)
    out = jax.lax.dot_general(
        g.reshape(V, 27 * C), w.reshape(27 * C, COUT),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out.astype(x.dtype).sum()


def conv_blocked(x, local, starts, w, B):
    xp = jnp.pad(x, ((H, H), (0, 0)))

    def step(carry, si):
        s, li = si
        win = jax.lax.dynamic_slice(xp, (s, 0), (B + 2 * H, C))
        g = win[li]                                   # (B, 27, C)
        ob = jax.lax.dot_general(
            g.reshape(B, 27 * C), w.reshape(27 * C, COUT),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return carry + ob.astype(x.dtype).sum(), 0.0

    tot, _ = jax.lax.scan(step, jnp.zeros((), x.dtype), (starts, local))
    return tot


for dtype in (jnp.bfloat16,):
    dn = "bf16" if dtype == jnp.bfloat16 else "f32 "
    x = jnp.array(rng.normal(0, 1, (V, C)), dtype)
    idx = jnp.array(nbr27, jnp.int32)
    w = jnp.array(rng.normal(0, 0.1, (27, C, COUT)), dtype)

    f = jax.jit(lambda x: x[0, 0] * 2)
    float(np.asarray(f(x)))
    t0 = time.perf_counter()
    for _ in range(20):
        float(np.asarray(f(x)))
    CAL[0] = (time.perf_counter() - t0) / 20
    print(f"# fetch calibration: {CAL[0]*1000:.2f} ms", flush=True)

    timeit(f"{dn} conv row-gather C={C}->{COUT}", conv_rows, x, idx, w)
    for B in (2048, 4096, 8192):
        nblk = V // B
        starts = jnp.arange(nblk, dtype=jnp.int32) * B
        li = (nbr27.reshape(nblk, B, 27)
              - (np.arange(nblk) * B - H)[:, None, None])
        li = jnp.array(np.clip(li, 0, B + 2 * H - 1), jnp.int32)
        timeit(f"{dn} conv blocked B={B} C={C}->{COUT}",
               partial(conv_blocked, B=B), x, li, starts, w)


# -- realistic variant: full (V, COUT) output via scan ys, zero-row sentinel --
def conv_blocked_full(x, local, starts, w, B):
    xp = jnp.pad(x, ((H, H + 1), (0, 0)))      # +1: zero row at the very end
    S = B + 2 * H

    def step(_, si):
        s, li = si
        win = jnp.concatenate(
            [jax.lax.dynamic_slice(xp, (s, 0), (S, x.shape[1])),
             jnp.zeros((1, x.shape[1]), x.dtype)])
        g = win[li]                            # (B, 27, C); li==S -> zeros
        ob = jax.lax.dot_general(
            g.reshape(B, 27 * x.shape[1]), w.reshape(27 * x.shape[1], COUT),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0.0, ob.astype(x.dtype)

    _, ys = jax.lax.scan(step, 0.0, (starts, local))
    return ys.reshape(-1, COUT)


def conv_rows_full(x, idx, w):
    g = x[idx]
    return jax.lax.dot_general(
        g.reshape(V, 27 * x.shape[1]), w.reshape(27 * x.shape[1], COUT),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)


def run_full():
    dtype = jnp.bfloat16
    x = jnp.array(rng.normal(0, 1, (V, C)), dtype)
    idx = jnp.array(nbr27, jnp.int32)
    w = jnp.array(rng.normal(0, 0.1, (27, C, COUT)), dtype)
    ref = None
    for B in (4096,):
        nblk = V // B
        starts = jnp.arange(nblk, dtype=jnp.int32) * B
        li = (nbr27.reshape(nblk, B, 27)
              - (np.arange(nblk) * B - H)[:, None, None])
        li = jnp.array(np.clip(li, 0, B + 2 * H), jnp.int32)
        timeit(f"bf16 FULL blocked B={B} C={C}->{COUT}",
               lambda x, l, s, w: conv_blocked_full(x, l, s, w, B).sum(),
               x, li, starts, w)
        got = jax.jit(partial(conv_blocked_full, B=B))(x, li, starts, w)
        ref = jax.jit(conv_rows_full)(x, idx, w)
        print(f"# bitwise equal vs row form: "
              f"{bool(jnp.all(got == ref))}", flush=True)
    timeit(f"bf16 FULL row-gather C={C}->{COUT}",
           lambda x, i, w: conv_rows_full(x, i, w).sum(), x, idx, w)


run_full()

"""Map the (B, H) cost surface of the blocked subm conv at a given level
shape. Usage: python tools/microbench_blocked_bh.py V C COUT 'B,H;B,H;...'
"""
import sys, time

sys.path.insert(0, ".")
from minsu3d_tpu.util.env import setup_jax_cache

setup_jax_cache()
import jax, jax.numpy as jnp, numpy as np
from functools import partial

V, C, COUT = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
combos = [tuple(int(v) for v in t.split(",")) for t in sys.argv[4].split(";")]
rng = np.random.default_rng(0)
# spread deltas across the halo range so the working set is realistic
maxh = max(h for _, h in combos)
base = np.arange(V)[:, None] + rng.integers(-maxh, maxh, (V, 27))
nbr27 = np.clip(base, 0, V - 1)
CAL = [0.0]


def timeit(name, fn, *args, reps=10):
    f = jax.jit(fn)
    float(np.asarray(f(*args)))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(np.asarray(f(*args)))
    dt = (time.perf_counter() - t0) / reps
    print(f"# {name:40s} {dt*1000:9.2f} ms  (-cal: {(dt-CAL[0])*1000:7.2f})",
          flush=True)


def conv_blocked(x, local, starts, w, B, H):
    xp = jnp.pad(x, ((H, H + 1), (0, 0)))
    S = B + 2 * H

    def step(_, si):
        s, li = si
        win = jnp.concatenate(
            [jax.lax.dynamic_slice(xp, (s, 0), (S, C)),
             jnp.zeros((1, C), x.dtype)])
        g = win[li]
        ob = jax.lax.dot_general(
            g.reshape(B, 27 * C), w.reshape(27 * C, COUT),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0.0, ob.astype(x.dtype)

    _, ys = jax.lax.scan(step, 0.0, (starts, local))
    return ys.reshape(-1, COUT).sum()


def conv_rows(x, idx, w):
    g = x[idx]
    return jax.lax.dot_general(
        g.reshape(V, 27 * C), w.reshape(27 * C, COUT),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype).sum()


x = jnp.array(rng.normal(0, 1, (V, C)), jnp.bfloat16)
idx = jnp.array(nbr27, jnp.int32)
w = jnp.array(rng.normal(0, 0.1, (27, C, COUT)), jnp.bfloat16)

f = jax.jit(lambda x: x[0, 0] * 2)
float(np.asarray(f(x)))
t0 = time.perf_counter()
for _ in range(20):
    float(np.asarray(f(x)))
CAL[0] = (time.perf_counter() - t0) / 20
print(f"# fetch calibration: {CAL[0]*1000:.2f} ms", flush=True)
timeit(f"rows V={V} C={C}->{COUT}", conv_rows, x, idx, w)
for B, H in combos:
    if V % B:
        print(f"# skip B={B} (V%B={V%B})")
        continue
    nblk = V // B
    starts = jnp.arange(nblk, dtype=jnp.int32) * B
    li = (nbr27.reshape(nblk, B, 27)
          - (np.arange(nblk) * B - H)[:, None, None])
    li = jnp.array(np.clip(li, 0, B + 2 * H), jnp.int32)
    timeit(f"blocked B={B} H={H} win={B+2*H}",
           partial(conv_blocked, B=B, H=H), x, li, starts, w)

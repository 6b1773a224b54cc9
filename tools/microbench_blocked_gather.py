"""Blocked VMEM-window gather probe: can plain XLA (no Pallas — the tunnel
rejects Mosaic) beat the per-row HBM gather cost by gathering inside a
dynamic-slice window that fits VMEM?

99.9% of kernel-map neighbors lie within +-2048 rows of the target
(tools/microbench_subm.py, real plan). Process voxels in blocks: slice rows
[start-H, start+B+H) sequentially (full-BW HBM stream), rebase indices, and
gather from the window. If XLA keeps the fused window in VMEM the random
fetches stop paying the ~512B HBM transaction per 32B row.

Usage: python tools/microbench_blocked_gather.py
"""
import sys, time

sys.path.insert(0, ".")
from minsu3d_tpu.util.env import setup_jax_cache

setup_jax_cache()
import jax, jax.numpy as jnp, numpy as np
from functools import partial

V = 122880
C = 16
H = 2048  # halo
rng = np.random.default_rng(0)
base = np.arange(V)[:, None] + rng.integers(-H, H, (V, 27))
nbr27 = np.clip(base, 0, V - 1)


def timeit(name, fn, *args, reps=10):
    f = jax.jit(fn)
    r = f(*args)
    float(np.asarray(r))  # scalar fetch forces execution (~27ms roundtrip)
    t0 = time.perf_counter()
    for _ in range(reps):
        float(np.asarray(f(*args)))
    dt = (time.perf_counter() - t0) / reps
    print(f"# {name:44s} {dt*1000:9.2f} ms (incl ~27ms fetch)", flush=True)


def baseline(x, idx):
    return x[idx].sum()


def blocked(x, local, starts, B):
    """scan over blocks: window = dynamic_slice(B + 2H rows), gather inside."""
    xp = jnp.pad(x, ((H, H), (0, 0)))          # rows shift by +H

    def step(carry, si):
        s, li = si                              # li (B, 27) window-local idx
        win = jax.lax.dynamic_slice(xp, (s, 0), (B + 2 * H, C))
        return carry + win[li].sum(), 0.0

    tot, _ = jax.lax.scan(step, 0.0, (starts, local))
    return tot


for dtype in (jnp.bfloat16, jnp.float32):
    dn = "bf16" if dtype == jnp.bfloat16 else "f32 "
    x = jnp.array(rng.normal(0, 1, (V, C)), dtype)
    idx = jnp.array(nbr27, jnp.int32)
    timeit(f"{dn} 27-tap row gather (baseline)", baseline, x, idx)
    for B in (2048, 4096, 8192):
        nblk = V // B
        starts = jnp.arange(nblk, dtype=jnp.int32) * B  # into padded rows
        # window-local indices: global idx - (block start - H)
        li = (nbr27.reshape(nblk, B, 27)
              - (np.arange(nblk) * B - H)[:, None, None])
        li = jnp.array(np.clip(li, 0, B + 2 * H - 1), jnp.int32)
        timeit(f"{dn} blocked B={B} win={B+2*H}", partial(blocked, B=B),
               x, li, starts)

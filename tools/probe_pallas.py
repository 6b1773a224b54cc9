"""Probe: does Pallas (Mosaic) compile and run through the axon tunnel, and
how fast is an in-VMEM dynamic row gather vs XLA's HBM gather?

The subm conv's cost is ~4 ns per gathered (C=16) row (tools/
microbench_subm.py) and 99.9% of kernel-map neighbors lie within +-2048 rows
of their target (real plan, sorted voxel space) — a VMEM-windowed gather
kernel would turn 3.3M random HBM row fetches per level-0 conv into local
VMEM indexing. This probe checks the prerequisites:
  1. pallas_call works at all on this remote TPU;
  2. a dynamic row gather (jnp.take along axis 0 with a traced index vector)
     lowers inside a kernel, and its speed;
  3. the MXU fallback (one-hot matmul gather) speed, which needs no dynamic
     indexing support at all.

Block windows here are ALIGNED (idx within the tile's own block) — real
kernel maps need overlapping windows via manual HBM->VMEM DMA, but lowering
and throughput are what this probe must establish.

Usage: python tools/probe_pallas.py
"""
import sys, time
sys.path.insert(0, ".")
from minsu3d_tpu.util.env import setup_jax_cache
setup_jax_cache()
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

V = 122880
C = 128
TILE = 4608      # rows per grid step (both source window and output tile)

rng = np.random.default_rng(0)
x = jnp.array(rng.normal(0, 1, (V + TILE, C)), jnp.float32)[:V]
idx_local = jnp.array(rng.integers(0, TILE, (V,)), jnp.int32)


def timeit(name, fn, *args, reps=10):
    f = jax.jit(fn)
    try:
        r = f(*args)
        jax.block_until_ready(r)
    except Exception as e:  # noqa: BLE001 - probe reports and continues
        print(f"# {name:40s} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None
    t0 = time.perf_counter()
    rs = [f(*args) for _ in range(reps)]
    jax.block_until_ready(rs)
    print(f"# {name:40s} {(time.perf_counter()-t0)/reps*1000:9.2f} ms", flush=True)
    return rs[0]


# 1. trivial kernel
def k_double(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0


timeit("pallas trivial x*2", lambda x: pl.pallas_call(
    k_double, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x), x)

GRID = V // TILE


# 2. tiled dynamic row gather: out[i] = block[idx[i]] with a traced index
def k_gather(idx_ref, win_ref, o_ref):
    o_ref[:] = jnp.take(win_ref[:], idx_ref[:], axis=0)


def tiled_gather(x, idx):
    return pl.pallas_call(
        k_gather,
        grid=(GRID,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, C), x.dtype),
    )(idx, x)


r = timeit("pallas tiled take-gather (4608-window)", tiled_gather, x, idx_local)
if r is not None:
    # correctness spot check vs XLA
    want = jnp.take(x[:TILE], idx_local[:TILE], axis=0)
    ok = bool(jnp.allclose(r[:TILE], want))
    print(f"# take-gather correctness: {ok}")


# 3. XLA reference: same volume of random row gathers (full-V indices)
timeit("XLA gather x[idx] full-V", lambda x, i: x[i], x,
       jnp.array(rng.integers(0, V, (V,)), jnp.int32))
# 3b. XLA gather at C=16 rows (the real backbone width)
x16 = jnp.array(rng.normal(0, 1, (V, 16)), jnp.float32)
timeit("XLA gather x[idx] full-V C=16", lambda x, i: x[i], x16,
       jnp.array(rng.integers(0, V, (V,)), jnp.int32))


# 4. one-hot matmul gather (MXU route, no dynamic indexing needed)
def k_onehot(idx_ref, win_ref, o_ref):
    oh = (jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
          == idx_ref[:].reshape(TILE, 1)).astype(jnp.float32)
    o_ref[:] = jnp.dot(oh, win_ref[:], preferred_element_type=jnp.float32)


def onehot_gather(x, idx):
    return pl.pallas_call(
        k_onehot,
        grid=(GRID,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, C), jnp.float32),
    )(idx, x)


timeit("pallas one-hot matmul gather", onehot_gather, x, idx_local)
print("# done")

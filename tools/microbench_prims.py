"""Per-primitive TPU cost model: gather / scatter(add,min) / sort / cumsum /
cummax at clustering-relevant sizes. Replaces the round-2 folk model
("gathers 9ns/el") with measured numbers — the round-3 microbenches showed
small-table gathers are ~100x cheaper than that model predicted, so the real
cost centers must be re-identified before more optimization.
"""
import sys, time
sys.path.insert(0, ".")
from minsu3d_tpu.util.env import setup_jax_cache
setup_jax_cache()
import jax, jax.numpy as jnp, numpy as np

rng = np.random.default_rng(0)

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
    print(f"# {name:44s} {dt*1000:9.2f} ms (incl ~30ms fetch)", flush=True)
    return r

N = 57344
K = 16
E = 3_000_000

table = jnp.array(rng.integers(0, N, N + 1), jnp.int32)
ftable = jnp.array(rng.normal(0, 1, N + 1), jnp.float32)
idx_kn = jnp.array(rng.integers(0, N, (K, N)), jnp.int32)   # (K, N) like CC nbr
idx_e = jnp.array(rng.integers(0, N, E), jnp.int32)
idx_e_sorted = jnp.sort(idx_e)
vals_kn = jnp.array(rng.integers(0, N, (K, N)), jnp.int32)
vals_e = jnp.array(rng.normal(0, 1, E), jnp.float32)

# gathers
timeit("gather (K,N)=917k from 229KB table", lambda t, i: t[i].sum(), table, idx_kn)
timeit("gather 3M random from 229KB table", lambda t, i: t[i].sum(), table, idx_e)
big = jnp.array(rng.integers(0, N, 4 * 1024 * 1024), jnp.int32)  # 16MB table
timeit("gather 3M random from 16MB table",
       lambda t, i: t[i].sum(), big, idx_e % (4 * 1024 * 1024))
timeit("gather 3M NO-reduce (materialize)", lambda t, i: t[i] + 1, table, idx_e)

# scatters
timeit("scatter-min (K,N)->N", lambda t, i, v: t.at[i].min(v), table, idx_kn, vals_kn)
timeit("scatter-add 3M->N f32",
       lambda t, i, v: t.at[i].add(v), ftable, idx_e, vals_e)
timeit("scatter-set 3M->N (drop dups)",
       lambda t, i, v: t.at[i].set(v), ftable, idx_e, vals_e)
timeit("scatter-max 917k->3M (edge enum)",
       lambda i, v: jnp.zeros((E,), jnp.int32).at[v[:917504].sort()].max(
           jnp.arange(917504, dtype=jnp.int32), mode="drop"),
       idx_kn.reshape(-1), (idx_e[:917504] % E))

# scans / sorts
timeit("cumsum 3M i32", lambda v: jnp.cumsum(v), idx_e)
timeit("cummax 3M i32", lambda v: jax.lax.cummax(v), idx_e)
timeit("sort 3M 1 operand", lambda v: jax.lax.sort((v,), num_keys=1), idx_e)
timeit("sort 3M 2 operands", lambda a, b: jax.lax.sort((a, b), num_keys=1),
       idx_e, idx_e)
timeit("sort 3M 4 operands",
       lambda a, b: jax.lax.sort((a, b, a, b), num_keys=2), idx_e, idx_e)
timeit("argsort 917k", lambda v: jnp.argsort(v), idx_kn.reshape(-1))

# the CC sweep, isolated (one iteration of ops/cluster.py::sweep)
nbr_t = idx_kn
valid_t = jnp.array(rng.random((K, N)) < 0.7)
label = jnp.arange(N, dtype=jnp.int32)
active = jnp.ones((N,), bool)

def sweep(label):
    n = N
    ext = jnp.concatenate([label, jnp.full((1,), n, jnp.int32)])
    rv = jnp.where(valid_t, ext[nbr_t], n)
    m = jnp.minimum(jnp.min(rv, axis=0), label)
    ext = jnp.concatenate([label, jnp.full((1,), n, jnp.int32)])
    ext = ext.at[jnp.minimum(label, n)].min(m)
    ext = ext.at[rv].min(jnp.broadcast_to(label[None, :], rv.shape), mode="drop")
    label = jnp.minimum(label, ext[:n])
    for _ in range(4):
        ext = jnp.concatenate([label, jnp.full((1,), n, jnp.int32)])
        label = jnp.minimum(label, ext[label])
    return label

timeit("CC sweep (gather+2 scatter-min+4 jumps)", sweep, label)

def sweep_g(label):
    n = N
    ext = jnp.concatenate([label, jnp.full((1,), n, jnp.int32)])
    rv = jnp.where(valid_t, ext[nbr_t], n)
    return jnp.minimum(jnp.min(rv, axis=0), label)

timeit("CC sweep gather+min only", sweep_g, label)

def sweep_s1(label):
    n = N
    ext = jnp.concatenate([label, jnp.full((1,), n, jnp.int32)])
    rv = jnp.where(valid_t, ext[nbr_t], n)
    m = jnp.minimum(jnp.min(rv, axis=0), label)
    ext = ext.at[jnp.minimum(label, n)].min(m)
    return ext[:n]

timeit("CC sweep + node scatter-min (N)", sweep_s1, label)

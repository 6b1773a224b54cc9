"""CC root-graph coarsening cap sweep on the real bench unit graphs.

Labels are bit-identical for any cap (the final full-graph loop runs to the
unique fixpoint); this measures the speed effect only. Reuses
microbench_cc2.py's graph construction (same bench config, same trained
checkpoint) by executing its setup section.

Usage: python tools/microbench_cc5.py [reps=10]
"""
import functools
import sys
import time

sys.path.insert(0, ".")
_setup = open("tools/microbench_cc2.py").read().split("for name, (nbr_idx")[0]
exec(_setup)  # noqa: S102 — defines graphs/scaps/jax/jnp/np/connected_components

for name, (nbr_idx, nbr_valid, u_active, u_group) in graphs.items():  # noqa: F821
    ref = None
    for cap in (0, 4096, 8192, 16384, 32768):
        f = jax.jit(functools.partial(  # noqa: F821
            connected_components, max_iters=scaps.cc_iters, coarsen=cap))  # noqa: F821
        r = f(nbr_idx, nbr_valid, u_active, u_group)
        np.asarray(r[:1])  # noqa: F821 — value fetch, not block_until_ready
        t0 = time.perf_counter()
        rs = [f(nbr_idx, nbr_valid, u_active, u_group) for _ in range(REPS)]  # noqa: F821
        np.asarray(rs[-1][:1])  # noqa: F821
        dt = (time.perf_counter() - t0) / REPS
        same = True if ref is None else bool(jnp.all(r == ref))  # noqa: F821
        if ref is None:
            ref = r
        print(f"# CC {name:8s} coarsen={cap:6d}  {dt*1000:8.2f} ms  "
              f"labels_match={same}", flush=True)

"""Dense-grid 3D conv cost probe: can a full dense conv over the scene grid
beat the gather-based sparse conv at level 0?

Rationale: submanifold conv == dense conv when empty cells hold zeros (the
masked-dense equivalence the proposal heads already use). A dense conv
streams HBM and rides the MXU via im2col, paying bytes-per-cell instead of
the ~5 ns/row random-gather tax that pins the sparse backbone at
~0.195 s/scene. A 112k-point scene at 2 cm occupies an ~(400, 400, 104)
grid (~0.7% occupancy) = 0.53 GB bf16 at m=16, so one conv is ~1.3 GB of
traffic ~= 1.6 ms at the 819 GB/s roofline; 27x the FLOPs of the sparse
formulation is still only ~0.2% MXU.

Times conv3d at several grid sizes + channel widths, and a stride-2
downsample, with the fetch-calibrated pattern (CLAUDE.md: block_until_ready
lies on the axon tunnel; enqueue REPS then fetch a scalar).

Usage: python tools/microbench_dense3d.py [reps=10]
"""
import sys, time
sys.path.insert(0, ".")
from minsu3d_tpu.util.env import setup_jax_cache
setup_jax_cache()
import jax, jax.numpy as jnp, numpy as np

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 10


def timeit(name, fn, *args):
    f = jax.jit(fn)
    try:
        t0 = time.perf_counter()
        r = f(*args); jax.block_until_ready(r)
        tc = time.perf_counter() - t0
    except Exception as e:  # noqa: BLE001 — probe: report and continue
        print(f"# {name:52s} FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(REPS):
        r = f(*args)
    s = float(np.asarray(jnp.sum(r[0].astype(jnp.float32))
                         if isinstance(r, tuple) else
                         jnp.sum(r.astype(jnp.float32))))
    t = (time.perf_counter() - t0) / REPS
    print(f"# {name:52s} {t*1000:9.2f} ms/call  (compile {tc:.1f}s, "
          f"sum={s:.3g})", flush=True)


rng = np.random.default_rng(0)
dn_cl = jax.lax.conv_dimension_numbers((1, 1, 1, 1, 1), (1, 1, 1, 1, 1),
                                       ("NXYZC", "XYZIO", "NXYZC"))
dn_cf = jax.lax.conv_dimension_numbers((1, 1, 1, 1, 1), (1, 1, 1, 1, 1),
                                       ("NCXYZ", "XYZIO", "NCXYZ"))


def conv3(x, w, dn, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride,) * 3, "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)


# fetch calibration
timeit("calib (x+1 on 1 scalar)", lambda v: v + 1.0, jnp.float32(1.0))

# channels-LAST (N,X,Y,Z,C): C=16 minor pads (8,128) tiles 8x — probe
# whether XLA's conv emitter dodges the padding; channels-FIRST (N,C,X,Y,Z)
# keeps (Y, Z) minor. Go/no-go pair first: remote compiles are slow, so the
# decision-critical variants must land before any timeout.
for (gx, gy, gz, c) in [(400, 400, 104, 16), (400, 400, 104, 32),
                        (200, 200, 52, 32)]:
    gb = 2 * (gx * gy * gz * c) * 2 / 1e9
    x = jnp.array(rng.normal(0, 1, (1, gx, gy, gz, c)), jnp.bfloat16)
    w = jnp.array(rng.normal(0, 0.1, (3, 3, 3, c, c)), jnp.bfloat16)
    timeit(f"conv3d NXYZC ({gx},{gy},{gz},{c}) [{gb:.2f} GB rt]",
           lambda x, w: conv3(x, w, dn_cl), x, w)
    del x
    x = jnp.array(rng.normal(0, 1, (1, c, gx, gy, gz)), jnp.bfloat16)
    timeit(f"conv3d NCXYZ ({c},{gx},{gy},{gz}) [{gb:.2f} GB rt]",
           lambda x, w: conv3(x, w, dn_cf), x, w)
    del x
    x = jnp.array(rng.normal(0, 1, (1, gx, gy, gz, c)), jnp.bfloat16)
    timeit(f"conv3d NXYZC ({gx},{gy},{gz},{c}) stride2",
           lambda x, w: conv3(x, w, dn_cl, 2), x, w)
    del x, w

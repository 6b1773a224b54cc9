"""z-run slice subm conv vs dense gather form, on a REAL bench-scale plan.

Fetch-forced timing (np.asarray of a scalar reduction, minus the measured
fetch roundtrip) — `block_until_ready` does not reliably block on the axon
tunnel (BENCH_NOTES round-3 harness correction).

Usage: python tools/microbench_zslice.py [reps=20]
"""
import sys, time
sys.path.insert(0, ".")
from minsu3d_tpu.util.env import setup_jax_cache
setup_jax_cache()
import jax, jax.numpy as jnp, numpy as np
from minsu3d_tpu.config import load_config
from minsu3d_tpu.data.batching import collate, device_arrays, shard_caps
from minsu3d_tpu.data.dataset import GeneralDataset
from minsu3d_tpu.data.synthetic import make_scene
from minsu3d_tpu.model import general_model as gm
from minsu3d_tpu.model.caps import StaticCaps
from minsu3d_tpu.ops import sparse_conv as sc

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20

cfg = load_config(["model=pointgroup", "data=scannetv2",
    "model.trainer.precision=bfloat16",
    "data.caps.eval_points=139264", "data.caps.eval_voxels=122880",
    "data.caps.eval_instances=64"])
scenes = [make_scene(seed=0, num_objects=12, points_per_object=6000,
                     floor_points=40000, room=8.0)]
ds = GeneralDataset(cfg, "val", scenes=scenes)
caps = shard_caps(cfg, "val")
b = device_arrays(collate([ds[0]], caps))
b = jax.device_put(b)

scaps = StaticCaps.from_cfg(cfg, "val")
n_levels = len(cfg.model.network.blocks)
plan, _, _ = jax.jit(lambda bb: gm.build_scene_plan(
    bb, list(scaps.voxel_caps), n_levels))(b)

# calibrate the fetch roundtrip with a trivial program
tr = jax.jit(lambda x: jnp.sum(x))
_ = np.asarray(tr(jnp.ones(8)))
t0 = time.perf_counter()
for _ in range(10):
    _ = np.asarray(tr(jnp.ones(8)))
FETCH = (time.perf_counter() - t0) / 10
print(f"# fetch roundtrip {FETCH*1000:.1f} ms")


def timeit(name, fn, *args):
    f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    _ = np.asarray(f(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(REPS):
        r = f(*args)
    v = np.asarray(r)
    t = (time.perf_counter() - t0) / REPS - FETCH / REPS
    print(f"# {name:48s} {t*1000:9.2f} ms  (sum {v:.1f})", flush=True)


rng = np.random.default_rng(0)
for li in (0, 1, 2):
    lvl = plan.levels[li]
    V = lvl.nbr_idx.shape[0]
    C = int(cfg.model.network.m) * (li + 1)
    lz = sc.add_zslice_meta(lvl)
    x = jnp.array(rng.normal(0, 1, (V, C)), jnp.bfloat16)
    w27 = jnp.array(rng.normal(0, 0.1, (27, C, C)), jnp.bfloat16)
    # how complete are the z-runs on real data? (3-runs amortize best)
    m = np.asarray(lvl.nbr_idx).reshape(V, 9, 3)
    runlen = (m < V).sum(-1)[np.asarray(lvl.valid)]
    print(f"# L{li}: V={V} C={C} run lens 0/1/2/3 = "
          + "/".join(str((runlen == k).sum()) for k in range(4)))
    timeit(f"L{li} subm_conv (dense 27-gather)",
           lambda x, lvl=lvl, w27=w27: sc.subm_conv(x, lvl, w27, jnp.bfloat16), x)
    timeit(f"L{li} subm_conv_zslice (9 window gathers)",
           lambda x, lz=lz, w27=w27: sc.subm_conv_zslice(x, lz, w27, jnp.bfloat16), x)
    lb = sc.add_block_meta(lvl, halo=(2560, 1536, 768)[li])
    timeit(f"L{li} subm_conv_blocked",
           lambda x, lb=lb, w27=w27: sc.subm_conv_blocked(x, lb, w27, jnp.bfloat16), x)

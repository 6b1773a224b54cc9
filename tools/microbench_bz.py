"""Blocked z-run conv vs blocked 27-row conv on the real kernel maps.

The z-form gathers 9 three-row column slices per output inside each window
instead of 27 single rows; the realignment selects run in VMEM. Values are
identical (same contraction); this measures the speed and verifies equality.

Usage: python tools/microbench_bz.py [reps=10]
"""
import sys
import time

sys.path.insert(0, ".")
from minsu3d_tpu.util.env import setup_jax_cache  # noqa: E402

setup_jax_cache()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from minsu3d_tpu.config import load_config  # noqa: E402
from minsu3d_tpu.data.batching import collate, device_arrays, shard_caps  # noqa: E402
from minsu3d_tpu.data.dataset import GeneralDataset  # noqa: E402
from minsu3d_tpu.data.synthetic import make_scene  # noqa: E402
from minsu3d_tpu.model import general_model as gm  # noqa: E402
from minsu3d_tpu.model.caps import StaticCaps  # noqa: E402
from minsu3d_tpu.ops import sparse_conv as sc  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 10

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
jax.block_until_ready(b)

scaps = StaticCaps.from_cfg(cfg, "val")
n_levels = len(cfg.model.network.blocks)
plan, _, _ = jax.jit(lambda bb: gm.build_scene_plan(
    bb, list(scaps.voxel_caps), n_levels))(b)
jax.block_until_ready(plan)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    np.asarray(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(REPS - 1):
        f(*args)
    last = f(*args)
    s = float(np.asarray(jnp.sum(
        jax.tree_util.tree_leaves(last)[0].astype(jnp.float32))))
    t = (time.perf_counter() - t0) / REPS
    print(f"# {name:42s} {t*1000:9.2f} ms  (sum={s:.6g})", flush=True)
    return r


rng = np.random.default_rng(0)
for li, halo, C in ((0, 2560, 16), (1, 1536, 32), (2, 768, 48), (3, 256, 64)):
    lvl = plan.levels[li]
    lvl_b = jax.jit(lambda l, h=halo: sc.add_block_meta(l, h))(lvl)
    lvl_z = jax.jit(lambda l, h=halo: sc.add_block_meta_z(l, h))(lvl)
    jax.block_until_ready((lvl_b, lvl_z))
    V = lvl.nbr_idx.shape[0]
    nfix_b = int(np.asarray((lvl_b.fix_src < V).sum()))
    nfix_z = int(np.asarray((lvl_z.fix_src < V).sum()))
    print(f"# level {li}: V={V} C={C} halo={halo} fixups b={nfix_b} z={nfix_z} "
          f"zdrop={int(np.asarray(lvl_z.fix_dropped))}", flush=True)
    x = jnp.array(rng.normal(0, 1, (V, C)), jnp.bfloat16)
    w27 = jnp.array(rng.normal(0, 0.1, (27, C, C)), jnp.bfloat16)
    timeit("calib", lambda v: v + 1.0, jnp.float32(1.0))
    rb = timeit("blocked (shipped)", lambda x: sc.subm_conv_blocked(
        x, lvl_b, w27, compute_dtype=jnp.bfloat16), x)
    rz = timeit("blocked z-run", lambda x: sc.subm_conv_blocked_z(
        x, lvl_z, w27, compute_dtype=jnp.bfloat16), x)
    same = np.array_equal(np.asarray(rb), np.asarray(rz))
    close = np.allclose(np.asarray(rb, np.float32), np.asarray(rz, np.float32),
                        rtol=0.05, atol=0.05)
    print(f"#   equal={same} close={close}", flush=True)

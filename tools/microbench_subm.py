"""Backbone decomposition on the real TPU with a REAL grid plan (not the
synthetic near-diagonal indices of microbench_gather.py, whose timings were
tunnel artifacts). Timing = many enqueued executions + one synchronize.

Answers: where do the ~200 ms/scene of backbone go — gathers, GEMMs, BN, or
the up/down convs — and what would a windowed (VMEM-local) gather save?

Usage: python tools/microbench_subm.py [reps=10]
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
from minsu3d_tpu.model import get_model
from minsu3d_tpu.model import general_model as gm
from minsu3d_tpu.model.caps import StaticCaps
from minsu3d_tpu.ops import sparse_conv as sc

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
b = jax.device_put(b); jax.block_until_ready(b)

scaps = StaticCaps.from_cfg(cfg, "val")
n_levels = len(cfg.model.network.blocks)
plan, _, _ = jax.jit(lambda bb: gm.build_scene_plan(
    bb, list(scaps.voxel_caps), n_levels))(b)
jax.block_until_ready(plan)

lvl0 = plan.levels[0]
V = lvl0.nbr_idx.shape[0]
C = int(cfg.model.network.m)
print(f"# V={V} C={C} levels={n_levels} caps={list(scaps.voxel_caps)}")

# neighbor locality of the REAL kernel map (informs a windowed pallas gather)
nbr = np.asarray(lvl0.nbr_idx)
valid = nbr < V
self_idx = np.arange(V)[:, None]
d = np.abs(nbr - self_idx)[valid]
for w in (128, 512, 2048, 8192, 32768):
    print(f"# |nbr-i|<={w}: {np.mean(d <= w):.3f}")
print(f"# valid tap fraction: {valid[np.asarray(lvl0.valid)].mean():.3f}")

rng = np.random.default_rng(0)
dt = jnp.bfloat16
x = jnp.array(rng.normal(0, 1, (V, C)), dt)
w27 = jnp.array(rng.normal(0, 0.1, (27, C, C)), dt)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    rs = [f(*args) for _ in range(REPS)]
    jax.block_until_ready(rs)
    t = (time.perf_counter() - t0) / REPS
    print(f"# {name:44s} {t*1000:9.2f} ms", flush=True)
    return rs[0]


timeit("subm_conv lvl0 (27 taps, V=cap)", lambda x: sc.subm_conv(
    x, lvl0, w27, compute_dtype=jnp.bfloat16), x)
timeit("gather only fe[nbr] (V,27,C)", lambda x: sc.ext_zero(
    x)[lvl0.nbr_idx].sum(axis=1), x)
timeit("gather 1 tap fe[nbr[:,13]]", lambda x: sc.ext_zero(
    x)[lvl0.nbr_idx[:, 13]], x)
timeit("GEMM only (V,27C)x(27C,C)", lambda g: jax.lax.dot_general(
    g, w27.reshape(27 * C, C), dimension_numbers=(((1,), (0,)), ((), ())),
    preferred_element_type=jnp.float32),
    jnp.array(rng.normal(0, 1, (V, 27 * C)), dt))

# tap-grouped variants: fewer materialized bytes per GEMM
for g in (1, 3, 9):
    timeit(f"subm_conv tap_group={g}", lambda x, g=g: sc.subm_conv(
        x, lvl0, w27, compute_dtype=jnp.bfloat16, tap_group=g), x)

# f32 comparison (activation width)
xf = x.astype(jnp.float32)
timeit("subm_conv lvl0 f32", lambda x: sc.subm_conv(
    x, lvl0, w27, compute_dtype=jnp.float32), xf)

# full Backbone apply for scale
bundle = get_model("PointGroup")
net = bundle.make_net(cfg, "val")
key = jax.random.PRNGKey(0)
variables = jax.jit(lambda k, bb: net.init(
    {"params": k, "cluster": k}, bb, False, False))(key, b)
jax.block_until_ready(variables)
timeit("FULL backbone (net.apply heads off)", lambda v, bb: net.apply(
    v, bb, False, False)["semantic_scores"], variables, b)

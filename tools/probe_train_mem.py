"""Compile-only HBM analysis of the full train step (no execution).

Replicates bench.py::_train_throughput's setup for a model, AOT-compiles the
jitted train step, and prints XLA's memory analysis (args / temps / total) so
HBM exhaustion can be diagnosed without wedging the chip with an OOM run.

Usage: python tools/probe_train_mem.py [model=hais] [batch_size]
"""
import sys

sys.path.insert(0, ".")
from minsu3d_tpu.util.env import setup_jax_cache  # noqa: E402

setup_jax_cache()
import jax  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from minsu3d_tpu.config import load_config  # noqa: E402
from minsu3d_tpu.data.batching import collate, device_arrays, plan_spec, shard_caps  # noqa: E402
from minsu3d_tpu.data.dataset import GeneralDataset  # noqa: E402
from minsu3d_tpu.data.synthetic import make_scene  # noqa: E402
from minsu3d_tpu.model import get_model  # noqa: E402
from minsu3d_tpu.model.caps import StaticCaps  # noqa: E402

from bench import MODELS, _cluster_prod_overrides, _round_up  # noqa: E402

model_name = sys.argv[1] if len(sys.argv) > 1 else "hais"
spec = MODELS[model_name]
overrides = [f"model={model_name}", "data=scannetv2",
             "model.trainer.precision=bfloat16",
             "model.network.blocked_subm=[2560,1536,768,256]",
             "model.network.remat=true"] + spec["cluster_overrides"]
if len(sys.argv) > 2:
    overrides.append(f"data.batch_size={sys.argv[2]}")
extras = sys.argv[3:]   # raw extra overrides, e.g. model.network.remat=2
cfg0 = load_config(overrides + extras)
scenes = [make_scene(seed=s, num_objects=12, points_per_object=6000,
                     floor_points=40000, room=8.0) for s in range(8)]
ds = GeneralDataset(cfg0, "train", scenes=scenes)
bs = int(cfg0.data.batch_size)
items = [ds[i] for i in range(len(ds))]
n_lv = len(cfg0.model.network.blocks)
starts = range(0, len(items) - bs + 1, bs)
max_pts = max(sum(items[j]["point_xyz"].shape[0] for j in range(i, i + bs))
              for i in starts)
max_vox, max_inst = 0, 0
for i in starts:
    max_inst = max(max_inst, sum(int(items[j]["num_instance"])
                                 for j in range(i, i + bs)))
    need = 0
    for lvl in range(n_lv):
        uniq = 0
        for j in range(i, i + bs):
            c = np.asarray(items[j]["voxel_coords"], np.int64) >> lvl
            uniq += len(np.unique((c[:, 0] << 22) | (c[:, 1] << 11) | c[:, 2]))
        need = max(need, uniq << lvl)
    max_vox = max(max_vox, need)
cfg = load_config(overrides + [
    f"data.caps.points={_round_up(max_pts + 1024, 8192)}",
    f"data.caps.voxels={_round_up(max_vox + 1024, 8192)}",
    f"data.caps.instances={max(64, max_inst)}",
    # same clustering caps as the train bench; extras LAST so they win
] + _cluster_prod_overrides(bs) + extras)
caps = shard_caps(cfg, "train")
plan = plan_spec(cfg, "train")
batch = device_arrays(collate(items[:bs], caps, plan))

net = bundle = get_model(spec["cls"])
net = bundle.make_net(cfg, "train")
scaps = StaticCaps.from_cfg(cfg, "train")
ff = bundle.forward_flags(cfg, 999, True)
lf = bundle.loss_flags(cfg, 999)
key = jax.random.PRNGKey(0)
variables = jax.eval_shape(
    lambda k, b: net.init({"params": k, "cluster": k}, b, True, True, **ff),
    key, batch)
params_s = variables["params"]
bstats_s = variables.get("batch_stats", {})
tx = optax.adam(float(cfg.model.optimizer.lr))
opt_s = jax.eval_shape(tx.init, params_s)


def loss_fn(params, batch_stats, batch, rng):
    out, mut = net.apply({"params": params, "batch_stats": batch_stats},
                         batch, True, True, **ff,
                         rngs={"cluster": rng}, mutable=["batch_stats"])
    losses = bundle.losses(cfg, scaps, batch, out, True, **lf)
    return sum(losses.values()), mut["batch_stats"]


def step(params, batch_stats, opt_state, batch, rng):
    (_, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, batch_stats, batch, rng)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), new_stats, opt_state


print(f"# compiling {model_name} train step bs={bs} "
      f"points={caps['points'] if isinstance(caps, dict) else ''}", flush=True)
lowered = jax.jit(step).lower(params_s, bstats_s, opt_s, batch, key)
compiled = lowered.compile()
ma = compiled.memory_analysis()
print(f"# memory analysis: {ma}")
for attr in ("argument_size_in_bytes", "output_size_in_bytes",
             "temp_size_in_bytes", "alias_size_in_bytes",
             "generated_code_size_in_bytes"):
    v = getattr(ma, attr, None)
    if v is not None:
        print(f"# {attr:<32} {v / 1e9:8.3f} GB")

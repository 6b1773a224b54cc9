"""Multi-host data parallelism: run train.py as TWO jax.distributed processes
(CPU backend, 2 virtual devices each = a 4-device global mesh) and check they
produce a trained checkpoint + finite metrics.

This exercises the real multi-controller path: per-process shard collation
(datamodule.train_batches process_index/process_count),
jax.make_array_from_process_local_data assembly, pmean over the global mesh,
and process-0-only logging/checkpointing. Reference capability being matched:
Lightning DDP with num_nodes (config/model/base.yaml:12-16)."""

import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

OVERRIDES = [
    "model=pointgroup", "data=synthetic",
    "model.trainer.num_nodes=2", "model.trainer.max_epochs=1",
    "model.trainer.check_val_every_n_epoch=1", "model.trainer.num_sanity_val_steps=0",
    "model.network.prepare_epochs=0", "data.batch_size=1",
    "data.num_workers=2",
    "data.synthetic.train_scenes=4", "data.synthetic.val_scenes=1",
    "data.synthetic.num_objects=3", "data.synthetic.points_per_object=300",
    "data.synthetic.floor_points=1200",
    "data.caps.points=8192", "data.caps.voxels=8192",
    "data.caps.eval_points=8192", "data.caps.eval_voxels=8192",
    "data.caps.instances=32", "data.caps.eval_instances=32",
    "data.caps.clusters=64", "data.caps.proposals=32",
    "data.caps.neighbors=8", "data.caps.cell_window=8",
    "model.network.blocks=[1,2]", "model.network.m=4", "model.network.block_reps=1",
    "experiment_name=mp_smoke",
]


@pytest.mark.slow
def test_two_process_train(tmp_path):
    out_root = os.path.join(REPO, "output", "Synthetic", "PointGroup", "mp_smoke")
    shutil.rmtree(out_root, ignore_errors=True)
    port = 23000 + (os.getpid() % 2000)
    procs = []
    logs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "PYTHONPATH": "",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
        })
        log = open(tmp_path / f"proc{pid}.log", "w")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, "train.py", *OVERRIDES],
            cwd=REPO, env=env, stdout=log, stderr=subprocess.STDOUT))
    rcs = [p.wait(timeout=900) for p in procs]
    for log in logs:
        log.close()
    for pid, rc in enumerate(rcs):
        if rc != 0:
            sys.stdout.write((tmp_path / f"proc{pid}.log").read_text()[-4000:])
        assert rc == 0, f"process {pid} exited {rc}"

    metrics_path = os.path.join(out_root, "metrics.jsonl")
    assert os.path.exists(metrics_path), "process 0 wrote no metrics"
    records = [json.loads(l) for l in open(metrics_path)]
    train_recs = [r for r in records if "train/semantic_loss" in r]
    assert train_recs and np.isfinite(train_recs[-1]["train/semantic_loss"])
    ckpt = os.path.join(out_root, "training", "epoch_1")
    assert os.path.isdir(ckpt), "no checkpoint saved"

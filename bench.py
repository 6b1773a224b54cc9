"""Benchmark: instance-segmentation inference scenes/sec/chip (voxelize +
UNet + cluster + refinement heads), the BASELINE.json metric. Runs the
full-size model (m=16, 7-level UNet) on synthetic ScanNet-scale scenes
(~112k points). Baselines: official per-scene latency on an RTX 2080 Ti
(reference README.md:214-216): PointGroup 176 ms, HAIS 165 ms,
SoftGroup 204 ms.

Usage: python bench.py [n_scenes] [scenes_per_batch] [model]

``model`` is pointgroup (default; the driver-recorded metric), hais, or
softgroup. Scenes are packed ``scenes_per_batch`` per forward: voxel/point
caps scale with the pack while the clustering unit capacity (the
ball-query/CC cost driver) is shared, so clustering cost per scene drops
~1/pack. Dispatch is pipelined (all forwards enqueued, one synchronize) so
the chip never idles between batches.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "timing"}.
``timing: device_compute`` = batches pre-staged in HBM, host collate and H2D
excluded (this image reaches the TPU through a remote tunnel whose transfer
path is not representative of a co-located host; the input pipeline overlaps
them in production). Set MINSU3D_BENCH_PIPELINE=1 to ALSO stream batches
through the num_workers host pipeline (collate + plan build + transfer in the
loop) and report the steady-state number in a ``pipeline_scenes_per_sec``
field. Set MINSU3D_BENCH_STAGES=1 for a per-stage breakdown (time / FLOPs /
bytes / %-of-roofline from XLA cost analysis) on stderr +
output/bench_stages.json.

Also measured by default: the 250k-point worst-case scene metric
(MINSU3D_BENCH_BIG=0 to skip) and the training step in both schedule
phases on golden weights (MINSU3D_BENCH_TRAIN=0 to skip; see
``_train_throughput``).
"""

from __future__ import annotations

import functools
import json
import os
import signal
import sys
import time

from minsu3d_tpu.util.env import setup_jax_cache

setup_jax_cache()  # must run before jax reads its config env vars

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

PEAK_BF16_FLOPS = 197e12   # TPU v5e MXU peak (bf16)
PEAK_HBM_BPS = 819e9       # TPU v5e HBM bandwidth

# per-model: reference latency anchor (README.md:214-216, RTX 2080 Ti),
# config group, registry class, trained-checkpoint candidates, and
# golden-AP-validated clustering overrides (K=16 neighbors and the edge-buffer
# factors change clustering semantics, so each value here was re-validated on
# the synthetic golden evals — BENCH_NOTES round 3: PG 0.892/1.000, HAIS
# 0.976/1.000, SoftGroup 0.920/0.949, all within noise of the
# reference-faithful settings). SoftGroup clusters (point, class) PAIRS, whose
# candidate runs are ~2x denser than PG/HAIS's shifted grid units — factor 28
# overflowed its edge buffer (109k edges dropped, -0.18 mAP), hence 56.
MODELS = {
    "pointgroup": {
        "baseline_ms": 176.0, "cls": "PointGroup",
        "ckpts": ["output/golden/pointgroup_epoch_120",
                  "output/Synthetic/PointGroup/synth_convergence/training/epoch_120"],
        "cluster_overrides": ["data.caps.neighbors=16",
                              "data.caps.bq_edge_factor=28",
                              "data.caps.bq_edge_factor_xyz=8"],
    },
    "hais": {
        "baseline_ms": 165.0, "cls": "HAIS",
        "ckpts": ["output/golden/hais_epoch_100",
                  "output/Synthetic/HAIS/synth_hais2/training/epoch_100"],
        "cluster_overrides": ["data.caps.neighbors=16",
                              "data.caps.bq_edge_factor=28"],
    },
    "softgroup": {
        "baseline_ms": 204.0, "cls": "SoftGroup",
        "ckpts": ["output/golden/softgroup_epoch_100",
                  "output/Synthetic/SoftGroup/synth_softgroup/training/epoch_100"],
        "cluster_overrides": ["data.caps.neighbors=16",
                              "data.caps.bq_edge_factor=56"],
    },
}


def _round_up(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


def _cluster_prod_overrides(scenes_per_shard: int, unit_scale: float = 1.0) -> list[str]:
    """Production-tuned clustering config, golden-AP-validated (PG 0.892/1.000
    vs 0.899/1.000 at reference-faithful settings; HAIS / SoftGroup
    unchanged-or-better — BENCH_NOTES round 3): units from the shifted grid
    (~33k active per scene) and 3cm xyz cells (~37k), capacities scaled by the
    number of scenes sharing the shard. Used by BOTH the inference and the
    train phases — round 4's train number ran the default (voxel, class)-unit
    config whose 65536-unit cap silently dropped most of a 4-scene batch.
    Capacity overflows surface in diag and invalidate the result."""
    return [
        # component capacity before size filtering: trained semantics still
        # misclassify ~1% of floor points, whose units form thousands of tiny
        # CC components; size-ordered compaction keeps the real clusters but
        # the bench must DROP NOTHING to report a number
        f"data.caps.clusters={_round_up(int(16384 * scenes_per_shard * unit_scale), 1024)}",
        # proposal axis scales with scene content: the 293k-point worst-case
        # scenes carry 24 objects x 2 clusterings and overflowed the default
        # 256-slot cap (big_scene proposals_dropped=100, round 5)
        f"data.caps.proposals={max(256, _round_up(int(256 * scenes_per_shard * unit_scale), 128))}",
        f"data.caps.proposal_rows="
        f"{max(524288, _round_up(int(524288 * scenes_per_shard * unit_scale), 8192))}",
        "data.caps.shifted_units=true",
        f"data.caps.cluster_units_shifted={_round_up(int(40960 * scenes_per_shard * unit_scale), 8192)}",
        "data.caps.cluster_cell_xyz=0.03",
        f"data.caps.cluster_units={_round_up(int(40960 * scenes_per_shard * unit_scale), 8192)}",
        # edge-buffer caps sized from measured candidate totals at these caps
        # (tools/probe_edge_total.py: xyz <=178k, shifted <=781k edges over 8
        # scenes; 1.5-1.8x margin, overflow degrades gracefully + surfaces in
        # diag/edges_dropped and the overflow probe)
    ]


def _measure_inference(load_config, base_overrides, env_overrides, spec,
                       scenes, pack, unit_scale: float = 1.0) -> dict:
    """Stage the scenes in HBM, auto-size caps, probe overflow, time >=3
    enqueue-all/sync-once passes. Returns value/runs/overflow/ckpt plus the
    cfg/net/variables/batches needed by the stage report."""
    from minsu3d_tpu.data.batching import collate, device_arrays, plan_spec, shard_caps
    from minsu3d_tpu.data.dataset import GeneralDataset
    from minsu3d_tpu.model import get_model

    cfg0 = load_config(base_overrides + env_overrides)
    n_scenes = len(scenes)
    ds = GeneralDataset(cfg0, "val", scenes=scenes)
    items = [ds[i] for i in range(len(ds))]

    max_pts = max(it["point_xyz"].shape[0] for it in items)
    max_inst = max(int(it["num_instance"]) for it in items)
    # eval_voxels must cover EVERY UNet level at its divisor (level-l cap =
    # eval_voxels / 2^l): real scan surfaces downsample slower than 2x per
    # level, so sizing from the level-0 count alone starved level 1 by ~1k
    # voxels (round 4 — the self-validation below stamps such runs invalid).
    # Count the actual per-level occupancy of every scene on the host.
    n_levels_cfg = len(cfg0.model.network.blocks)
    max_vox = 0
    for it in items:
        vc = np.asarray(it["voxel_coords"], np.int64)
        for lvl in range(n_levels_cfg):
            c = vc >> lvl
            key = (c[:, 0] << 22) | (c[:, 1] << 11) | c[:, 2]
            max_vox = max(max_vox, len(np.unique(key)) << lvl)
    cfg = load_config(base_overrides + [
        f"data.caps.eval_points={_round_up(max_pts * pack + 1024, 8192)}",
        f"data.caps.eval_voxels={_round_up(max_vox * pack + 1024, 8192)}",
        f"data.caps.eval_instances={max(64, max_inst * pack)}",
    ] + _cluster_prod_overrides(pack, unit_scale) + spec["cluster_overrides"]
        + env_overrides)
    caps = shard_caps(cfg, "val")

    bundle = get_model(spec["cls"])
    net = bundle.make_net(cfg, "val")
    f_flags = bundle.forward_flags(cfg, 999, False)  # all epoch gates open
    key = jax.random.PRNGKey(0)

    # grid plans ship with the batch when the native lib is built (177 ms/scene
    # on the host, fully hidden behind >1 s of device compute by the prefetch
    # pipeline); the device then skips its own plan-build stage
    plan = plan_spec(cfg, "val")
    batches = [device_arrays(collate(items[i:i + pack], caps, plan))
               for i in range(0, len(items), pack)]
    # stage batches in HBM up front: the metric is device compute throughput;
    # in production the input pipeline overlaps transfers with compute (and
    # this image reaches the TPU through a remote tunnel whose H2D bandwidth
    # is not representative of a co-located host)
    batches = jax.device_put(batches)
    jax.block_until_ready(batches)
    init = jax.jit(lambda k, b: net.init({"params": k, "cluster": k}, b, False, True,
                                         **f_flags))
    variables = init(key, batches[0])
    jax.block_until_ready(variables)

    # use a trained checkpoint when present: random-init semantics mark most
    # points foreground, overstating the clustering load vs real inference
    candidates = [os.environ.get("MINSU3D_BENCH_CKPT", "")] + spec["ckpts"]
    ckpt = next((c for c in candidates if c and os.path.isdir(c)), "")
    if ckpt:
        import orbax.checkpoint as ocp

        restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(ckpt))
        variables = {"params": restored["params"], "batch_stats": restored["batch_stats"]}
        print(f"# using trained checkpoint {ckpt}", file=sys.stderr)
    else:
        # random-init weights overstate the clustering load AND overflow the
        # golden-validated capacities — the number would be meaningless in
        # both directions (round-3 BENCH_r03 was polluted exactly this way)
        print("# ERROR no trained checkpoint found (looked at "
              f"{[c for c in candidates if c]}); the result below is stamped "
              "invalid — restore output/golden/ first", file=sys.stderr)

    @jax.jit
    def fwd(variables, batch):
        out = net.apply(variables, batch, False, True, **f_flags)
        return out["semantic_scores"], out["proposal_rows"]

    # capacity sanity: one forward returning the diag counters — a silently
    # overflowing edge buffer / unit cap degrades ACCURACY, not speed, so the
    # bench must not report a throughput won by dropping work (the SoftGroup
    # golden run lost 0.18 mAP to exactly this before the per-model factors)
    @jax.jit
    def fwd_diag(variables, batch):
        return net.apply(variables, batch, False, True, **f_flags).get("diag", {})

    overflow = {k: float(np.asarray(v).max()) for b in batches
                for k, v in fwd_diag(variables, b).items()
                if float(np.asarray(v).max()) > 0}
    if overflow:
        print(f"# WARNING capacity overflow at bench caps: {overflow}",
              file=sys.stderr)

    # warm-up (compile). The sync is a VALUE FETCH, not block_until_ready:
    # the axon tunnel's block_until_ready returns early on some programs
    # (CLAUDE.md harness note; a SoftGroup run once reported 247 scenes/s),
    # while fetching a scalar forces the full in-order queue to drain.
    # (the tiny slice program enqueues AFTER the forwards on the in-order
    # device queue, so its 4-byte fetch can't complete until they all have)
    sync = lambda out: np.asarray(out[0][0, :1])
    sync(fwd(variables, batches[0]))

    # timed: host voxelize+collate excluded (pipelined in production); all
    # forwards are enqueued back-to-back and synchronized once, so the device
    # pipeline covers plan build + UNet + clustering + refinement per batch.
    # REPEATS: round 4 recorded 2.753 at HEAD vs 2.125 from the driver under
    # identical config — time >=3 passes and report the MEDIAN as the
    # headline, with every pass recorded so two bench invocations can be
    # compared for agreement.
    reps = int(os.environ.get("MINSU3D_BENCH_REPS", "3"))
    runs = []
    for _ in range(max(reps, 1)):
        t0 = time.perf_counter()
        outs = [fwd(variables, b) for b in batches]
        sync(outs[-1])
        runs.append(n_scenes / (time.perf_counter() - t0))

    return {"value": float(np.median(runs)),
            "runs": [round(r, 3) for r in runs],
            "value_min": round(min(runs), 3),
            "overflow": overflow, "ckpt": ckpt, "cfg": cfg, "net": net,
            "variables": variables, "batches": batches, "f_flags": f_flags,
            "items": items, "caps": caps, "plan": plan, "fwd": fwd,
            "sync": sync, "bundle": bundle}


def _cost(compiled) -> dict:
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return {"flops": float(ca.get("flops", 0.0)),
                "bytes": float(ca.get("bytes accessed", 0.0))}
    except Exception:
        return {"flops": 0.0, "bytes": 0.0}


def main() -> None:
    # the host grid-plan builder must exist for the metric's production
    # configuration: without the .so, collate silently ships no plans and the
    # DEVICE rebuilds them every forward — that fallback alone was the round-4
    # 2.753-vs-2.125 discrepancy (plan stage: 105 ms of a 471 ms scene)
    from minsu3d_tpu.csrc.build import ensure_built

    ensure_built()

    from minsu3d_tpu.config import load_config
    from minsu3d_tpu.data.batching import collate, device_arrays, plan_spec, shard_caps
    from minsu3d_tpu.data.dataset import GeneralDataset
    from minsu3d_tpu.data.synthetic import make_scene
    from minsu3d_tpu.model import get_model

    n_scenes = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    # pack=1 default: clustering cost scales with the unit cap, which must
    # hold the whole pack, so packing does not amortize the dominant stage
    pack = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    model_name = (sys.argv[3] if len(sys.argv) > 3 else "pointgroup").lower()
    spec = MODELS[model_name]
    n_scenes = _round_up(n_scenes, pack)

    base_overrides = [f"model={model_name}", "data=scannetv2",
                      "model.trainer.precision=bfloat16",
                      # blocked halo-window subm conv: +3% end-to-end, exact
                      # (bit-identical f32; bf16 mIoU 4th decimal — windowed
                      # f32 sums reassociate; BENCH_NOTES round 3/4)
                      "model.network.blocked_subm=[2560,1536,768,256]"]
    # env overrides are appended LAST (after the computed caps below) so they
    # can override anything, including the cluster-unit capacities
    env_overrides = os.environ.get("MINSU3D_BENCH_OVERRIDES", "").split()
    scenes = [make_scene(seed=s, num_objects=12, points_per_object=6000,
                         floor_points=40000, room=8.0) for s in range(n_scenes)]
    m = _measure_inference(load_config, base_overrides, env_overrides, spec,
                           scenes, pack)
    scenes_per_sec = m["value"]
    cfg, net, variables, batches = m["cfg"], m["net"], m["variables"], m["batches"]
    items, caps, plan, fwd, sync = (m["items"], m["caps"], m["plan"], m["fwd"],
                                    m["sync"])
    bundle, overflow, ckpt = m["bundle"], m["overflow"], m["ckpt"]

    result = {
        "metric": f"{model_name}_scannetv2_inference_scenes_per_sec_per_chip",
        "value": round(scenes_per_sec, 3),
        "unit": "scenes/s",
        "vs_baseline": round(scenes_per_sec * spec["baseline_ms"] / 1000.0, 3),
        "timing": "device_compute",
        "runs": m["runs"],
        "value_min": m["value_min"],
    }
    # self-validation: a throughput won by dropping work (capacity overflow)
    # or measured on random-init weights is not the metric — stamp it invalid
    # so no downstream consumer can mistake it for a real number
    if overflow:
        result["overflow"] = overflow
        result["invalid"] = True
        result["invalid_reason"] = "capacity overflow at bench caps (accuracy-affecting)"
    if not ckpt:
        result["invalid"] = True
        result["invalid_reason"] = "no trained checkpoint: random-init weights"
    else:
        result["checkpoint"] = ckpt

    if os.environ.get("MINSU3D_BENCH_BIG", "1") != "0":
        # worst-case scene scale: the reference crops train scenes at 250k
        # points (config/data/base.yaml max_num_point) — report the headline
        # metric at that scale too (caps re-sized per the same auto-sizing;
        # unit capacities scale with the point count; round-4 verdict ask #7)
        try:
            big = [make_scene(seed=100 + s, num_objects=24,
                              points_per_object=6800, floor_points=87000,
                              room=11.0) for s in range(max(4, pack))]
            big_pts = max(s["xyz"].shape[0] for s in big)
            mb = _measure_inference(load_config, base_overrides, env_overrides,
                                    spec, big, pack,
                                    unit_scale=big_pts / 112000.0)
            result["big_scene_scenes_per_sec"] = round(mb["value"], 3)
            result["big_scene_points"] = int(big_pts)
            result["big_scene_runs"] = mb["runs"]
            if mb["overflow"]:
                result["big_scene_overflow"] = mb["overflow"]
        except Exception as e:  # noqa: BLE001 — the headline number stands
            import traceback

            traceback.print_exc()
            result["big_scene_error"] = f"{type(e).__name__}: {str(e)[:200]}"

    # a driver timeout (SIGTERM) during the optional slow phases below
    # (pipeline / stages / train, each a fresh compile through the remote
    # tunnel) must not discard the device numbers already measured above —
    # emit them stamped "partial" on the way out.
    # Limitation: Python delivers signals between bytecodes only, so a SIGTERM
    # arriving while blocked inside a C-level tunnel fetch (np.asarray) runs
    # the handler only once the fetch returns — a driver that escalates to
    # SIGKILL before then gets no partial line. Send SIGTERM with a generous
    # grace period.
    def _emit_partial(signum, frame):  # noqa: ARG001
        # re-entrancy guard: ignore further signals before printing, so a
        # second SIGTERM/SIGINT cannot interleave or double-emit the JSON
        signal.signal(signal.SIGTERM, signal.SIG_IGN)
        signal.signal(signal.SIGINT, signal.SIG_IGN)
        out = dict(result)
        out["partial"] = True
        out["partial_reason"] = f"killed by signal {signum} mid-run"
        print(json.dumps(out), flush=True)
        os._exit(128 + signum)

    signal.signal(signal.SIGTERM, _emit_partial)
    signal.signal(signal.SIGINT, _emit_partial)

    if os.environ.get("MINSU3D_BENCH_PIPELINE"):
        # steady-state with the host input pipeline in the loop: re-collate
        # every batch through the num_workers pool (voxelize is precomputed by
        # the dataset; collate + plan build + H2D transfer are measured)
        from minsu3d_tpu.data.datamodule import _pool_iter

        def make(i):
            return device_arrays(collate(items[i * pack:(i + 1) * pack], caps, plan))

        workers = int(cfg.data.get("num_workers", 1))
        list(_pool_iter(make, 1, workers, 2))  # warm the pool path
        t0 = time.perf_counter()
        outs = [fwd(variables, b) for b in _pool_iter(make, len(batches), workers, 2)]
        sync(outs[-1])  # value fetch: block_until_ready can return early here
        dt_pipe = time.perf_counter() - t0
        result["pipeline_scenes_per_sec"] = round(n_scenes / dt_pipe, 3)
        # this image reaches the TPU through a remote tunnel: every batch's
        # H2D transfer pays a WAN roundtrip a co-located host would not, so
        # the steady-state pipeline number is a LOWER bound here
        result["pipeline_note"] = "includes remote-tunnel H2D per batch"

    if os.environ.get("MINSU3D_BENCH_STAGES"):
        try:
            _stage_report(cfg, net, variables, batches, pack,
                          n_scenes / scenes_per_sec / len(batches), model_name)
        except Exception:  # noqa: BLE001 — report is stderr-only, keep the JSON
            import traceback

            traceback.print_exc()

    # train runs LAST: an HBM exhaustion here (full train step at train caps)
    # can wedge the chip's allocator for the rest of the process, so nothing
    # may run after it — and its failure must not discard the inference
    # numbers already measured above. ON by default (round-4 verdict asks the
    # driver-captured BENCH_r{N} to carry the training number); set
    # MINSU3D_BENCH_TRAIN=0 to skip.
    if os.environ.get("MINSU3D_BENCH_TRAIN", "1") != "0":
        try:
            tps, textra = _train_throughput(
                load_config, base_overrides + spec["cluster_overrides"],
                scenes, bundle, env_overrides,
                golden_vars=variables if ckpt else None)
            result["train_scenes_per_sec"] = tps
            result.update(textra)
        except Exception as e:  # noqa: BLE001
            import traceback

            traceback.print_exc()
            result["train_error"] = f"{type(e).__name__}: {str(e)[:200]}"
    signal.signal(signal.SIGTERM, signal.SIG_DFL)
    signal.signal(signal.SIGINT, signal.default_int_handler)
    print(json.dumps(result))


def _train_throughput(load_config, overrides, scenes, bundle,
                      env_overrides=(), golden_vars=None) -> tuple[float, dict]:
    """Device-compute training scenes/s: full train step (forward + losses +
    grads + Adam update) at the config's train caps and batch size, batches
    pre-staged in HBM. Returns (scenes/s, extra fields: per-pass list +
    overflow counters — a train number won by dropping units is stamped like
    the inference one). Baseline anchor: the reference trains PointGroup in
    28 h / 450 epochs / 1201 scenes on an RTX 2080 Ti ~= 5.4 scenes/s
    (reference README.md:206).

    Two phases are measured, mirroring the reference schedule the anchor
    averages over (prepare_epochs of backbone-only training, then full steps
    with clustering + refinement heads — reference general_model.py epoch
    gate; PG config prepare_epochs: 128 of 450):
      * train_scenes_per_sec — the STEADY-STATE full step (headline; every
        epoch gate open, with_heads=True);
      * train_prepare_scenes_per_sec — the prepare-phase step;
      * train_450ep_scenes_per_sec — the schedule-weighted average, the
        apples-to-apples number against the reference's 28 h / 450 ep anchor.

    ``golden_vars``: trained params/batch_stats from the inference phase.
    Random-init weights mark most points foreground in random classes, which
    OVERFLOWS the golden-validated unit capacities (544k units dropped at
    round-5 bench caps) and stamps the run invalid — while real training
    spends all post-prepare epochs with usable semantics/offsets. Static
    shapes make the step time load-independent up to CC's data-dependent
    while_loop sweep count, which trained weights keep realistic."""
    import optax
    from minsu3d_tpu.data.batching import collate, device_arrays, plan_spec, shard_caps
    from minsu3d_tpu.data.dataset import GeneralDataset
    from minsu3d_tpu.model.caps import StaticCaps

    # remat="conv": conv-granularity rematerialisation — blocked subm convs
    # take the hand-written gather-form VJP (saves (x, W) instead of the
    # (27V, Cin) gathered tables; backward is gathers, not scan-transpose
    # scatters), other convs jax.checkpoint. vs block-level remat=true this
    # measured prepare 1.148 -> 1.978 scenes/s and steady 0.904 -> 1.204 on
    # the round-5 chip, and cuts bs=4 PointGroup temps 13.5G -> 6.1G
    # (tools/probe_train_mem.py; numerically identical, tests/test_remat.py)
    overrides = list(overrides) + ["model.network.remat=conv"]
    # env overrides participate in cfg0 too so MINSU3D_BENCH_OVERRIDES can
    # steer train-only knobs that shape the setup itself (data.batch_size,
    # model.network.remat=<int|false>) — they are ALSO appended last to the
    # final cfg below, so they override the computed caps as everywhere else
    cfg0 = load_config(overrides + list(env_overrides))
    ds = GeneralDataset(cfg0, "train", scenes=scenes)
    bs = int(cfg0.data.batch_size)
    items = [ds[i] for i in range(len(ds))]
    if len(items) < bs:  # fewer bench scenes than one train batch: tile them
        items = (items * bs)[:bs]
    # size train caps from the ACTUAL augmented batches (same per-level voxel
    # rule as main(): level-l caps are voxels/2^l, surfaces downsample <2x)
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
    ] + _cluster_prod_overrides(bs) + list(env_overrides))
    caps = shard_caps(cfg, "train")
    plan = plan_spec(cfg, "train")
    n_batches = len(range(0, len(items) - bs + 1, bs))
    # stage ONE batch and reuse it every step: the HAIS/SoftGroup step's
    # compiled temps alone are ~13.5G of the chip's 15.7G HBM
    # (tools/probe_train_mem.py), so a second staged batch tips it over —
    # and the step's device cost does not depend on the input values
    batch0 = jax.device_put(device_arrays(collate(items[:bs], caps, plan)))
    jax.block_until_ready(batch0)

    net = bundle.make_net(cfg, "train")
    scaps = StaticCaps.from_cfg(cfg, "train")
    key = jax.random.PRNGKey(0)
    init_vars = jax.jit(lambda k, b: net.init(
        {"params": k, "cluster": k}, b, True, True,
        **bundle.forward_flags(cfg, 999, True)))(key, batch0)
    params0 = init_vars["params"]
    stats0 = init_vars.get("batch_stats", {})
    if golden_vars is not None:
        # same model family/width — the param tree matches the val-split net's
        import jax.tree_util as jtu

        if (jtu.tree_structure(golden_vars["params"])
                == jtu.tree_structure(params0)):
            params0 = golden_vars["params"]
            stats0 = golden_vars.get("batch_stats", stats0)
        else:
            print("# WARNING golden params tree mismatch; train bench runs "
                  "random-init weights", file=sys.stderr)
            golden_vars = None
    params_host = jax.device_get(params0)   # re-stage per phase: steps donate
    stats_host = jax.device_get(stats0)
    del init_vars, params0, stats0
    tx = optax.adam(float(cfg.model.optimizer.lr))
    reps = int(os.environ.get("MINSU3D_BENCH_REPS", "3"))

    def measure(epoch: int, with_heads: bool):
        ff = bundle.forward_flags(cfg, epoch, True)
        lf = bundle.loss_flags(cfg, epoch)

        def loss_fn(params, batch_stats, batch, rng):
            out, mut = net.apply({"params": params, "batch_stats": batch_stats},
                                 batch, True, with_heads, **ff,
                                 rngs={"cluster": rng}, mutable=["batch_stats"])
            losses = bundle.losses(cfg, scaps, batch, out, with_heads, **lf)
            return sum(losses.values()), (mut["batch_stats"], out.get("diag", {}))

        # donate params/batch_stats/opt_state: outputs alias arguments, saving
        # the ~0.5G of double-buffered state the tight HAIS/SoftGroup step needs
        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def step(params, batch_stats, opt_state, batch, rng):
            (_, (new_stats, diag)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats, batch, rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_stats, opt_state, diag

        # sync by VALUE FETCH of one param scalar — the axon tunnel's
        # block_until_ready returns early on some programs (see main())
        sync = lambda st: np.asarray(
            jax.tree_util.tree_leaves(st[0])[0].ravel()[:1])
        params = jax.device_put(params_host)
        state = (params, jax.device_put(stats_host), tx.init(params))
        *state, diag = step(*state, batch0, key)  # compile + warm
        sync(state)
        # overflow check, same policy as inference: a training throughput won
        # by dropping units/edges/clusters is not the metric (round-4 train ran
        # the default unit config whose cap dropped most of the 4-scene batch)
        overflow = {f"train_{k}": float(np.asarray(v).max())
                    for k, v in diag.items() if float(np.asarray(v).max()) > 0}
        runs = []
        for _ in range(max(reps, 1)):
            t0 = time.perf_counter()
            for i in range(n_batches):
                *state, diag = step(*state, batch0, jax.random.fold_in(key, i))
            sync(state)
            runs.append(n_batches * bs / (time.perf_counter() - t0))
        del state
        return float(np.median(runs)), [round(r, 3) for r in runs], overflow

    prep_ep = int(cfg.model.network.prepare_epochs)
    total_ep = int(cfg.model.trainer.max_epochs)
    extra = {}
    # MINSU3D_BENCH_TRAIN_EPOCH pins ONE phase (epoch's gate state) for
    # focused measurement; default measures prepare AND steady state
    pin = os.environ.get("MINSU3D_BENCH_TRAIN_EPOCH", "")
    if pin:
        e = int(pin)
        tps, runs, overflow = measure(e, e > prep_ep)
        extra["train_runs"] = runs
        extra["train_epoch_gates"] = e
    else:
        # prepare phase FIRST: its step is a subset program (backbone +
        # semantic/offset losses), so an HBM exhaustion in the bigger steady
        # step can't shadow the prepare number
        p_tps, p_runs, p_overflow = measure(0, False)
        extra["train_prepare_scenes_per_sec"] = round(p_tps, 3)
        extra["train_prepare_runs"] = p_runs
        tps, runs, overflow = measure(999, True)
        extra["train_runs"] = runs
        extra["train_epoch_gates"] = 999
        overflow.update({f"prepare_{k}": v for k, v in p_overflow.items()})
        # schedule-weighted average over the reference's training plan
        # (prepare_epochs backbone-only epochs, then full steps; reference
        # config/model/pointgroup.yaml:14,40 — 496 epochs, 128 prepare): the
        # apples-to-apples number against the 28 h wall-clock anchor
        sched = total_ep / (prep_ep / p_tps + (total_ep - prep_ep) / tps)
        extra["train_sched_scenes_per_sec"] = round(sched, 3)
        extra["train_sched_epochs"] = [prep_ep, total_ep]
        # reference PointGroup trains 28 h / 450+ epochs / 1201 scenes on an
        # RTX 2080 Ti ~= 5.4 scenes/s schedule average (README.md:206)
        extra["train_vs_baseline"] = round(sched / 5.4, 3)
    if golden_vars is None:
        extra["invalid"] = True
        extra["invalid_reason"] = ("train bench ran random-init weights "
                                   "(no/mismatched golden checkpoint)")
    if overflow:
        extra["train_overflow"] = overflow
        extra["invalid"] = True
        extra["invalid_reason"] = "train capacity overflow (accuracy-affecting)"
    return round(tps, 3), extra


def _stage_report(cfg, net, variables, batches, pack, full_per_batch,
                  model_name="pointgroup"):
    """Per-stage timing + XLA cost analysis -> roofline utilization.

    PointGroup gets the detailed cluster stage (its dual clustering is
    re-runnable outside the net); HAIS/SoftGroup cluster inside their model
    forward, so their tables report plan / backbone / heads_rest with
    heads_rest = full - backbone covering clustering + refinement."""
    from minsu3d_tpu.model import general_model as gm
    from minsu3d_tpu.model.caps import StaticCaps

    scaps = StaticCaps.from_cfg(cfg, "val")
    n_levels = len(cfg.model.network.blocks)
    ignore = tuple(cfg.data.ignore_classes)

    def plan_fn(batch):
        return gm.build_scene_plan(batch, list(scaps.voxel_caps), n_levels)

    def backbone_fn(variables, batch):
        out = net.apply(variables, batch, False, False)
        return out["semantic_scores"], out["point_offsets"]

    timed = [("plan", plan_fn, None), ("backbone+plan", backbone_fn, None)]
    stages = {}
    b0 = batches[0]
    bb = jax.jit(backbone_fn)
    sem, off = jax.block_until_ready(bb(variables, b0))

    if model_name == "pointgroup":
        from minsu3d_tpu.model.pointgroup import foreground_mask, merge_clusterings

        radius = cfg.model.network.cluster.cluster_radius
        npoint_thre = cfg.model.network.cluster.cluster_npoint_thre

        def cluster_fn(batch, sem_scores, offsets):
            sem_preds = jnp.argmax(sem_scores, axis=1).astype(jnp.int32)
            obj = foreground_mask(sem_preds, batch["point_mask"], ignore)
            xyz = batch["point_xyz"]
            bids = batch["vert_batch_ids"]
            units, _ = gm.make_units(batch["p2v"], sem_preds, obj, scaps.cluster_units)
            clus = gm.cluster_step(xyz, bids, obj, sem_preds, radius, scaps, units)
            clus_shift = gm.cluster_step(xyz + offsets, bids, obj, sem_preds,
                                         radius, scaps, units)
            return merge_clusterings([clus, clus_shift], [npoint_thre] * 2,
                                     xyz.shape[0], scaps.proposals)[0]

        timed.append(("cluster", cluster_fn, (b0, sem, off)))

    for name, fn, args in timed:
        if args is None:
            args = (b0,) if name == "plan" else (variables, b0)
        compiled = jax.jit(fn).lower(*args).compile()  # for cost analysis
        # time a SCALARIZED twin and sync by 4-byte VALUE FETCH
        # (block_until_ready can return early on the axon tunnel); subtract
        # the measured fetch roundtrip. The sum must cover EVERY output leaf:
        # summing only the first let XLA dead-code-eliminate the rest of the
        # stage (plan/cluster once timed as 0.0000 with absurd rooflines).
        f_sum = jax.jit(lambda *a: sum(
            jnp.sum(leaf.astype(jnp.float32))
            for leaf in jax.tree_util.tree_leaves(fn(*a))))
        _ = np.asarray(f_sum(*args))  # compile + warm
        tiny = jax.jit(lambda x: x + 1)
        _ = np.asarray(tiny(jnp.zeros(1)))
        t0 = time.perf_counter()
        for _ in range(4):
            _ = np.asarray(tiny(jnp.zeros(1)))
        rt = (time.perf_counter() - t0) / 4
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            _ = np.asarray(f_sum(*args))
        t = max((time.perf_counter() - t0) / reps - rt, 1e-6)
        stages[name] = {"time_s": t, **_cost(compiled)}

    stages["plan"]["note"] = "grid-plan build (sorts + kernel maps)"
    t_plan = stages["plan"]["time_s"]
    t_bb = stages["backbone+plan"]["time_s"]
    t_cl = stages.get("cluster", {}).get("time_s", 0.0)
    stages["backbone_only"] = {"time_s": max(t_bb - t_plan, 0.0),
                               "flops": stages["backbone+plan"]["flops"] - stages["plan"]["flops"],
                               "bytes": stages["backbone+plan"]["bytes"] - stages["plan"]["bytes"]}
    stages["heads_rest"] = {"time_s": max(full_per_batch - t_bb - t_cl, 0.0),
                            "flops": 0.0, "bytes": 0.0,
                            "note": ("proposal voxelization + ScoreNet + output copy "
                                     "(full - backbone - cluster)" if "cluster" in stages
                                     else "clustering + refinement heads (full - backbone)")}
    stages["full_forward"] = {"time_s": full_per_batch, "flops": 0.0, "bytes": 0.0}

    hdr = f"{'stage':<16}{'s/batch':>9}{'s/scene':>9}{'TFLOP/s':>9}{'%MXU':>6}{'GB/s':>8}{'%HBM':>6}"
    print("# " + hdr, file=sys.stderr)
    for name, s in stages.items():
        t = s["time_s"]
        fl = s.get("flops", 0.0)
        by = s.get("bytes", 0.0)
        tf = fl / t / 1e12 if t > 0 else 0.0
        gbs = by / t / 1e9 if t > 0 else 0.0
        print(f"# {name:<16}{t:>9.4f}{t / pack:>9.4f}{tf:>9.2f}"
              f"{100 * tf * 1e12 / PEAK_BF16_FLOPS:>6.1f}{gbs:>8.1f}"
              f"{100 * gbs * 1e9 / PEAK_HBM_BPS:>6.1f}", file=sys.stderr)
    os.makedirs("output", exist_ok=True)
    suffix = "" if model_name == "pointgroup" else f"_{model_name}"
    with open(f"output/bench_stages{suffix}.json", "w") as f:
        json.dump({"pack": pack, "stages": stages}, f, indent=1)


if __name__ == "__main__":
    main()

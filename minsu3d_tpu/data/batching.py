"""Padded batch assembly — the TPU replacement for the reference's ragged
sparse collate (minsu3d/data/data_module.py:42-98).

Where the reference concatenates variable-length scenes and lets
MinkowskiEngine deal with dynamic shapes, XLA needs static shapes: a shard
batch concatenates ``batch_size`` scenes into fixed-capacity arrays with
validity masks. Instance ids are re-based across scenes and point->voxel maps
offset exactly as in the reference collate (:65-66, :70-73).
"""

from __future__ import annotations

from typing import Any

import numpy as np


def shard_caps(cfg, split: str) -> dict[str, int]:
    caps = cfg.data.caps
    if split == "train":
        return {"points": caps.points, "voxels": caps.voxels, "instances": caps.instances}
    return {"points": caps.eval_points, "voxels": caps.eval_voxels, "instances": caps.eval_instances}


def plan_spec(cfg, split: str):
    """(level caps, num levels) for host-side plan building, or None when the
    native library is unavailable or ``data.host_plan`` is off."""
    if not cfg.data.get("host_plan", True):
        return None
    from minsu3d_tpu.csrc import native

    if not native.available():
        return None
    from minsu3d_tpu.model.general_model import backbone_caps

    return backbone_caps(cfg, split), len(cfg.model.network.blocks)


def collate(batch: list[dict[str, Any]], caps: dict[str, int],
            plan: tuple | None = None) -> dict[str, Any]:
    """Pack a list of per-scene dicts into one fixed-shape shard batch.

    ``plan=(level_caps, num_levels)`` additionally builds the UNet grid plan
    on the host (csrc/native.py::build_plan_host) and ships it with the batch
    — the TPU then skips the device-side sort pipeline (general_model.py::
    build_scene_plan). Runs inside the prefetch worker, overlapped with
    device compute."""
    P, V, I = caps["points"], caps["voxels"], caps["instances"]
    n_feat = batch[0]["voxel_feats"].shape[1]

    out = {
        "scan_ids": [b["scan_id"] for b in batch],
        "point_xyz": np.zeros((P, 3), np.float32),
        "vert_batch_ids": np.full(P, -1, np.int32),
        "point_mask": np.zeros(P, bool),
        "sem_labels": np.full(P, -1, np.int32),
        "instance_ids": np.full(P, -1, np.int32),
        "instance_center_xyz": np.zeros((P, 3), np.float32),
        "instance_num_point": np.zeros(I, np.int32),
        "instance_semantic_cls": np.full(I, -1, np.int32),
        "instance_mask": np.zeros(I, bool),
        "num_instance": np.int32(0),
        "voxel_coords": np.zeros((V, 3), np.int32),
        "voxel_batch": np.zeros(V, np.int32),
        "voxel_feats": np.zeros((V, n_feat), np.float32),
        "voxel_mask": np.zeros(V, bool),
        "p2v": np.full(P, V, np.int32),
        "num_points": np.int32(0),
        "num_voxels": np.int32(0),
    }

    p0 = v0 = i0 = 0
    for i, b in enumerate(batch):
        n = b["point_xyz"].shape[0]
        v = b["voxel_coords"].shape[0]
        k = int(b["num_instance"])
        if p0 + n > P or v0 + v > V or i0 + k > I:
            raise ValueError(
                f"Batch overflows caps (points {p0 + n}/{P}, voxels {v0 + v}/{V}, "
                f"instances {i0 + k}/{I}); raise data.caps.*")
        ps, vs, isl = slice(p0, p0 + n), slice(v0, v0 + v), slice(i0, i0 + k)
        out["point_xyz"][ps] = b["point_xyz"]
        out["vert_batch_ids"][ps] = i
        out["point_mask"][ps] = True
        out["sem_labels"][ps] = b["sem_labels"]
        inst = b["instance_ids"].copy()
        inst[inst != -1] += i0  # re-base instance ids across scenes (ref :70-73)
        out["instance_ids"][ps] = inst
        out["instance_center_xyz"][ps] = b["instance_center_xyz"]
        out["instance_num_point"][isl] = b["instance_num_point"]
        out["instance_semantic_cls"][isl] = b["instance_semantic_cls"]
        out["instance_mask"][isl] = True
        out["voxel_coords"][vs] = b["voxel_coords"]
        out["voxel_batch"][vs] = i
        out["voxel_feats"][vs] = b["voxel_feats"]
        out["voxel_mask"][vs] = True
        out["p2v"][ps] = b["p2v"] + v0  # offset voxel maps (ref :65-66)
        p0 += n
        v0 += v
        i0 += k

    out["num_instance"] = np.int32(i0)
    out["num_points"] = np.int32(p0)
    out["num_voxels"] = np.int32(v0)
    if plan is not None:
        from minsu3d_tpu.csrc import native

        built = native.build_plan_host(out["voxel_batch"], out["voxel_coords"],
                                       out["voxel_mask"], plan[0], plan[1])
        if built is not None:
            out.update(built)
    return out


def device_arrays(batch: dict[str, Any]) -> dict[str, Any]:
    """Split the host batch into (device arrays, host-side metadata)."""
    return {k: v for k, v in batch.items() if k != "scan_ids"}

"""Datasets: load preprocessed scenes, augment, voxelize.

Mirrors reference minsu3d/data/dataset/general_dataset.py:10-165 semantics
(augment -> elastic -> crop -> instance info -> feature assembly -> voxelize),
re-implemented torch-free on NumPy. Scene files are the reference's ``.pth``
dicts (read via torch.load when torch is present) or ``.npz`` equivalents.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

from minsu3d_tpu.data import transform
from minsu3d_tpu.data.voxelize import sparse_quantize


def load_scene_file(path: str) -> dict[str, np.ndarray]:
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch  # CPU torch, used only as an unpickler for the reference format

    data = torch.load(path, map_location="cpu", weights_only=False)
    return {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v)) for k, v in data.items()}


class GeneralDataset:
    """Reference GeneralDataset equivalent (general_dataset.py:10-165)."""

    def __init__(self, cfg, split: str, scenes: list[dict] | None = None,
                 scene_names: list[str] | None = None):
        self.cfg = cfg
        self.split = split
        self.max_num_point = cfg.data.max_num_point
        if scenes is not None:  # injected scenes (tests / synthetic benchmarks)
            self.scenes = [self._normalize(dict(s)) for s in scenes]
            self.scene_names = scene_names or [f"scene{i:04d}" for i in range(len(scenes))]
        else:
            self._load_from_disk()

    def _normalize(self, scene: dict) -> dict:
        scene["xyz"] = scene["xyz"] - scene["xyz"].mean(axis=0)
        scene["rgb"] = scene["rgb"].astype(np.float32) / 127.5 - 1
        return scene

    def _load_from_disk(self):
        with open(getattr(self.cfg.data.metadata, f"{self.split}_list")) as f:
            self.scene_names = [line.strip() for line in f]
        self.scenes = []
        for scene_name in self.scene_names:
            base = os.path.join(self.cfg.data.dataset_path, self.split, scene_name)
            path = base + (".npz" if os.path.exists(base + ".npz") else ".pth")
            self.scenes.append(self._normalize(load_scene_file(path)))

    def __len__(self) -> int:
        return len(self.scenes)

    def _augmentation_matrix(self, rng: np.random.Generator) -> np.ndarray:
        aug = self.cfg.data.augmentation
        m = np.eye(3)
        if aug.jitter_xyz:
            m = m @ transform.jitter_mat(rng)
        if aug.flip:
            m *= transform.flip_mat(rng, 0, random=True)
        if aug.rotation:
            m = m @ transform.rotz_mat(rng.random() * 2 * np.pi)
        return m.astype(np.float32)

    @staticmethod
    def _compact_instance_ids(instance_ids: np.ndarray) -> np.ndarray:
        """Re-number instance ids to be consecutive after cropping
        (semantics of general_dataset.py:44-54)."""
        out = instance_ids.copy()
        j = 0
        while j < out.max(initial=-1):
            if np.count_nonzero(out == j) == 0:
                out[out == out.max()] = j
            j += 1
        return out

    def _instance_info(self, xyz, instance_ids, sem_labels):
        """Centers / sizes / classes per instance (general_dataset.py:56-78)."""
        unique_ids = np.unique(instance_ids)
        unique_ids = unique_ids[unique_ids != -1]
        num_instance = len(unique_ids)
        center = np.zeros((xyz.shape[0], 3), np.float32)
        num_point = []
        cls = np.full(num_instance, -1, np.int32)
        shift = len(self.cfg.data.ignore_classes)
        for index, i in enumerate(unique_ids):
            idx = np.nonzero(instance_ids == i)[0]
            center[idx] = xyz[idx].mean(0)
            num_point.append(idx.size)
            sl = sem_labels[idx[0]]
            cls[index] = sl - shift if sl != -1 else sl
        return num_instance, center, np.array(num_point, np.int32), cls

    def __getitem__(self, idx: int) -> dict[str, Any]:
        rng = np.random.default_rng()
        scene = self.scenes[idx]
        xyz = scene["xyz"].astype(np.float32)
        colors = scene["rgb"].astype(np.float32)
        normals = scene["normal"].astype(np.float32)
        instance_ids = scene["instance_ids"].astype(np.int32)
        sem_labels = scene["sem_labels"].astype(np.int32)

        if self.split == "train":
            m = self._augmentation_matrix(rng)
            xyz = xyz @ m
            normals = normals @ np.linalg.inv(m).T.astype(np.float32)
            if self.cfg.data.augmentation.jitter_rgb:
                colors = colors + rng.standard_normal(3).astype(np.float32) * 0.1

        scale = 1 / self.cfg.data.voxel_size
        if self.split == "train" and self.cfg.data.augmentation.elastic:
            xyz_q = transform.elastic(xyz * scale, 6 * scale // 50, 40 * scale / 50, rng)
            xyz_q = transform.elastic(xyz_q, 20 * scale // 50, 160 * scale / 50, rng)
        else:
            xyz_q = xyz * scale
        xyz_q = xyz_q - xyz_q.min(axis=0)

        if self.split == "train" and xyz.shape[0] > self.max_num_point:
            for _ in range(20):
                xyz_tmp, valid = transform.crop(
                    xyz_q, self.max_num_point, self.cfg.data.full_scale[1], rng)
                count = np.count_nonzero(valid)
                if count >= self.max_num_point // 2 and np.any(sem_labels[valid] != -1) \
                        and np.any(instance_ids[valid] != -1):
                    xyz_q = xyz_tmp
                    break
            else:
                raise RuntimeError("Over-cropped scene (20 crop attempts failed)")
            xyz_q = xyz_q[valid]
            xyz = xyz[valid]
            normals = normals[valid]
            colors = colors[valid]
            sem_labels = sem_labels[valid]
            instance_ids = self._compact_instance_ids(instance_ids[valid])

        xyz_q = xyz_q * self.cfg.data.voxel_size

        num_instance, center, inst_npoint, inst_cls = self._instance_info(
            xyz, instance_ids, sem_labels)

        feats = [np.zeros((len(xyz), 0), np.float32)]
        if self.cfg.model.network.use_color:
            feats.append(colors)
        if self.cfg.model.network.use_normal:
            feats.append(normals)
        feats.append(xyz)
        point_features = np.concatenate(feats, axis=1)

        voxel_coords, voxel_feats, p2v = sparse_quantize(
            xyz_q, point_features, self.cfg.data.voxel_size)

        return {
            "scan_id": self.scene_names[idx],
            "point_xyz": xyz,
            "sem_labels": sem_labels,
            "instance_ids": instance_ids,
            "num_instance": num_instance,
            "instance_center_xyz": center,
            "instance_num_point": inst_npoint,
            "instance_semantic_cls": inst_cls,
            "voxel_coords": voxel_coords,
            "voxel_feats": voxel_feats,
            "p2v": p2v,
        }


class Synthetic(GeneralDataset):
    """Procedural scenes generated in memory (data=synthetic) — smoke runs,
    benchmarks, and CI without a dataset on disk."""

    def _load_from_disk(self):
        from minsu3d_tpu.data.synthetic import make_scene

        s = self.cfg.data.synthetic
        counts = {"train": s.train_scenes, "val": s.val_scenes, "test": s.test_scenes}
        base = {"train": 0, "val": 10_000, "test": 20_000}[self.split]
        n = counts[self.split]
        self.scene_names = [f"synth_{self.split}{i:04d}" for i in range(n)]
        self.scenes = [
            self._normalize(make_scene(
                seed=s.seed + base + i, num_objects=s.num_objects,
                points_per_object=s.points_per_object, floor_points=s.floor_points))
            for i in range(n)
        ]


class ScanNetv2(GeneralDataset):
    """reference minsu3d/data/dataset/scannetv2.py:4-7"""


class MultiScanObj(GeneralDataset):
    """reference minsu3d/data/dataset/multiscan_obj.py"""


class MultiScanPart(GeneralDataset):
    """reference minsu3d/data/dataset/multiscan_part.py"""


DATASETS = {"ScanNetv2": ScanNetv2, "MultiScanObj": MultiScanObj,
            "MultiScanPart": MultiScanPart, "Synthetic": Synthetic}

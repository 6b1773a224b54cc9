"""Synthetic indoor-scene generator (test/bench fixture).

Produces scenes in the reference's preprocessed ``.pth`` dict schema
(data/scannetv2/preprocess_all_data.py:120-121): xyz/rgb/normal/sem_labels/
instance_ids. Rooms have a floor, walls, and N objects (boxes/ellipsoids) of
random foreground classes — enough geometric structure for clustering and
AP evaluation to be meaningful without ScanNet on disk.
"""

from __future__ import annotations

import numpy as np


def _surface_points(rng, n, extent, origin, normal_axis, normal_sign):
    pts = origin + rng.random((n, 3)).astype(np.float32) * extent
    nrm = np.zeros((n, 3), np.float32)
    nrm[:, normal_axis] = normal_sign
    return pts, nrm


def _box_object(rng, n, center, size):
    """Points on the surface of a box."""
    face = rng.integers(0, 6, n)
    u = rng.random((n, 3)).astype(np.float32) - 0.5
    pts = u * size
    nrm = np.zeros((n, 3), np.float32)
    for axis in range(3):
        for sign_i, sign in enumerate((-1, 1)):
            m = face == axis * 2 + sign_i
            pts[m, axis] = sign * size[axis] / 2
            nrm[m, axis] = sign
    return center + pts, nrm


def make_scene(seed: int = 0, num_objects: int = 8, points_per_object: int = 3000,
               floor_points: int = 20000, room: float = 6.0, num_classes: int = 20,
               num_ignore: int = 2) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    xyz_l, nrm_l, sem_l, inst_l = [], [], [], []

    # floor (class 0) and two walls (class 1) — the "ignored" classes in ScanNet
    f_xyz, f_nrm = _surface_points(rng, floor_points, np.array([room, room, 0.01]),
                                   np.zeros(3), 2, 1.0)
    xyz_l.append(f_xyz); nrm_l.append(f_nrm)
    sem_l.append(np.zeros(floor_points, np.int32))
    inst_l.append(np.full(floor_points, -1, np.int32))

    w_n = floor_points // 2
    w_xyz, w_nrm = _surface_points(rng, w_n, np.array([room, 0.01, 2.5]), np.zeros(3), 1, 1.0)
    xyz_l.append(w_xyz); nrm_l.append(w_nrm)
    sem_l.append(np.ones(w_n, np.int32))
    inst_l.append(np.full(w_n, -1, np.int32))

    for k in range(num_objects):
        size = rng.uniform(0.3, 1.2, 3).astype(np.float32)
        center = np.array([rng.uniform(1, room - 1), rng.uniform(1, room - 1),
                           size[2] / 2 + 0.01], np.float32)
        o_xyz, o_nrm = _box_object(rng, points_per_object, center, size)
        cls = int(rng.integers(num_ignore, num_classes))
        xyz_l.append(o_xyz); nrm_l.append(o_nrm)
        sem_l.append(np.full(points_per_object, cls, np.int32))
        inst_l.append(np.full(points_per_object, k, np.int32))

    xyz = np.concatenate(xyz_l).astype(np.float32)
    xyz += rng.normal(0, 0.003, xyz.shape).astype(np.float32)  # sensor noise
    sem = np.concatenate(sem_l).astype(np.int16)
    rgb = np.zeros((len(xyz), 3), np.uint8)
    rgb[:, 0] = (sem * 12 + 40) % 255
    rgb[:, 1] = (sem * 37 + 90) % 255
    rgb[:, 2] = (sem * 71 + 140) % 255

    return {
        "xyz": xyz,
        "rgb": rgb,
        "normal": np.concatenate(nrm_l).astype(np.float32),
        "sem_labels": sem,
        "instance_ids": np.concatenate(inst_l).astype(np.int16),
    }

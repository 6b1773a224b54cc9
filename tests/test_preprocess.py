"""Preprocess pipeline test: write a tiny binary ScanNet-style scene (PLY
mesh + segs/aggregation JSONs), run ``process_one_scan``, and check the output
schema, label/instance semantics, and normals against independent oracles
(reference producer: data/scannetv2/preprocess_all_data.py:90-121)."""

import json
import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from data.scannetv2.preprocess_all_data import (  # noqa: E402
    compute_vertex_normals, get_semantic_mapping_file, process_one_scan,
    read_ply_mesh)
from minsu3d_tpu.config import load_config  # noqa: E402


def write_binary_ply(path, xyz, rgb, faces):
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {len(xyz)}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(b"property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write(b"property uchar alpha\n")
        f.write(f"element face {len(faces)}\n".encode())
        f.write(b"property list uchar int vertex_indices\nend_header\n")
        for p, c in zip(xyz, rgb):
            f.write(struct.pack("<fffBBBB", *p, *c, 255))
        for face in faces:
            f.write(struct.pack("<Biii", 3, *face))


def write_ascii_ply(path, xyz, rgb, faces):
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(xyz)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for p, c in zip(xyz, rgb):
            f.write(f"{p[0]} {p[1]} {p[2]} {c[0]} {c[1]} {c[2]}\n")
        for face in faces:
            f.write(f"3 {face[0]} {face[1]} {face[2]}\n")


def quad(origin, du, dv, base):
    """4 verts + 2 triangles spanning origin, origin+du, origin+dv."""
    o = np.asarray(origin, np.float32)
    verts = np.stack([o, o + du, o + dv, o + du + dv])
    faces = np.array([[base, base + 1, base + 2], [base + 1, base + 3, base + 2]])
    return verts, faces


def build_scene():
    """floor (ignored class) + 2 chairs + 1 unknown-label object."""
    parts, faces, seg_of_vert, groups = [], [], [], []
    base, seg = 0, 0
    for label, origin, du, dv in [
        ("floor", (0, 0, 0), (4.0, 0, 0), (0, 4.0, 0)),
        ("chair", (1, 1, 0), (0.5, 0, 0), (0, 0, 0.9)),
        ("chair", (3, 3, 0), (0.4, 0, 0.2), (0, 0.4, 1.1)),
        ("doodad", (2, 2, 1), (0.3, 0, 0), (0, 0.3, 0.1)),
    ]:
        v, fc = quad(origin, du, dv, base)
        parts.append(v)
        faces.append(fc)
        seg_of_vert += [seg] * 4
        groups.append({"objectId": len(groups), "label": label, "segments": [seg]})
        base += 4
        seg += 1
    xyz = np.concatenate(parts).astype(np.float32)
    rgb = (np.arange(len(xyz) * 3) % 255).reshape(-1, 3).astype(np.uint8)
    return xyz, rgb, np.concatenate(faces), seg_of_vert, groups


@pytest.fixture
def scene_dir(tmp_path):
    scan = "scene0000_00"
    scans = tmp_path / "scannetv2" / "scans" / scan
    scans.mkdir(parents=True)
    meta = tmp_path / "scannetv2" / "metadata"
    meta.mkdir(parents=True)
    # label TSV: reuse the real metadata shipped in-repo
    import shutil

    shutil.copy("data/scannetv2/metadata/scannetv2-labels.combined.tsv",
                meta / "scannetv2-labels.combined.tsv")

    xyz, rgb, faces, seg_of_vert, groups = build_scene()
    write_binary_ply(scans / f"{scan}_vh_clean_2.ply", xyz, rgb, faces)
    (scans / f"{scan}_vh_clean_2.0.010000.segs.json").write_text(
        json.dumps({"segIndices": seg_of_vert}))
    (scans / f"{scan}.aggregation.json").write_text(
        json.dumps({"segGroups": groups}))
    (tmp_path / "scannetv2" / "train").mkdir()
    return tmp_path, scan, xyz, rgb, faces


def test_process_one_scan_schema_and_semantics(scene_dir):
    tmp_path, scan, xyz, rgb, faces = scene_dir
    cfg = load_config(["data=scannetv2", f"data.dataset_root_path={tmp_path}"])
    label_map = get_semantic_mapping_file(str(
        tmp_path / "scannetv2" / "metadata" / "scannetv2-labels.combined.tsv"))
    assert label_map["chair"] == 5 and label_map["floor"] == 2

    process_one_scan(scan, cfg, "train", label_map, use_pth=False)
    out = np.load(tmp_path / "scannetv2" / "train" / f"{scan}.npz")

    assert set(out.files) == {"xyz", "rgb", "normal", "sem_labels", "instance_ids"}
    assert out["xyz"].dtype == np.float32 and out["normal"].dtype == np.float32
    assert out["rgb"].dtype == np.uint8
    assert out["sem_labels"].dtype == np.int16 and out["instance_ids"].dtype == np.int16
    np.testing.assert_allclose(out["xyz"], xyz, atol=1e-6)
    np.testing.assert_array_equal(out["rgb"], rgb)

    # nyu40: floor=2 -> filtered 1 (ignored), chair=5 -> filtered 4,
    # unknown label -> -1 (reference get_semantic_labels:34-44)
    sem = out["sem_labels"]
    assert (sem[0:4] == 1).all()
    assert (sem[4:8] == 4).all() and (sem[8:12] == 4).all()
    assert (sem[12:16] == -1).all()

    # instances: ignored-class objects get no id; valid objects are numbered
    # consecutively; unknown-label (sem -1) objects DO get an id — -1 is not
    # in invalid_ids (reference get_instance_ids:75-89 behaves the same)
    inst = out["instance_ids"]
    assert (inst[0:4] == -1).all()
    assert (inst[4:8] == 0).all() and (inst[8:12] == 1).all()
    assert (inst[12:16] == 2).all()

    # normals: area-weighted face-normal accumulation (o3d
    # ComputeVertexNormals uses unnormalized cross products)
    want = np.zeros_like(xyz)
    for a, b, c in faces:
        fn = np.cross(xyz[b] - xyz[a], xyz[c] - xyz[a])
        for v in (a, b, c):
            want[v] += fn
    want /= np.maximum(np.linalg.norm(want, axis=1, keepdims=True), 1e-12)
    np.testing.assert_allclose(out["normal"], want, atol=1e-5)


def test_ply_reader_ascii_binary_parity(tmp_path):
    xyz, rgb, faces, _, _ = build_scene()
    write_binary_ply(tmp_path / "b.ply", xyz, rgb, faces)
    write_ascii_ply(tmp_path / "a.ply", xyz, rgb, faces)
    bx, br, bf = read_ply_mesh(str(tmp_path / "b.ply"))
    ax, ar, af = read_ply_mesh(str(tmp_path / "a.ply"))
    np.testing.assert_allclose(bx, xyz, atol=1e-6)
    np.testing.assert_allclose(ax, xyz, atol=1e-5)
    np.testing.assert_array_equal(br, rgb)
    np.testing.assert_array_equal(ar, rgb)
    np.testing.assert_array_equal(bf, faces)
    np.testing.assert_array_equal(af, faces)


def test_degenerate_face_normals():
    """Zero-area faces must not produce NaNs."""
    xyz = np.array([[0, 0, 0], [1, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2], [0, 1, 3]])  # first face degenerate
    n = compute_vertex_normals(xyz, faces)
    assert np.isfinite(n).all()

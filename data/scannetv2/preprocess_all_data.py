"""ScanNet v2 offline preprocessing: raw mesh + segmentation JSONs -> one
dict per scene {xyz, rgb, normal, sem_labels, instance_ids} (reference
data/scannetv2/preprocess_all_data.py:16-137).

open3d isn't available in this image, so the PLY mesh is parsed directly and
vertex normals computed by area-weighted face-normal accumulation (the same
quantity open3d's compute_vertex_normals produces). Scenes are written as
``.npz`` (torch-free) unless --pth is given and torch is importable.

Usage: python data/scannetv2/preprocess_all_data.py data=scannetv2
"""

from __future__ import annotations

import csv
import json
import os
import struct
import sys
from concurrent.futures import ProcessPoolExecutor
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from minsu3d_tpu.config import load_config  # noqa: E402


def get_semantic_mapping_file(file_path: str) -> dict:
    """raw label -> nyu40 id from the combined TSV (reference :16-23)."""
    label_mapping = {}
    with open(file_path) as f:
        tsv = csv.reader(f, delimiter="\t")
        next(tsv)
        for line in tsv:
            label_mapping[line[1]] = int(line[4])
    return label_mapping


def read_ply_mesh(path: str):
    """Minimal PLY reader (ascii + binary_little_endian) for ScanNet meshes."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        elems = []  # (name, count, [(prop_name, dtype_char)])
        while True:
            line = f.readline().strip().decode()
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element"):
                _, name, cnt = line.split()
                elems.append([name, int(cnt), []])
            elif line.startswith("property"):
                parts = line.split()
                if parts[1] == "list":
                    elems[-1][2].append((parts[-1], "list", parts[2], parts[3]))
                else:
                    elems[-1][2].append((parts[-1], parts[1]))
            elif line == "end_header":
                break

        type_map = {"float": "f4", "float32": "f4", "double": "f8", "uchar": "u1",
                    "uint8": "u1", "char": "i1", "short": "i2", "ushort": "u2",
                    "int": "i4", "int32": "i4", "uint": "u4"}
        verts = {}
        faces = None
        for name, cnt, props in elems:
            if name == "vertex":
                if fmt == "ascii":
                    data = np.loadtxt([f.readline() for _ in range(cnt)])
                    for i, p in enumerate(props):
                        verts[p[0]] = data[:, i]
                else:
                    dt = np.dtype([(p[0], "<" + type_map[p[1]]) for p in props])
                    data = np.frombuffer(f.read(dt.itemsize * cnt), dt)
                    for p in props:
                        verts[p[0]] = data[p[0]]
            elif name == "face":
                if fmt == "ascii":
                    faces = np.array([f.readline().split()[1:4] for _ in range(cnt)], np.int64)
                else:
                    cdt, idt = props[0][2], props[0][3]
                    ct = np.dtype("<" + type_map[cdt])
                    it = np.dtype("<" + type_map[idt])
                    raw = f.read((ct.itemsize + 3 * it.itemsize) * cnt)
                    dt = np.dtype([("n", ct), ("v", it, (3,))])
                    faces = np.frombuffer(raw, dt)["v"].astype(np.int64)
        xyz = np.stack([verts["x"], verts["y"], verts["z"]], 1).astype(np.float32)
        rgb = np.stack([verts.get("red"), verts.get("green"), verts.get("blue")], 1)
        return xyz, np.asarray(rgb, np.uint8), faces


def compute_vertex_normals(xyz: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals (what o3d compute_vertex_normals yields)."""
    fn = np.cross(xyz[faces[:, 1]] - xyz[faces[:, 0]], xyz[faces[:, 2]] - xyz[faces[:, 0]])
    normals = np.zeros_like(xyz)
    for k in range(3):
        np.add.at(normals, faces[:, k], fn)
    norm = np.linalg.norm(normals, axis=1, keepdims=True)
    return (normals / np.maximum(norm, 1e-12)).astype(np.float32)


def read_mesh_file(mesh_file: str):
    xyz, rgb, faces = read_ply_mesh(mesh_file)
    return xyz, rgb, compute_vertex_normals(xyz, faces)


def read_seg_file(seg_file: str) -> dict:
    with open(seg_file) as f:
        data = json.load(f)
    seg2verts: dict = {}
    for vert, seg in enumerate(data["segIndices"]):
        seg2verts.setdefault(seg, []).append(vert)
    return seg2verts


def read_agg_file(file_path: str):
    object_id_to_segs, obj_name_to_segs = {}, {}
    with open(file_path) as f:
        data = json.load(f)
    for group in data["segGroups"]:
        object_id_to_segs[group["objectId"]] = group["segments"]
        obj_name_to_segs.setdefault(group["label"], []).extend(group["segments"])
    return object_id_to_segs, obj_name_to_segs


def get_semantic_labels(obj_name_to_segs, seg_to_verts, num_verts, label_map,
                        filtered_label_map) -> np.ndarray:
    sem = np.full(num_verts, -1, np.int16)
    for label, segs in obj_name_to_segs.items():
        mapped = -1
        if label in label_map and label_map[label] in filtered_label_map:
            mapped = filtered_label_map[label_map[label]]
        for seg in segs:
            sem[seg_to_verts[seg]] = mapped
    return sem


def get_instance_ids(object_id2segs, seg2verts, sem_labels, invalid_ids) -> np.ndarray:
    instance_ids = np.full(len(sem_labels), -1, np.int16)
    new_object_id = 0
    for _, segs in object_id2segs.items():
        skip = False
        for seg in segs:
            if sem_labels[seg2verts[seg][0]] in invalid_ids:
                skip = True
                break
        if skip:
            continue
        for seg in segs:
            instance_ids[seg2verts[seg]] = new_object_id
        new_object_id += 1
    return instance_ids


def process_one_scan(scan: str, cfg, split: str, label_map: dict, use_pth: bool) -> None:
    mesh_path = os.path.join(cfg.data.raw_scene_path, scan, scan + "_vh_clean_2.ply")
    agg_path = os.path.join(cfg.data.raw_scene_path, scan, scan + ".aggregation.json")
    seg_path = os.path.join(cfg.data.raw_scene_path, scan, scan + "_vh_clean_2.0.010000.segs.json")

    xyz, rgb, normal = read_mesh_file(mesh_path)
    num_verts = len(xyz)
    if os.path.exists(agg_path):
        seg2verts = read_seg_file(seg_path)
        object_id2segs, label2segs = read_agg_file(agg_path)
        filtered_label_map, invalid_ids = {}, []
        for i, sem_id in enumerate(cfg.data.mapping_classes_ids):
            filtered_label_map[sem_id] = i
            if sem_id in cfg.data.ignore_classes:
                invalid_ids.append(i)
        sem_labels = get_semantic_labels(label2segs, seg2verts, num_verts,
                                         label_map, filtered_label_map)
        instance_ids = get_instance_ids(object_id2segs, seg2verts, sem_labels, invalid_ids)
    else:  # test scenes have no annotations
        sem_labels = np.full(num_verts, -1, np.int16)
        instance_ids = np.full(num_verts, -1, np.int16)

    out = {"xyz": xyz, "rgb": rgb, "normal": normal,
           "sem_labels": sem_labels, "instance_ids": instance_ids}
    out_dir = os.path.join(cfg.data.dataset_path, split)
    if use_pth:
        import torch

        torch.save(out, os.path.join(out_dir, f"{scan}.pth"))
    else:
        np.savez(os.path.join(out_dir, f"{scan}.npz"), **out)


def main(overrides: list[str]) -> None:
    use_pth = "--pth" in overrides
    overrides = [o for o in overrides if not o.startswith("--")]
    cfg = load_config(overrides)
    label_map = get_semantic_mapping_file(cfg.data.metadata.combine_file)
    for split in ("train", "val", "test"):
        os.makedirs(os.path.join(cfg.data.dataset_path, split), exist_ok=True)
        with open(getattr(cfg.data.metadata, f"{split}_list")) as f:
            id_list = [line.strip() for line in f]
        print(f"==> Processing {split} split ({len(id_list)} scans)...")
        worker = partial(process_one_scan, cfg=cfg, split=split,
                         label_map=label_map, use_pth=use_pth)
        with ProcessPoolExecutor() as pool:
            list(pool.map(worker, id_list, chunksize=1))


if __name__ == "__main__":
    main(sys.argv[1:])

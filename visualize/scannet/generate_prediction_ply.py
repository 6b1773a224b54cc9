"""Offline visualization: color ScanNet meshes by predicted semantics/
instances, or draw wireframe bboxes as cylinder meshes (reference
visualize/scannet/generate_prediction_ply.py:17-236). open3d-free: uses the
framework's own PLY reader/writers.

Usage:
  python visualize/scannet/generate_prediction_ply.py \
      -p output/.../predictions/instance -s val -m semantic -o output_ply
"""

from __future__ import annotations

import argparse
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from minsu3d_tpu.util.bbox import write_cylinder_bbox  # noqa: E402
from minsu3d_tpu.util.pc import write_ply_rgb_face  # noqa: E402

# NYU40 color map used by the ScanNet benchmark visualizations
SCANNET_COLOR_MAP = {
    0: (0., 0., 0.), 1: (174., 199., 232.), 2: (152., 223., 138.),
    3: (31., 119., 180.), 4: (255., 187., 120.), 5: (188., 189., 34.),
    6: (140., 86., 75.), 7: (255., 152., 150.), 8: (214., 39., 40.),
    9: (197., 176., 213.), 10: (148., 103., 189.), 11: (196., 156., 148.),
    12: (23., 190., 207.), 13: (46., 85., 103.), 14: (247., 182., 210.),
    15: (66., 188., 102.), 16: (219., 219., 141.), 17: (140., 57., 197.),
    18: (202., 185., 52.), 19: (51., 176., 203.), 20: (200., 54., 131.),
    21: (92., 193., 61.), 22: (78., 71., 183.), 23: (172., 114., 82.),
    24: (255., 127., 14.), 25: (91., 163., 138.), 26: (153., 98., 156.),
    27: (140., 153., 101.), 28: (158., 218., 229.), 29: (100., 125., 154.),
    30: (178., 127., 135.), 32: (146., 111., 194.), 33: (44., 160., 44.),
    34: (112., 128., 144.), 35: (96., 207., 209.), 36: (227., 119., 194.),
    37: (213., 92., 176.), 38: (94., 106., 211.), 39: (82., 84., 163.),
    40: (100., 85., 144.),
}


def get_random_rgb_colors(num: int) -> list:
    rng = random.Random(0)
    return [[rng.randint(0, 255) for _ in range(3)] for _ in range(num)]


def generate_colored_ply(args, masks, label_ids, points, colors, indices, out_path):
    """Paint vertices per predicted instance (reference :97-114)."""
    if args.mode == "semantic":
        for mask, sem in zip(masks, label_ids):
            colors[mask] = SCANNET_COLOR_MAP[int(sem)]
    else:
        palette = get_random_rgb_colors(len(label_ids))
        random.shuffle(palette)
        for mask, color in zip(masks, palette):
            colors[mask] = color
    write_ply_rgb_face(points, colors.astype(np.uint8), indices, out_path)


def generate_bbox_ply(args, masks, label_ids, points, colors, indices, out_path):
    """Append cylinder-wireframe boxes to the mesh (reference :117-156)."""
    b_verts, b_colors, b_indices = [], [], []
    palette = get_random_rgb_colors(len(label_ids))
    random.shuffle(palette)
    off = 0
    for i, mask in enumerate(masks):
        pts = points[mask]
        if len(pts) == 0:
            continue
        mn, mx = pts.min(0), pts.max(0)
        bbox = np.concatenate([(mn + mx) / 2, mx - mn])
        color = SCANNET_COLOR_MAP[int(label_ids[i])] if args.mode == "semantic" else palette[i]
        v, c, f = write_cylinder_bbox(bbox, 0, None, color=color)
        b_verts.append(v)
        b_colors.append(c)
        b_indices.append(np.asarray(f) + off)
        off += len(v)
    if b_verts:
        bv = np.concatenate(b_verts)
        all_points = np.concatenate([points, bv])
        all_colors = np.concatenate([colors, np.concatenate(b_colors)])
        all_faces = np.concatenate([indices, np.concatenate(b_indices) + len(points)])
    else:
        all_points, all_colors, all_faces = points, colors, indices
    write_ply_rgb_face(all_points, all_colors.astype(np.uint8), all_faces, out_path)


def generate_single_ply(args) -> None:
    os.makedirs(args.output_dir, exist_ok=True)
    ply_file = os.path.join(args.scans, args.scene_id, f"{args.scene_id}_vh_clean_2.ply")
    pred_file = os.path.join(args.predict_dir, f"{args.scene_id}.txt")
    out_path = os.path.join(args.output_dir, f"{args.scene_id}.ply")

    from data.scannetv2.preprocess_all_data import read_ply_mesh

    points, colors, indices = read_ply_mesh(ply_file)
    colors = colors.astype(np.float64)

    masks, label_ids = [], []
    with open(pred_file) as f:
        for line in f:
            rel, sem, _conf = line.split()
            masks.append(np.loadtxt(os.path.join(args.predict_dir, rel), dtype=bool))
            label_ids.append(int(sem))

    if args.bbox:
        generate_bbox_ply(args, masks, label_ids, points, colors, indices, out_path)
    else:
        generate_colored_ply(args, masks, label_ids, points, colors, indices, out_path)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-p", "--predict_dir", type=str, required=True,
                        help="directory with <scene>.txt + predicted_masks/")
    parser.add_argument("-s", "--split", type=str, default="val", choices=["test", "val"])
    parser.add_argument("-b", "--bbox", action="store_true")
    parser.add_argument("-m", "--mode", type=str, default="semantic",
                        choices=["semantic", "instance"])
    parser.add_argument("-o", "--output_dir", type=str, default="output_ply")
    parser.add_argument("--scans", type=str, default="data/scannetv2/scans")
    parser.add_argument("--metadata", type=str, default="data/scannetv2/metadata")
    args = parser.parse_args()

    list_file = os.path.join(args.metadata, f"scannetv2_{args.split}.txt")
    with open(list_file) as f:
        scene_ids = [line.strip() for line in f]
    for scene_id in scene_ids:
        args.scene_id = scene_id
        generate_single_ply(args)


if __name__ == "__main__":
    main()

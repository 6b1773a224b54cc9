"""Render example PNGs of predictions on a synthetic scene — the repo's
equivalent of the reference's visualize/example/*.png gallery (reference
repo ships color_semantic / color_instance / bbox_semantic / bbox_instance
renders of a ScanNet scan; this zero-egress image has no ScanNet, so the
renders come from a synthetic room + the golden-checkpoint predictions).

Reads a submission-format predictions dir (util/io.py::save_prediction —
what `python test.py` writes under .../inference/val/predictions/instance),
re-creates the synthetic scene by seed, and renders four matplotlib views:

  color_semantic.png   vertices painted by predicted class (ScanNet colors)
  color_instance.png   vertices painted per predicted instance
  bbox_semantic.png    GT-colored points + predicted axis-aligned boxes
  bbox_instance.png    same with per-instance colors

Usage:
  python visualize/render_example.py -p output/.../predictions/instance \
      -o visualize/example [--seed 12]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from visualize.scannet.generate_prediction_ply import (  # noqa: E402
    SCANNET_COLOR_MAP, get_random_rgb_colors)


def _load_predictions(pred_dir: str, scan_id: str):
    masks, label_ids = [], []
    with open(os.path.join(pred_dir, f"{scan_id}.txt")) as f:
        for line in f:
            rel, sem, _conf = line.split()
            masks.append(np.loadtxt(os.path.join(pred_dir, rel), dtype=bool))
            label_ids.append(int(sem))
    return masks, label_ids


def _render(points: np.ndarray, colors: np.ndarray, out_path: str,
            boxes: list | None = None, title: str = "") -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(8, 6), dpi=110)
    ax = fig.add_subplot(projection="3d")
    sub = np.random.default_rng(0).permutation(len(points))[:60000]
    ax.scatter(points[sub, 0], points[sub, 1], points[sub, 2],
               c=np.clip(colors[sub] / 255.0, 0, 1), s=0.8, linewidths=0)
    for mn, mx, c in boxes or []:
        # 12 wireframe edges of the axis-aligned box
        corners = np.array([[x, y, z] for x in (mn[0], mx[0])
                            for y in (mn[1], mx[1]) for z in (mn[2], mx[2])])
        edges = [(0, 1), (0, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 7),
                 (6, 7), (0, 4), (1, 5), (2, 6), (3, 7)]
        for a, b in edges:
            ax.plot(*zip(corners[a], corners[b]), color=np.array(c) / 255.0,
                    linewidth=1.2)
    ax.set_title(title)
    ax.view_init(elev=35, azim=-60)
    ax.set_box_aspect((np.ptp(points[:, 0]), np.ptp(points[:, 1]),
                       np.ptp(points[:, 2]) * 1.6))
    ax.set_axis_off()
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
    print(f"wrote {out_path}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-p", "--predict_dir", required=True,
                    help=".../predictions/instance (submission format)")
    ap.add_argument("-o", "--output_dir", default="visualize/example")
    ap.add_argument("--scan", default=None,
                    help="scan id (default: first <scan>.txt in predict_dir)")
    args = ap.parse_args()

    if args.scan is None:
        txts = sorted(t for t in os.listdir(args.predict_dir) if t.endswith(".txt"))
        args.scan = os.path.splitext(txts[0])[0]
    masks, label_ids = _load_predictions(args.predict_dir, args.scan)

    # synthetic scan ids are "synth_<split><idx>" with seed = cfg seed (7) +
    # split base (val=10000) + idx (data/dataset.py::Synthetic._load_from_disk)
    from minsu3d_tpu.data.synthetic import make_scene

    import re

    m = re.match(r"synth_(train|val|test)(\d+)", args.scan)
    base = {"train": 0, "val": 10_000, "test": 20_000}[m.group(1)]
    seed = 7 + base + int(m.group(2))
    scene = make_scene(seed=seed, num_objects=8, points_per_object=3000,
                       floor_points=16000)
    points = scene["xyz"]
    base = ((scene["rgb"] + 1.0) * 127.5) if "rgb" in scene else \
        np.full((len(points), 3), 180.0)

    os.makedirs(args.output_dir, exist_ok=True)
    palette = get_random_rgb_colors(len(masks))

    sem_colors = base.copy()
    inst_colors = base.copy()
    boxes_sem, boxes_inst = [], []
    for i, (mask, sem) in enumerate(zip(masks, label_ids)):
        sem_colors[mask] = SCANNET_COLOR_MAP.get(int(sem), (0, 0, 0))
        inst_colors[mask] = palette[i]
        if mask.any():
            pts = points[mask]
            boxes_sem.append((pts.min(0), pts.max(0),
                              SCANNET_COLOR_MAP.get(int(sem), (0, 0, 0))))
            boxes_inst.append((pts.min(0), pts.max(0), palette[i]))

    _render(points, sem_colors, os.path.join(args.output_dir, "color_semantic.png"),
            title=f"{args.scan}: predicted semantics")
    _render(points, inst_colors, os.path.join(args.output_dir, "color_instance.png"),
            title=f"{args.scan}: predicted instances")
    _render(points, base, os.path.join(args.output_dir, "bbox_semantic.png"),
            boxes=boxes_sem, title=f"{args.scan}: predicted boxes (class colors)")
    _render(points, base, os.path.join(args.output_dir, "bbox_instance.png"),
            boxes=boxes_inst, title=f"{args.scan}: predicted boxes (instance colors)")


if __name__ == "__main__":
    main()

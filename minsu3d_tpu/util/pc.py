"""PLY point-cloud/mesh IO (reference minsu3d/util/pc.py:10-91) — dependency-
free ASCII/binary PLY writers (the reference uses the plyfile package)."""

from __future__ import annotations

import numpy as np


def _write_ply(filename: str, vertex_props: list[tuple[str, str]], vertex_rows: np.ndarray,
               faces: np.ndarray | None = None) -> None:
    n = len(vertex_rows)
    with open(filename, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        for name, typ in vertex_props:
            f.write(f"property {typ} {name}\n")
        if faces is not None:
            f.write(f"element face {len(faces)}\n")
            f.write("property list uchar int vertex_index\n")
        f.write("end_header\n")
        for row in vertex_rows:
            f.write(" ".join(str(int(v)) if float(v).is_integer() and abs(v) < 2**31
                             else f"{v:.6f}" for v in row) + "\n")
        if faces is not None:
            for face in faces:
                f.write("3 " + " ".join(str(int(v)) for v in face) + "\n")


def _rgb_rows(points: np.ndarray, colors: np.ndarray) -> np.ndarray:
    return np.concatenate([points.astype(np.float64), colors.astype(np.float64)], axis=1)


_RGB_PROPS = [("x", "float"), ("y", "float"), ("z", "float"),
              ("red", "uchar"), ("green", "uchar"), ("blue", "uchar")]


def write_ply_rgb(points: np.ndarray, colors: np.ndarray, filename: str,
                  num_classes=None) -> None:
    _write_ply(filename, _RGB_PROPS, _rgb_rows(points, colors))


def write_ply_rgb_face(points: np.ndarray, colors: np.ndarray, faces: np.ndarray,
                       filename: str) -> None:
    _write_ply(filename, _RGB_PROPS, _rgb_rows(points, colors), faces=np.asarray(faces))


def write_ply_rgb_annotated(points: np.ndarray, colors: np.ndarray, labels: np.ndarray,
                            instance_ids: np.ndarray, filename: str) -> None:
    rows = np.concatenate([
        points.astype(np.float64), colors.astype(np.float64),
        np.asarray(labels, np.float64)[:, None], np.asarray(instance_ids, np.float64)[:, None],
    ], axis=1)
    _write_ply(filename, _RGB_PROPS + [("label", "ushort"), ("instance", "ushort")], rows)


def create_color_palette(num_classes: int) -> np.ndarray:
    rng = np.random.default_rng(42)
    return rng.integers(0, 255, size=(num_classes, 3), dtype=np.uint8)


def write_ply_colorful(points: np.ndarray, labels: np.ndarray, filename: str,
                       num_classes=None, colormap=None) -> None:
    labels = np.asarray(labels, np.int64)
    if num_classes is None:
        num_classes = int(labels.max()) + 1
    palette = np.asarray(colormap, np.uint8) if colormap is not None \
        else create_color_palette(num_classes)
    colors = palette[np.clip(labels, 0, num_classes - 1)]
    write_ply_rgb(points, colors, filename)

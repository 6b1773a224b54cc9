"""3D bounding-box geometry + mesh export (reference minsu3d/util/bbox.py:
19-442). trimesh isn't available here, so box/cylinder meshes are generated
directly and written with our PLY writer."""

from __future__ import annotations

import numpy as np

from minsu3d_tpu.util.pc import write_ply_rgb_face


def rotz(t: float) -> np.ndarray:
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def get_3d_box(center, box_size, heading_angle=None) -> np.ndarray:
    """8 corners of a (optionally z-rotated) box (reference bbox.py:19-37)."""
    l, w, h = box_size
    x = np.array([l, l, -l, -l, l, l, -l, -l]) / 2
    y = np.array([w, -w, -w, w, w, -w, -w, w]) / 2
    z = np.array([h, h, h, h, -h, -h, -h, -h]) / 2
    corners = np.vstack([x, y, z])
    if heading_angle is not None:
        corners = rotz(heading_angle) @ corners
    return (corners + np.asarray(center)[:, None]).T


def get_3d_box_batch(center, box_size, heading_angle) -> np.ndarray:
    return np.stack([get_3d_box(c, s, h) for c, s, h in
                     zip(center, box_size, heading_angle)])


def get_3d_box_edges(corners: np.ndarray) -> list:
    """12 edges of a corner-format box (reference bbox.py:63-86)."""
    e = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7), (7, 4),
         (0, 4), (1, 5), (2, 6), (3, 7)]
    return [(corners[i], corners[j]) for i, j in e]


def get_aabb3d_min_max(corner: np.ndarray):
    return corner.min(0), corner.max(0)


def get_aabb3d_min_max_batch(corner: np.ndarray):
    return corner.min(1), corner.max(1)


def get_aabb3d_iou(corners1: np.ndarray, corners2: np.ndarray) -> float:
    """Axis-aligned IoU of two corner-format boxes (reference bbox.py:188-211)."""
    amin, amax = get_aabb3d_min_max(corners1)
    bmin, bmax = get_aabb3d_min_max(corners2)
    inter = np.prod(np.maximum(np.minimum(amax, bmax) - np.maximum(amin, bmin), 0))
    vol_a = np.prod(amax - amin)
    vol_b = np.prod(bmax - bmin)
    return float(inter / max(vol_a + vol_b - inter, 1e-12))


def get_aabb3d_iou_batch(corners1: np.ndarray, corners2: np.ndarray) -> np.ndarray:
    """Pairwise-batched AABB IoU (reference bbox.py:214-242)."""
    amin, amax = get_aabb3d_min_max_batch(corners1)
    bmin, bmax = get_aabb3d_min_max_batch(corners2)
    inter = np.prod(np.maximum(np.minimum(amax, bmax) - np.maximum(amin, bmin), 0), axis=1)
    vol_a = np.prod(amax - amin, axis=1)
    vol_b = np.prod(bmax - bmin, axis=1)
    return inter / np.maximum(vol_a + vol_b - inter, 1e-12)


box3d_iou = get_aabb3d_iou


# -- mesh export ---------------------------------------------------------------

def _box_mesh(center, size):
    corners = get_3d_box(center, size)
    faces = np.array([[0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6], [0, 4, 5], [0, 5, 1],
                      [1, 5, 6], [1, 6, 2], [2, 6, 7], [2, 7, 3], [3, 7, 4], [3, 4, 0]])
    return corners, faces


def write_bbox(scene_bbox: np.ndarray, out_filename: str) -> None:
    """Export (cx,cy,cz,dx,dy,dz) boxes as a merged PLY mesh
    (reference bbox.py:245-271)."""
    verts, faces = [], []
    off = 0
    for box in scene_bbox:
        v, f = _box_mesh(box[:3], box[3:6])
        verts.append(v)
        faces.append(f + off)
        off += len(v)
    verts = np.concatenate(verts) if verts else np.zeros((0, 3))
    faces = np.concatenate(faces) if faces else np.zeros((0, 3), int)
    colors = np.full((len(verts), 3), 180, np.uint8)
    write_ply_rgb_face(verts, colors, faces, out_filename)


def _cylinder_mesh(p0, p1, radius=0.02, slices=10):
    p0, p1 = np.asarray(p0, float), np.asarray(p1, float)
    axis = p1 - p0
    length = np.linalg.norm(axis)
    if length < 1e-9:
        return np.zeros((0, 3)), np.zeros((0, 3), int)
    axis = axis / length
    ref = np.array([0.0, 0.0, 1.0]) if abs(axis[2]) < 0.9 else np.array([1.0, 0.0, 0.0])
    u = np.cross(axis, ref)
    u /= np.linalg.norm(u)
    v = np.cross(axis, u)
    ang = np.linspace(0, 2 * np.pi, slices, endpoint=False)
    ring = (np.outer(np.cos(ang), u) + np.outer(np.sin(ang), v)) * radius
    verts = np.concatenate([p0 + ring, p1 + ring])
    faces = []
    for i in range(slices):
        j = (i + 1) % slices
        faces.append([i, j, slices + i])
        faces.append([j, slices + j, slices + i])
    return verts, np.asarray(faces)


def write_lines_as_cylinders(pcl, out_filename: str, rad: float = 0.005) -> None:
    """Line segments -> cylinder mesh PLY (reference bbox.py:302-320)."""
    verts, faces = [], []
    off = 0
    for p0, p1 in pcl:
        v, f = _cylinder_mesh(p0, p1, rad)
        verts.append(v)
        faces.append(f + off)
        off += len(v)
    verts = np.concatenate(verts) if verts else np.zeros((0, 3))
    faces = np.concatenate(faces) if faces else np.zeros((0, 3), int)
    write_ply_rgb_face(verts, np.full((len(verts), 3), 180, np.uint8), faces, out_filename)


def write_cylinder_bbox(bbox, mode, out_filename=None, color=None):
    """Wireframe box as cylinder mesh (reference bbox.py:323-423).
    bbox: (cx,cy,cz,dx,dy,dz) or 8-corner format. Returns (verts, colors,
    faces); writes PLY if out_filename given."""
    bbox = np.asarray(bbox, float)
    corners = bbox if bbox.shape == (8, 3) else get_3d_box(bbox[:3], bbox[3:6])
    if color is None:
        palette = [(0, 255, 0), (0, 0, 255), (255, 0, 0)]
        color = palette[mode % 3] if isinstance(mode, int) else (0, 255, 0)
    verts, faces = [], []
    off = 0
    for p0, p1 in get_3d_box_edges(corners):
        v, f = _cylinder_mesh(p0, p1, 0.02)
        verts.append(v)
        faces.append(f + off)
        off += len(v)
    verts = np.concatenate(verts) if verts else np.zeros((0, 3))
    faces = np.concatenate(faces) if faces else np.zeros((0, 3), int)
    colors = np.tile(np.asarray(color, np.uint8), (len(verts), 1))
    if out_filename:
        write_ply_rgb_face(verts, colors, faces, out_filename)
    return verts, colors, faces


def write_cylinder_bbox_batch(bboxes, mode, out_filename=None):
    verts, colors, faces = [], [], []
    off = 0
    for bbox in bboxes:
        v, c, f = write_cylinder_bbox(bbox, mode)
        verts.append(v)
        colors.append(c)
        faces.append(f + off)
        off += len(v)
    verts = np.concatenate(verts) if verts else np.zeros((0, 3))
    colors = np.concatenate(colors) if colors else np.zeros((0, 3), np.uint8)
    faces = np.concatenate(faces) if faces else np.zeros((0, 3), int)
    if out_filename:
        write_ply_rgb_face(verts, colors, faces, out_filename)
    return verts, colors, faces

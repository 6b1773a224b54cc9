"""Shared model machinery (reference minsu3d/model/general_model.py).

Contains the jittable building blocks every model composes:
  * ``build_scene_plan``      — batch arrays -> UNet grid plan + point->voxel map
  * ``clusters_voxelization`` — proposal re-voxelization for score/mask heads
                                (reference general_model.py:152-193)
  * ``get_segmented_scores``  — IoU -> soft score targets (:196-213)
  * ``semantic_loss`` / offset loss wiring (:36-50)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from minsu3d_tpu.loss import pt_offset_loss
from minsu3d_tpu.ops import segment, sparse
from minsu3d_tpu.ops.instance_iou import ProposalRows


def backbone_caps(cfg, split: str) -> list[int]:
    caps = cfg.data.caps
    v = caps.voxels if split == "train" else caps.eval_voxels
    return [max(v // d, 1024) for d in caps.level_divisors]


def build_scene_plan(batch: dict, caps: list[int], num_levels: int,
                     tap_fracs: tuple = (), blocked: tuple = (),
                     zslice: bool = False):
    """GridPlan over the batch's voxels + per-point voxel index (sorted space).

    When the collate shipped a host-built plan (``plan0_khi`` present — see
    csrc/native.py::build_plan_host), reconstruct it from the batch arrays:
    the device then only gathers representative features instead of running
    the sort pipeline (~0.3 s/scene at eval caps, overlapped with compute by
    the input pipeline instead).

    ``tap_fracs`` (model.network.tap_compact) attaches compact per-tap kernel
    maps to the first ``len(tap_fracs)`` levels (0 = dense level, see
    sparse_conv.add_tap_lists). Each entry is either a float — face-tap pair
    capacity ``frac * cap`` with the default edge/corner class scales — or a
    [face, edge, corner] triple of explicit per-class fractions (the measured
    class ratio varies by level: probe_tap_density). Pair overflow is summed
    into the plan's diag via ``plan_tap_dropped``.

    ``blocked`` (model.network.blocked_subm) attaches blocked halo-window
    kernel maps instead: per-level halo row counts (0 = dense level, see
    sparse_conv.add_block_meta) — subm convs then stream sequential window
    slices instead of random row gathers. Takes precedence over tap lists in
    the conv dispatch; out-of-halo pair overflow also lands in the diag.
    """
    cap0 = caps[0]
    if "plan0_khi" in batch:
        levels = []
        for lvl in range(num_levels):
            levels.append(sparse.Level(
                khi=batch[f"plan{lvl}_khi"], klo=batch[f"plan{lvl}_klo"],
                coords=batch[f"plan{lvl}_coords"], batch=batch[f"plan{lvl}_batch"],
                valid=batch[f"plan{lvl}_valid"], count=batch[f"plan{lvl}_count"],
                n_dropped=batch[f"plan{lvl}_dropped"], nbr_idx=batch[f"plan{lvl}_nbr"],
                parent_idx=batch.get(f"plan{lvl}_parent"),
                child_kid=batch.get(f"plan{lvl}_kid")))
        plan = sparse.GridPlan(levels=tuple(levels))
        row2voxel = batch["plan_row2voxel"]
        featsrc = batch["plan0_featsrc"]
        voxel_feats = jnp.where((featsrc >= 0)[:, None],
                                batch["voxel_feats"][jnp.maximum(featsrc, 0)], 0)
    else:
        plan, row2voxel, voxel_feats = sparse.build_plan(
            batch["voxel_batch"], batch["voxel_coords"], batch["voxel_mask"],
            caps, num_levels, batch["voxel_feats"])
    if tap_fracs:
        from minsu3d_tpu.ops import sparse_conv

        levels = []
        for lvl, level in enumerate(plan.levels):
            frac = tap_fracs[lvl] if lvl < len(tap_fracs) else 0.0
            if isinstance(frac, (list, tuple)):
                if any(f > 0 for f in frac):
                    caps3 = tuple(max(int(round(float(f) * level.cap)), 8)
                                  for f in frac)
                    level = sparse_conv.add_tap_lists(level, caps3[0], caps3)
            elif frac and frac > 0:
                e_cap = max(int(round(float(frac) * level.cap)), 128)
                level = sparse_conv.add_tap_lists(level, e_cap)
            levels.append(level)
        plan = sparse.GridPlan(levels=tuple(levels))
    if blocked:
        from minsu3d_tpu.ops import sparse_conv

        # blocked + zslice together = blocked z-run windows: 9 three-row
        # column gathers per output instead of 27 rows, realigned in VMEM
        # (sparse_conv.add_block_meta_z); blocked alone = 27-row windows
        add_meta = (sparse_conv.add_block_meta_z if zslice
                    else sparse_conv.add_block_meta)
        levels = []
        for lvl, level in enumerate(plan.levels):
            halo = int(blocked[lvl]) if lvl < len(blocked) else 0
            if halo > 0:
                level = add_meta(level, halo)
            levels.append(level)
        plan = sparse.GridPlan(levels=tuple(levels))
    elif zslice:
        from minsu3d_tpu.ops import sparse_conv

        plan = sparse.GridPlan(levels=tuple(
            sparse_conv.add_zslice_meta(level) for level in plan.levels))
    r2v_ext = jnp.concatenate([row2voxel, jnp.full((1,), cap0, jnp.int32)])
    v2p = r2v_ext[jnp.minimum(batch["p2v"], row2voxel.shape[0])]
    return plan, v2p, voxel_feats


def tap_compact_cfg(net_cfg) -> tuple:
    """model.network.tap_compact as a hashable per-level tuple (flax Module
    fields must hash): floats stay floats, triples become tuples."""
    raw = net_cfg.get("tap_compact", None) or ()
    return tuple(tuple(float(f) for f in e) if isinstance(e, (list, tuple))
                 else float(e) for e in raw)


def plan_tap_dropped(plan) -> jax.Array:
    """Total kernel-map pairs lost to static-capacity overflow — compact-tap
    lists (tap_dropped) and blocked-window fixup lists (fix_dropped) — 0 when
    neither is attached. Surfaced in ``out["diag"]``: overflow degrades
    ACCURACY (missing neighbor contributions), never speed."""
    total = jnp.int32(0)
    for lv in plan.levels:
        if lv.tap_dropped is not None:
            total = total + lv.tap_dropped
        if lv.fix_dropped is not None:
            total = total + lv.fix_dropped
    return total


def blocked_cfg(net_cfg) -> tuple:
    """model.network.blocked_subm as a hashable per-level halo tuple."""
    return tuple(int(h) for h in (net_cfg.get("blocked_subm", None) or ()))


def dense_grid_flag(cfg) -> bool:
    """``model.network.dense_grid`` with its config contract: the dense-grid
    backbone (ops/dense_grid.py) needs a configured level-0 extent."""
    flag = bool(cfg.model.network.get("dense_grid", False))
    if flag:
        grid = tuple(cfg.data.caps.get("grid", None) or ())
        if len(grid) != 3 or not all(int(g) > 0 for g in grid):
            raise ValueError(
                "model.network.dense_grid=True needs data.caps.grid=[X, Y, Z] "
                f"(level-0 cell extents at voxel_size resolution); got {grid!r}")
    return flag


def plan_dropped(plan) -> jax.Array:
    """Total voxels lost to level-capacity overflow across the plan —
    surfaced in ``out["diag"]`` so mis-set ``data.caps.*`` show up in logs."""
    total = jnp.int32(0)
    for lv in plan.levels:
        total = total + lv.n_dropped
    return total


def make_units(key_hi: jax.Array, key_lo: jax.Array, active: jax.Array, u_cap: int):
    """Compact (key_hi, key_lo) pairs of active points into unit ids [0, u_cap).

    Used to form (voxel, predicted-class) clustering units (see
    ops/cluster.py::cluster_units). Returns (per-point unit id (u_cap = none),
    dropped-unit count) — callers surface the count so a too-small
    ``caps.cluster_units`` shows up in logs instead of silently shrinking
    clusters (points of dropped units never cluster)."""
    coords = jnp.stack([jnp.clip(key_lo, 0, 1023),
                        jnp.zeros_like(key_lo), jnp.zeros_like(key_lo)], axis=1)
    level, row2unit, _ = sparse.build_base(key_hi, coords, active, u_cap)
    return row2unit, level.n_dropped


def make_units_grid(batch_ids: jax.Array, coords: jax.Array, group: jax.Array,
                    active: jax.Array, u_cap: int, cell_size: float):
    """(quantized-coordinate cell, group) clustering units.

    Same bounded-error aggregation as the (voxel, class) units, but the cell
    grid lives in the COORDINATE SPACE BEING CLUSTERED: points sharing a cell
    are within ``cell_size * sqrt(3)`` of each other in that space by
    construction. For offset-shifted coordinates this is the tighter
    invariant — original-space voxel mates can shift apart, while a trained
    net collapses whole instances into a handful of shifted cells, so the
    ACTIVE unit count drops ~10x and a much smaller ``u_cap`` suffices
    (overflow surfaces via the returned drop count -> diag)."""
    from minsu3d_tpu.ops import hashing as hs

    cell = jnp.clip(jnp.floor(coords / cell_size).astype(jnp.int32) + 512,
                    0, hs.COORD_MAX - 1)
    key_hi = (batch_ids.astype(jnp.int32) << 8) | jnp.clip(group.astype(jnp.int32),
                                                           0, 255)
    level, row2unit, _ = sparse.build_base(key_hi, cell, active, u_cap)
    return row2unit, level.n_dropped


def cluster_step(coords, batch_ids, active, group, radius, caps, unit_id=None,
                 u_cap: int | None = None, edge_factor: int | None = None,
                 grid_cell: float = 0.0, big_thre: int = 1):
    """Dispatch point- or unit-granularity clustering per StaticCaps.

    ``edge_factor`` overrides ``caps.edge_factor`` (edge-buffer slots per
    point/unit) for this clustering — the original-coordinate grid needs far
    fewer slots than the shifted grid (see StaticCaps.edge_factor_xyz).

    ``big_thre``: components below this point count don't register in
    ``clusters_dropped`` when they fall off the size-ranked cluster cap —
    pass the consumer's own size filter (e.g. PointGroup's
    cluster_npoint_thre) so the overflow counter tracks only
    accuracy-affecting drops (see ops/cluster.py::compact_labels).

    ``grid_cell`` declares that ``unit_id`` came from make_units_grid with
    this cell size. When it EQUALS the query radius, every ball-query hash
    cell holds at most ONE unit per (batch, group) — a unit's centroid stays
    inside its own cell — so candidate runs have length <= 1 and the fused
    W=1 schedule replaces the whole edge-buffer machinery (no run scans, no
    re-interleave sort, nothing ever dropped). Bit-identical to the edge path
    (tests/test_cluster.py::test_window1_matches_edge)."""
    from minsu3d_tpu.ops.cluster import cluster_points, cluster_units

    ef = caps.edge_factor if edge_factor is None else edge_factor
    if unit_id is not None and caps.unit_clustering:
        if u_cap is None:
            u_cap = caps.cluster_units
        # single-occupancy unit grids take the DIRECT grid query (one
        # exact-match lookup per pruned cell offset, no run/window/edge
        # machinery, nothing dropped) whenever radius <= bq_grid_max_m cells:
        # m=1 is bit-identical to the old fused W=1 path, m=2 replaces the
        # edge-buffer path (golden-AP validated; set bq_grid_max_m=1 to
        # restore the edge path for the shifted grid)
        m_cells = math.ceil(radius / grid_cell - 1e-9) if grid_cell > 0 else 99
        grid_direct = grid_cell if m_cells <= caps.bq_grid_max_m else 0.0
        # units aggregate ~(r/voxel)^3 points, so much smaller K/window suffice
        return cluster_units(coords, batch_ids, active, group, unit_id,
                             u_cap, radius, max(caps.neighbors // 2, 8),
                             max(caps.window // 4, 8),
                             caps.clusters, caps.cc_iters,
                             half_space=caps.half_space,
                             edge_cap=0 if grid_direct else ef * u_cap,
                             grid_cell=grid_direct, coarsen=caps.cc_coarsen,
                             coarsen_sweeps=caps.cc_coarsen_sweeps,
                             big_thre=big_thre)
    return cluster_points(coords, batch_ids, active, group, radius,
                          caps.neighbors, caps.window, caps.clusters, caps.cc_iters,
                          half_space=caps.half_space,
                          edge_cap=ef * coords.shape[0], coarsen=caps.cc_coarsen,
                          coarsen_sweeps=caps.cc_coarsen_sweeps,
                          big_thre=big_thre)


def get_segmented_scores(scores: jax.Array, fg_thresh: float, bg_thresh: float) -> jax.Array:
    """Piecewise-linear soft targets (reference general_model.py:196-213)."""
    fg = scores > fg_thresh
    bg = scores < bg_thresh
    k = 1.0 / max(fg_thresh - bg_thresh, 1e-12)
    b = bg_thresh / (bg_thresh - fg_thresh) if fg_thresh != bg_thresh else 0.0
    mid = scores * k + b
    return jnp.where(fg, 1.0, jnp.where(bg, 0.0, mid))


def semantic_loss(semantic_scores: jax.Array, sem_labels: jax.Array) -> jax.Array:
    """Cross entropy with ignore_index=-1 (reference general_model.py:39-41)."""
    valid = sem_labels >= 0
    labels = jnp.maximum(sem_labels, 0)
    logp = jax.nn.log_softmax(semantic_scores, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    m = valid.astype(jnp.float32)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def shared_losses(batch: dict, output: dict) -> dict:
    """Semantic + offset losses (reference general_model.py:36-50)."""
    losses = {"semantic_loss": semantic_loss(output["semantic_scores"], batch["sem_labels"])}
    gt_offsets = batch["instance_center_xyz"] - batch["point_xyz"]
    valid = (batch["instance_ids"] != -1) & batch["point_mask"]
    norm_l, dir_l = pt_offset_loss(output["point_offsets"], gt_offsets, valid)
    losses["offset_norm_loss"] = norm_l
    losses["offset_dir_loss"] = dir_l
    return losses


def clusters_voxelization(rows: ProposalRows, p_cap: int, feats: jax.Array,
                          coords: jax.Array, scale: float, spatial_shape: int,
                          rng: jax.Array, pv_caps: list[int]):
    """Re-voxelize each proposal into its own normalized mini-grid
    (reference general_model.py:152-193). Returns (plan, row2voxel) — the
    proposal id doubles as the grid's batch axis, so downstream segment ops
    can pool per proposal via ``plan.levels[0].batch``.
    """
    pid = jnp.where(rows.valid, rows.prop_id, p_cap)
    c = coords[rows.point_idx]
    f = feats[rows.point_idx]
    f = jnp.where(rows.valid[:, None], f, 0)

    mean = segment.sec_mean(c, pid, rows.valid, p_cap)           # (P, 3)
    c = c - mean[jnp.minimum(pid, p_cap - 1)]
    cmin = segment.sec_min(c, pid, rows.valid, p_cap)
    cmax = segment.sec_max(c, pid, rows.valid, p_cap)

    extent = jnp.max((cmax - cmin) / spatial_shape, axis=1)       # (P,)
    cluster_scale = 1.0 / jnp.maximum(extent, 1e-12) - 0.01
    cluster_scale = jnp.minimum(cluster_scale, scale)
    min_xyz = cmin * cluster_scale[:, None]
    max_xyz = cmax * cluster_scale[:, None]

    c = c * cluster_scale[jnp.minimum(pid, p_cap - 1), None]

    rng1, rng2 = jax.random.split(rng)
    rnd1 = jax.random.uniform(rng1, (3,))
    rnd2 = jax.random.uniform(rng2, (3,))
    span = max_xyz - min_xyz
    offset = (-min_xyz
              + jnp.maximum(spatial_shape - span - 0.001, 0) * rnd1[None, :]
              + jnp.minimum(spatial_shape - span + 0.001, 0) * rnd2[None, :])
    c = c + offset[jnp.minimum(pid, p_cap - 1)]
    grid = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, spatial_shape + 2)

    plan, row2voxel, voxel_feats = sparse.build_plan(
        pid, grid, rows.valid, pv_caps, len(pv_caps), f)
    return plan, row2voxel, voxel_feats


def devoxelize_rows(voxel_out: jax.Array, row2voxel: jax.Array) -> jax.Array:
    """Proposal-voxel features back to membership rows (score/mask heads)."""
    from minsu3d_tpu.ops.sparse_conv import ext_zero

    return ext_zero(voxel_out)[row2voxel]


def clusters_voxelization_dense(rows: ProposalRows, p_cap: int, feats: jax.Array,
                                coords: jax.Array, scale: float, spatial_shape: int,
                                rng: jax.Array):
    """Proposal re-voxelization into DENSE (P, S, S, S, C) volumes.

    Same normalization/jitter math as the reference (general_model.py:152-193)
    but scattering into dense per-proposal volumes instead of building a sparse
    coordinate map — proposal grids are tiny (S = 14..20), so the downstream
    refinement UNet runs as masked dense 3D convs on the MXU with zero
    coordinate hashing mid-forward.

    Returns (volume (P,S,S,S,C), occupancy (P,S,S,S), row_cell (R,) flat cell
    index for devoxelization, = P*S^3 for invalid rows).
    """
    s = spatial_shape
    pid = jnp.where(rows.valid, rows.prop_id, p_cap)
    c = coords[rows.point_idx]
    f = feats[rows.point_idx]
    f = jnp.where(rows.valid[:, None], f, 0)

    mean = segment.sec_mean(c, pid, rows.valid, p_cap)
    c = c - mean[jnp.minimum(pid, p_cap - 1)]
    cmin = segment.sec_min(c, pid, rows.valid, p_cap)
    cmax = segment.sec_max(c, pid, rows.valid, p_cap)

    extent = jnp.max((cmax - cmin) / s, axis=1)
    cluster_scale = jnp.minimum(1.0 / jnp.maximum(extent, 1e-12) - 0.01, scale)
    min_xyz = cmin * cluster_scale[:, None]
    max_xyz = cmax * cluster_scale[:, None]
    c = c * cluster_scale[jnp.minimum(pid, p_cap - 1), None]

    rng1, rng2 = jax.random.split(rng)
    span = max_xyz - min_xyz
    offset = (-min_xyz
              + jnp.maximum(s - span - 0.001, 0) * jax.random.uniform(rng1, (3,))[None, :]
              + jnp.minimum(s - span + 0.001, 0) * jax.random.uniform(rng2, (3,))[None, :])
    c = c + offset[jnp.minimum(pid, p_cap - 1)]
    grid = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, s - 1)

    n_cells = p_cap * s * s * s
    cell = ((pid * s + grid[:, 0]) * s + grid[:, 1]) * s + grid[:, 2]
    cell = jnp.where(rows.valid, cell, n_cells).astype(jnp.int32)

    # duplicate cells: first row wins (deterministic, matching the sparse
    # path / ME.sparse_quantize representative rule — rows are already in
    # proposal-membership order, the stable analogue of ME's key order)
    row_ids = jnp.arange(cell.shape[0], dtype=jnp.int32)
    first_row = jnp.full((n_cells + 1,), jnp.int32(2**31 - 1)).at[cell].min(
        jnp.where(rows.valid, row_ids, jnp.int32(2**31 - 1)))
    winner = rows.valid & (first_row[jnp.minimum(cell, n_cells)] == row_ids)
    cell_w = jnp.where(winner, cell, n_cells)

    n_feat = feats.shape[1]
    volume = jnp.zeros((n_cells + 1, n_feat), feats.dtype).at[cell_w].set(f)[:n_cells]
    occ = jnp.zeros((n_cells + 1,), bool).at[cell_w].set(rows.valid)[:n_cells]
    volume = volume.reshape(p_cap, s, s, s, n_feat)
    occ = occ.reshape(p_cap, s, s, s)
    return volume, occ, cell


def devoxelize_dense(volume: jax.Array, row_cell: jax.Array) -> jax.Array:
    """Dense proposal-volume features back to membership rows."""
    from minsu3d_tpu.ops.sparse_conv import ext_zero

    flat = volume.reshape(-1, volume.shape[-1])
    return ext_zero(flat)[row_cell]

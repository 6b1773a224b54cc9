"""Sparse voxel grid plans — the TPU-native replacement for MinkowskiEngine's
CoordinateManager + kernel maps (used by reference minsu3d/model/module/
backbone.py:38 and common.py:85-95).

A ``GridPlan`` is built once per batch from the (padded) voxel coordinates and
then drives every sparse convolution in a network:

  * each UNet level holds a sorted fixed-capacity key table of its voxel
    coordinates (stride ``2^l`` in units of level-l cells),
  * ``nbr_idx`` gives, per voxel, the indices of its 3^3 neighbors at the same
    level (capacity value = missing → gathers a zero row): the kernel map of a
    submanifold/stride-1 conv,
  * ``parent_idx``/``child_kid`` link level l to level l+1 (parent coordinate
    = child >> 1): the kernel map of the k2s2 strided conv and its transpose.

Everything is static-shape and jittable; overflow beyond a level's capacity is
dropped deterministically (tracked in ``n_dropped``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from minsu3d_tpu.ops import hashing as hs

# 3^3 neighbor offsets, k = (dx+1)*9 + (dy+1)*3 + (dz+1); center is k=13.
KERNEL_OFFSETS = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]


class Level(NamedTuple):
    khi: jax.Array          # (V,) sorted keys (major)
    klo: jax.Array          # (V,) sorted keys (minor)
    coords: jax.Array       # (V, 3) int32 coords at this level's resolution
    batch: jax.Array        # (V,) int32 batch (or proposal) id
    valid: jax.Array        # (V,) bool
    count: jax.Array        # () int32 number of valid voxels
    n_dropped: jax.Array    # () int32 voxels lost to capacity overflow
    nbr_idx: Optional[jax.Array] = None     # (V, 27) same-level kernel map
    parent_idx: Optional[jax.Array] = None  # (V,) index into next level (cap_p = missing)
    child_kid: Optional[jax.Array] = None   # (V,) which of 8 k2s2 taps (0..7)
    # compact per-tap kernel map (sparse_conv.add_tap_lists): for each of the
    # 26 non-center taps, the MONOTONE compacted (source, target) index lists
    # of the tap's real neighbor pairs (cap = padding), grouped by tap class
    # (face/edge/corner — sparse_conv.TAP_CLASSES) with per-class capacities.
    # Lets subm convs gather only the ~18% real rows at the structured-gather
    # rate instead of paying the zero-row gather for all 27*V slots.
    tap_src: Optional[tuple] = None         # 3x (g, E_class) source voxel
    tap_tgt: Optional[tuple] = None         # 3x (g, E_class) target voxel
    tap_dropped: Optional[jax.Array] = None  # () pairs lost to E overflow
    # blocked-window kernel map (sparse_conv.add_block_meta): neighbor
    # indices rebased to per-block halo windows so subm convs gather from a
    # sequentially-sliced (block + 2*halo, C) window instead of paying the
    # random-HBM row fetch across the whole table (measured 1.7-2.2x on the
    # conv; tools/microbench_blocked_conv.py). The rare pairs outside the
    # halo go to a compact fixup list so the result stays exact.
    blk_li: Optional[jax.Array] = None      # (nblk, B, 27) window-local idx,
    #                                         sentinel B+2H = appended zero row
    blk_halo: Optional[jax.Array] = None    # (H,) int8 zeros — carries the
    #                                         static halo H in its shape
    fix_src: Optional[jax.Array] = None     # (F,) source voxel (cap = pad)
    fix_tgt: Optional[jax.Array] = None     # (F,) target voxel (cap = pad)
    fix_tap: Optional[jax.Array] = None     # (F,) tap id of the pair
    fix_dropped: Optional[jax.Array] = None  # () pairs lost to F overflow
    # z-run slice kernel map (sparse_conv.add_zslice_meta): the table is
    # sorted by (batch, x, y, z) with z minor, so for each of the 9 (dx, dy)
    # offset columns the up-to-3 dz-neighbors of a voxel occupy CONSECUTIVE
    # rows — one 3-row window gather per column replaces three random row
    # gathers (27 -> 9 gathered rows per output). Exact by construction.
    z_base: Optional[jax.Array] = None      # (V, 9) first row of the dz run
    #                                         (cap = column empty)
    z_pos: Optional[jax.Array] = None       # (V, 9, 3) window row of tap dz
    #                                         (0..2; 3 = tap absent)
    # blocked z-run kernel map (sparse_conv.add_block_meta_z): the z-run
    # structure above, rebased to per-block halo windows — each window gathers
    # 9 three-row column slices per output instead of 27 single rows, with
    # the same beyond-halo fixup list as blk_li (fields shared).
    blk_zb: Optional[jax.Array] = None      # (nblk, B, 9) window-local run
    #                                         base; sentinel B+2H+2 = zero
    blk_zp: Optional[jax.Array] = None      # (nblk, B, 9, 3) int8 window row
    #                                         of tap dz (0..2; 3 = absent)

    @property
    def cap(self) -> int:
        return self.khi.shape[0]


class GridPlan(NamedTuple):
    levels: tuple  # tuple[Level, ...], fine → coarse


def build_base(batch: jax.Array, coords: jax.Array, valid: jax.Array, cap: int,
               feats: jax.Array | None = None):
    """Build a level-0 table from (possibly duplicated) coordinate rows.

    Duplicate coordinates are merged (first row in key order wins — matching
    the representative-point voxelization of ME.utils.sparse_quantize used at
    reference general_dataset.py:159-163). Returns (Level, row2voxel, feats_v)
    where ``row2voxel`` maps each input row to its voxel index (= cap for
    invalid/dropped rows) and ``feats_v`` are the representative features
    (None if ``feats`` is None).
    """
    n_rows = batch.shape[0]
    coords = jnp.clip(coords, 0, hs.COORD_MAX - 1)
    khi, klo = hs.pack(batch, coords)
    khi, klo = hs.mask_invalid(khi, klo, valid)
    perm = hs.lexsort_pairs(khi, klo)
    s_hi, s_lo = khi[perm], klo[perm]
    s_valid = valid[perm]
    first, seg, n_uni = hs.unique_sorted(s_hi, s_lo, s_valid)

    # scatter first-occurrence rows into the compacted table
    target = jnp.where(first & (seg < cap), seg, cap)
    v_khi = jnp.full((cap + 1,), hs.SENTINEL, jnp.int32).at[target].set(s_hi)[:cap]
    v_klo = jnp.full((cap + 1,), hs.SENTINEL, jnp.int32).at[target].set(s_lo)[:cap]
    n_valid = jnp.minimum(n_uni, cap)
    v_valid = jnp.arange(cap) < n_valid
    _, v_coords = hs.unpack(v_khi, v_klo)
    v_coords = jnp.where(v_valid[:, None], v_coords, 0)
    v_batch = jnp.where(v_valid, v_khi, 0)

    # map each input row to its voxel (original row order)
    seg_c = jnp.where(s_valid & (seg < cap), seg, cap)
    row2voxel = jnp.zeros((n_rows,), jnp.int32).at[perm].set(seg_c.astype(jnp.int32))

    feats_v = None
    if feats is not None:
        fs = feats[perm]
        feats_v = jnp.zeros((cap + 1,) + feats.shape[1:], feats.dtype).at[target].set(fs)[:cap]

    level = Level(
        khi=v_khi, klo=v_klo, coords=v_coords, batch=v_batch, valid=v_valid,
        count=n_valid.astype(jnp.int32),
        n_dropped=jnp.maximum(n_uni - cap, 0).astype(jnp.int32),
    )
    return level, row2voxel, feats_v


def add_neighbors(level: Level) -> Level:
    """Attach the 3^3 same-level kernel map (submanifold conv neighbor table).

    All 26 non-center offsets are resolved in a single batched lookup (one
    binary-search loop instead of 26 — matters for XLA compile time).
    """
    cap = level.cap
    offs = jnp.array([o for o in KERNEL_OFFSETS if o != (0, 0, 0)], jnp.int32)  # (26, 3)
    q = level.coords[None, :, :] + offs[:, None, :]                             # (26, V, 3)
    in_range = jnp.all((q >= 0) & (q < hs.COORD_MAX), axis=-1) & level.valid[None, :]
    q_hi, q_lo = hs.pack(jnp.broadcast_to(level.batch[None, :], q.shape[:2]),
                         jnp.clip(q, 0, hs.COORD_MAX - 1))
    q_hi, q_lo = hs.mask_invalid(q_hi, q_lo, in_range)
    idx, _, _ = hs.lookup_sorted_union(level.khi, level.klo,
                                       q_hi.reshape(-1), q_lo.reshape(-1), missing=cap)
    idx = idx.reshape(26, cap).astype(jnp.int32)

    center = jnp.where(level.valid, jnp.arange(cap, dtype=jnp.int32), cap)
    k_center = KERNEL_OFFSETS.index((0, 0, 0))
    nbr = jnp.concatenate([idx[:k_center], center[None, :], idx[k_center:]], axis=0)
    return level._replace(nbr_idx=nbr.T)


def build_parent(level: Level, cap_p: int) -> tuple[Level, Level]:
    """Build the next-coarser level (coords >> 1) and link the child to it.

    Returns (child_with_links, parent). Implements the coordinate semantics of
    ME k2s2 strided conv / its transpose (reference common.py:67-77,85-95).
    """
    p_coords = level.coords >> 1
    parent, child2parent, _ = build_base(level.batch, p_coords, level.valid, cap_p)
    kid = ((level.coords[:, 0] & 1) << 2) | ((level.coords[:, 1] & 1) << 1) | (level.coords[:, 2] & 1)
    kid = jnp.where(level.valid, kid, 0).astype(jnp.int32)
    child = level._replace(parent_idx=child2parent, child_kid=kid)
    return child, parent


def build_plan(batch: jax.Array, coords: jax.Array, valid: jax.Array,
               caps: list[int], num_levels: int,
               feats: jax.Array | None = None):
    """Build a full UNet grid plan (all levels, kernel maps, down/up links).

    ``caps[l]`` is the voxel capacity of level l. Returns
    (GridPlan, row2voxel, feats_level0).
    """
    level0, row2voxel, feats_v = build_base(batch, coords, valid, caps[0], feats)
    levels = [level0]
    for l in range(1, num_levels):
        child, parent = build_parent(levels[-1], caps[l])
        levels[-1] = child
        levels.append(parent)
    levels = [add_neighbors(lv) for lv in levels]
    return GridPlan(levels=tuple(levels)), row2voxel, feats_v

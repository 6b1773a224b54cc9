"""Functional sparse convolution primitives over :mod:`ops.sparse` grid plans.

TPU-native gather-GEMM-scatter replacing MinkowskiEngine's convolutions
(reference minsu3d/model/module/common.py, backbone.py):

  * ``subm_conv``   — 3^3 stride-1 conv on the level's own coordinates
                      (= ME.MinkowskiConvolution(k=3, s=1); ME stride-1 convs
                      emit outputs on the input coordinate map)
  * ``down_conv``   — k2s2 strided conv to the parent level
                      (= ME.MinkowskiConvolution(k=2, s=2))
  * ``up_conv``     — k2s2 transposed conv back to the child level
                      (= ME.MinkowskiConvolutionTranspose(k=2, s=2))

All taps are dense (V, Cin) x (Cin, Cout) GEMMs on the MXU; neighbor gathers
read a zero row at index ``cap`` for missing taps, so no masks enter the
matmul path. Neighbor taps are processed in groups: a group of g taps becomes
one (V, g*Cin) x (g*Cin, Cout) GEMM, trading HBM traffic for MXU-friendly
contraction depth.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minsu3d_tpu.ops.sparse import KERNEL_OFFSETS as _OFFS
from minsu3d_tpu.ops.sparse import Level


def _mm(a: jax.Array, b: jax.Array, compute_dtype=None) -> jax.Array:
    # compute_dtype=bfloat16 -> fast MXU path (bf16 multiply, f32 accumulate);
    # compute_dtype=None/float32 -> exact f32 ('highest' = multi-pass on TPU).
    precision = None
    if compute_dtype is not None:
        a = a.astype(compute_dtype)
        b = b.astype(compute_dtype)
    if compute_dtype in (None, jnp.float32, "float32"):
        precision = jax.lax.Precision.HIGHEST
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )


def ext_zero(feats: jax.Array) -> jax.Array:
    """Append a zero row: index ``cap`` gathers zeros (missing neighbor)."""
    return jnp.concatenate([feats, jnp.zeros((1,) + feats.shape[1:], feats.dtype)], axis=0)


def subm_conv(feats: jax.Array, level: Level, weight: jax.Array,
              compute_dtype=None, tap_group: int = 27) -> jax.Array:
    """3^3 submanifold convolution. feats (V, Cin), weight (27, Cin, Cout)."""
    v, cin = feats.shape
    cout = weight.shape[-1]
    fe = ext_zero(feats)
    out = jnp.zeros((v, cout), jnp.float32)
    for g0 in range(0, 27, tap_group):
        g1 = min(g0 + tap_group, 27)
        g = g1 - g0
        gathered = fe[level.nbr_idx[:, g0:g1]]            # (V, g, Cin)
        w = weight[g0:g1].reshape(g * cin, cout)
        out = out + _mm(gathered.reshape(v, g * cin), w, compute_dtype)
    return out.astype(feats.dtype)


def down_conv(feats: jax.Array, child: Level, parent_cap: int, weight: jax.Array,
              compute_dtype=None) -> jax.Array:
    """k2s2 strided conv: child level -> parent level. weight (8, Cin, Cout)."""
    v, cin = feats.shape
    cout = weight.shape[-1]
    contrib = jnp.zeros((v, cout), jnp.float32)
    for k in range(8):
        masked = jnp.where((child.child_kid == k)[:, None], feats, 0)
        contrib = contrib + _mm(masked, weight[k], compute_dtype)
    contrib = jnp.where(child.valid[:, None], contrib, 0)
    out = jnp.zeros((parent_cap + 1, cout), jnp.float32).at[child.parent_idx].add(contrib)
    return out[:parent_cap].astype(feats.dtype)


def up_conv(parent_feats: jax.Array, child: Level, weight: jax.Array,
            compute_dtype=None) -> jax.Array:
    """k2s2 transposed conv: parent level -> child level. weight (8, Cp, Cc)."""
    pf = ext_zero(parent_feats)[child.parent_idx]          # (V, Cp)
    v = pf.shape[0]
    cout = weight.shape[-1]
    out = jnp.zeros((v, cout), jnp.float32)
    for k in range(8):
        masked = jnp.where((child.child_kid == k)[:, None], pf, 0)
        out = out + _mm(masked, weight[k], compute_dtype)
    out = jnp.where(child.valid[:, None], out, 0)
    return out.astype(parent_feats.dtype)


# -- compact per-tap kernel maps ----------------------------------------------
#
# The dense subm_conv gathers all 27*V neighbor slots even though only ~18%
# hold a real neighbor at level 0 (the rest fetch the zero row) — and the
# measured cost of an XLA gather on this TPU is per ROW (~3-5 ns), regardless
# of row width or validity. For a FIXED tap offset o the valid (target,
# source) pairs are MONOTONE in both coordinates: voxel tables are sorted by
# (batch, x, y, z) key, and adding a constant offset preserves that order, so
# compacting each tap's pairs keeps the structured-gather rate while skipping
# the zero rows. One cumsum + one scatter per level (amortized over every
# subm conv at that level) builds the lists from ``nbr_idx``; the conv then
# pays 2*E rows (gather + scatter-add) per tap instead of V, a win whenever
# the tap density is below ~50%. Overflow beyond ``e_cap`` drops pairs —
# surfaced in ``tap_dropped`` and plumbed to ``out["diag"]`` (accuracy, not
# speed, degrades on overflow, exactly like the edge-buffer ball query).

# non-center taps grouped by |offset|_1: 6 face, 12 edge, 8 corner taps. The
# measured per-tap pair density is strongly class-dependent (probe_tap_density
# on bench scenes: L0 face<=0.23*cap, edge<=0.15, corner<=0.07), so each class
# gets its own static capacity — a uniform per-tap cap would waste ~2x.
TAP_CLASSES = tuple(
    tuple(k for k in range(27) if k != 13
          and sum(abs(c) for c in _OFFS[k]) == d) for d in (1, 2, 3))
# edge/corner capacity as a fraction of the face capacity (measured ratios
# are ~0.65/0.35 across levels; headroom on top — overflow shows up in
# diag/tap_dropped, never as a silent slowdown)
TAP_CLASS_SCALE = (1.0, 0.75, 0.45)


def add_tap_lists(level: Level, e_cap: int,
                  class_caps: tuple | None = None) -> Level:
    """Attach compact per-tap (source, target) pair lists to a level.

    ``e_cap`` is the static FACE-tap pair capacity; edge/corner taps get
    ``TAP_CLASS_SCALE`` fractions of it unless ``class_caps`` gives all
    three capacities explicitly. Real per-tap counts beyond the class
    capacity are dropped (prefix rule, count in ``tap_dropped``)."""
    cap = level.cap
    if class_caps is None:
        class_caps = tuple(int(round(s * e_cap)) for s in TAP_CLASS_SCALE)
    srcs, tgts = [], []
    dropped = jnp.int32(0)
    for tap_ids, ecap_cls in zip(TAP_CLASSES, class_caps):
        ecls = max(int(ecap_cls), 8)
        g = len(tap_ids)
        nt = level.nbr_idx.T[jnp.array(tap_ids)]             # (g, V)
        valid = nt < cap
        pos = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1  # rank - 1
        counts = pos[:, -1] + 1                               # (g,) valid pairs
        slot = jnp.where(valid & (pos < ecls), pos, ecls)
        flat = (jnp.arange(g, dtype=jnp.int32)[:, None] * (ecls + 1) + slot).reshape(-1)
        tgt_rows = jnp.broadcast_to(jnp.arange(cap, dtype=jnp.int32)[None, :], (g, cap))
        pairs = jnp.stack([nt, tgt_rows], axis=-1).reshape(-1, 2)
        table = jnp.full((g * (ecls + 1), 2), cap, jnp.int32).at[flat].set(pairs)
        table = table.reshape(g, ecls + 1, 2)[:, :ecls]
        srcs.append(table[..., 0])
        tgts.append(table[..., 1])
        dropped = dropped + jnp.sum(jnp.maximum(counts - ecls, 0))
    return level._replace(tap_src=tuple(srcs), tap_tgt=tuple(tgts),
                          tap_dropped=dropped)


def subm_conv_tap(feats: jax.Array, level: Level, weight: jax.Array,
                  compute_dtype=None) -> jax.Array:
    """3^3 submanifold conv over compact per-tap pair lists (add_tap_lists).

    Numerically the same contraction as :func:`subm_conv` (f32 accumulation)
    with a different summation order: center tap as one aligned GEMM, each
    tap class as one batched gather-GEMM + scatter-add."""
    v, cin = feats.shape
    cout = weight.shape[-1]
    # center tap: row-aligned, no gather (invalid rows masked — the dense
    # path reads the zero row for them)
    center = _mm(jnp.where(level.valid[:, None], feats, 0), weight[13],
                 compute_dtype)                              # (V, Cout) f32
    fe = ext_zero(feats)
    out = jnp.zeros((v + 1, cout), jnp.float32)
    precision = (jax.lax.Precision.HIGHEST
                 if compute_dtype in (None, jnp.float32, "float32") else None)
    for tap_ids, src, tgt in zip(TAP_CLASSES, level.tap_src, level.tap_tgt):
        g = fe[src]                                          # (g, E, Cin)
        w = weight[jnp.array(tap_ids)]                       # (g, Cin, Cout)
        if compute_dtype is not None:
            g = g.astype(compute_dtype)
            w = w.astype(compute_dtype)
        contrib = jax.lax.dot_general(
            g, w, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=precision)
        out = out.at[tgt.reshape(-1)].add(contrib.reshape(-1, cout))
    return (out[:v] + center).astype(feats.dtype)


# -- blocked-window submanifold conv ------------------------------------------
#
# The dense subm_conv pays the random-HBM row-fetch cost for all 27*V
# neighbor gathers (~512 B HBM transaction to use a 32 B row). But the voxel
# table is sorted by (batch, x, y, z), so neighbor indices are NEAR-DIAGONAL:
# on bench-scale plans the max |nbr - row| is ~2.2k at level 0 and shrinks by
# ~2x per level (tools: probe via microbench_blocked_conv.py). Processing
# rows in blocks of B, one sequential dynamic-slice of the (B + 2H, C) halo
# window per block turns the whole conv's HBM traffic into streams, and the
# 27-tap gather runs window-local where XLA keeps it on-chip — measured
# 2.2x (C=16) / 1.5x (C=32) vs the row-gather form on this TPU, bitwise
# equal (same single (B, 27C) x (27C, Cout) contraction per row).
#
# Pairs reaching beyond the halo (dense wall-parallel planes in real scans
# can exceed any fixed H) go to a compact (src, tgt, tap) fixup list applied
# by scatter-add, so the conv stays EXACT for any scene; fixup overflow
# beyond the static capacity is counted in ``fix_dropped`` and surfaced in
# ``out["diag"]`` like tap/edge overflow. When the fixup list is empty the
# result is bit-identical to subm_conv.


def add_block_meta(level: Level, halo: int, block: int | None = None,
                   fix_cap: int | None = None) -> Level:
    """Attach blocked-window conv metadata to a level.

    ``halo`` rows of context on each side of a ``block``-row window (block
    auto-picked as the largest of 4096/2048/1024 dividing the cap). Neighbor
    pairs farther than the halo go to a ``fix_cap`` fixup list (default
    cap/32, floor 1024)."""
    cap = level.cap
    if block is None:
        block = next((b for b in (4096, 2048, 1024, 512, 256, 128, 64)
                      if cap % b == 0), 0)
    if not block or cap % block or level.nbr_idx is None:
        return level
    if fix_cap is None:
        fix_cap = max(cap // 32, 1024)
    s = block + 2 * halo
    nbr = level.nbr_idx                                   # (V, 27)
    r = jnp.arange(cap, dtype=jnp.int32)
    li = nbr - ((r // block) * block)[:, None] + halo     # window-local
    valid = nbr < cap
    inwin = valid & (li >= 0) & (li < s)
    blk_li = jnp.where(inwin, li, s).reshape(cap // block, block, 27)
    m = (valid & ~inwin).reshape(-1)
    pos = jnp.cumsum(m.astype(jnp.int32)) - 1
    total = jnp.where(m.shape[0] > 0, pos[-1] + 1, 0)
    slot = jnp.where(m & (pos < fix_cap), pos, fix_cap)
    tgt_all = jnp.broadcast_to(r[:, None], (cap, 27)).reshape(-1)
    tap_all = jnp.broadcast_to(jnp.arange(27, dtype=jnp.int32)[None, :],
                               (cap, 27)).reshape(-1)
    fix_src = jnp.full((fix_cap + 1,), cap, jnp.int32).at[slot].set(
        jnp.where(m, nbr.reshape(-1), cap))[:fix_cap]
    fix_tgt = jnp.full((fix_cap + 1,), cap, jnp.int32).at[slot].set(
        jnp.where(m, tgt_all, cap))[:fix_cap]
    fix_tap = jnp.full((fix_cap + 1,), 13, jnp.int32).at[slot].set(
        jnp.where(m, tap_all, 13))[:fix_cap]
    return level._replace(
        blk_li=blk_li, blk_halo=jnp.zeros((halo,), jnp.int8),
        fix_src=fix_src, fix_tgt=fix_tgt, fix_tap=fix_tap,
        fix_dropped=jnp.maximum(total - fix_cap, 0))


def subm_conv_blocked(feats: jax.Array, level: Level, weight: jax.Array,
                      compute_dtype=None) -> jax.Array:
    """3^3 submanifold conv over blocked halo windows (add_block_meta).

    Bit-identical to :func:`subm_conv` (tap_group=27) when the fixup list is
    empty: each output row is the same single 27*Cin-deep f32-accumulated
    contraction. Fixup contributions (pairs beyond the halo) are added after
    the window GEMM — exact values, f32 summation order differs for exactly
    those rows."""
    v, cin = feats.shape
    nblk, block, _ = level.blk_li.shape
    halo = level.blk_halo.shape[0]
    s_win = block + 2 * halo
    cout = weight.shape[-1]
    precision = (jax.lax.Precision.HIGHEST
                 if compute_dtype in (None, jnp.float32, "float32") else None)
    xw = feats if compute_dtype is None else feats.astype(compute_dtype)
    w2 = weight.reshape(27 * cin, cout)
    if compute_dtype is not None:
        w2 = w2.astype(compute_dtype)
    xp = jnp.pad(xw, ((halo, halo + 1), (0, 0)))
    starts = jnp.arange(nblk, dtype=jnp.int32) * block
    zero = jnp.zeros((1, cin), xw.dtype)

    def step(carry, si):
        s0, li = si
        win = jnp.concatenate(
            [jax.lax.dynamic_slice(xp, (s0, 0), (s_win, cin)), zero])
        g = win[li]                                       # (B, 27, Cin)
        ob = jax.lax.dot_general(
            g.reshape(block, 27 * cin), w2,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        return carry, ob

    # unroll=2: two window bodies per scan iteration let XLA software-pipeline
    # window i+1's dynamic-slice against window i's GEMM (+4% on the real
    # level-0/1 kernel maps, bit-identical — tools/microbench_unroll.py;
    # deeper unrolls measured no better)
    _, ys = jax.lax.scan(step, 0, (starts, level.blk_li), unroll=2)
    out = ys.reshape(v, cout)                             # f32
    if level.fix_src is not None:
        fe = ext_zero(feats)
        xs = fe[level.fix_src]                            # (F, Cin)
        wt = weight[level.fix_tap]                        # (F, Cin, Cout)
        if compute_dtype is not None:
            xs = xs.astype(compute_dtype)
            wt = wt.astype(compute_dtype)
        contrib = jax.lax.dot_general(
            xs[:, None, :], wt,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=precision)[:, 0]
        out = jnp.concatenate([out, jnp.zeros((1, cout), out.dtype)])
        out = out.at[jnp.minimum(level.fix_tgt, v)].add(contrib)[:v]
    return out.astype(feats.dtype)


def subm_conv_blocked_vjp(feats: jax.Array, level: Level, weight: jax.Array,
                          compute_dtype=None) -> jax.Array:
    """:func:`subm_conv_blocked` with a hand-written gather-form backward.

    Autodiff of the blocked forward transposes the window scan into
    scatter-adds (dg rows scattered into halo windows, windows accumulated
    into the padded table) and saves every window's (B, 27, Cin) gathered
    table for the weight gradient — the HBM hog that forces block-level
    remat. This VJP instead:

      * ``dx`` = the SAME blocked conv applied to ``dout`` with the taps
        flipped and the kernel transposed (``flip(W, 0).swapaxes(1, 2)``) —
        a 3^3 submanifold conv's transpose is itself a 3^3 submanifold conv
        with negated offsets (tap k <-> 26-k in KERNEL_OFFSETS order), and
        the level's own kernel map already classifies every (row, tap) pair
        from the target row's perspective (window vs fixup), so gathers
        replace all scatters;
      * ``dW`` = one window scan that recomputes each gathered table and
        contracts it with the matching ``dout`` block (plus the fixup pairs'
        outer products) — residuals are just (feats, weight), nothing 27x.

    Pairs dropped from the fixup list are dropped identically in forward
    and backward, so these are exact gradients of the computed function.
    """

    @jax.custom_vjp
    def f(feats, weight):
        return subm_conv_blocked(feats, level, weight, compute_dtype)

    def f_fwd(feats, weight):
        return f(feats, weight), (feats, weight)

    def f_bwd(res, dout):
        feats, weight = res
        v, cin = feats.shape
        cout = weight.shape[-1]
        nblk, block, _ = level.blk_li.shape
        halo = level.blk_halo.shape[0]
        s_win = block + 2 * halo
        precision = (jax.lax.Precision.HIGHEST
                     if compute_dtype in (None, jnp.float32, "float32") else None)
        w_flip = jnp.flip(weight, 0).swapaxes(1, 2)       # (27, Cout, Cin)
        dx = subm_conv_blocked(dout, level, w_flip,
                               compute_dtype).astype(feats.dtype)
        xw = feats if compute_dtype is None else feats.astype(compute_dtype)
        dyw = dout if compute_dtype is None else dout.astype(compute_dtype)
        xp = jnp.pad(xw, ((halo, halo + 1), (0, 0)))
        dy_blk = dyw.reshape(nblk, block, cout)
        starts = jnp.arange(nblk, dtype=jnp.int32) * block
        zero = jnp.zeros((1, cin), xw.dtype)

        def step(dw, si):
            s0, li, dy = si
            win = jnp.concatenate(
                [jax.lax.dynamic_slice(xp, (s0, 0), (s_win, cin)), zero])
            g = win[li]                                   # (B, 27, Cin)
            return dw + jax.lax.dot_general(
                g, dy, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision), None

        dw, _ = jax.lax.scan(step, jnp.zeros((27, cin, cout), jnp.float32),
                             (starts, level.blk_li, dy_blk), unroll=2)
        if level.fix_src is not None:
            # beyond-halo pairs: sentinel src/tgt index the appended zero row
            xs = ext_zero(xw)[level.fix_src].astype(jnp.float32)
            dt = ext_zero(dyw)[jnp.minimum(level.fix_tgt, v)].astype(jnp.float32)
            dw = dw.at[level.fix_tap].add(xs[:, :, None] * dt[:, None, :])
        return dx, dw.astype(weight.dtype)

    f.defvjp(f_fwd, f_bwd)
    return f(feats, weight)


# -- blocked z-run submanifold conv --------------------------------------------
#
# Combines the two structures above: blocked halo windows turn the conv's HBM
# traffic into streams, and WITHIN each window the z-run property (the up-to-3
# dz neighbors of a (dx, dy) column occupy consecutive table rows — see the
# z-run slice section below) cuts the gathered rows from 27 to 9 per output.
# The standalone z-slice conv LOST 2-4x because its (V, 9, 3, C) aligned
# tensor materialized in HBM; inside the window scan the slices, selects and
# reshape all stay in VMEM where the realignment is nearly free. Exact like
# subm_conv_blocked: beyond-halo pairs go to the same fixup list.


def add_block_meta_z(level: Level, halo: int, block: int | None = None,
                     fix_cap: int | None = None) -> Level:
    """Attach blocked z-run conv metadata to a level (see add_block_meta)."""
    cap = level.cap
    if block is None:
        block = next((b for b in (4096, 2048, 1024, 512, 256, 128, 64)
                      if cap % b == 0), 0)
    if not block or cap % block or level.nbr_idx is None:
        return level
    if fix_cap is None:
        fix_cap = max(cap // 32, 1024)
    s = block + 2 * halo
    m = level.nbr_idx.reshape(cap, 9, 3)                  # taps k = 3*o + dz
    base = jnp.min(m, axis=-1)                            # (V, 9); cap = empty
    zpos = jnp.where(m < cap, m - base[..., None], 3).astype(jnp.int8)
    r = jnp.arange(cap, dtype=jnp.int32)
    bl = base - ((r // block) * block)[:, None] + halo    # window-local base
    inwin = (base < cap) & (bl >= 0) & (bl < s)
    # sentinel s + 2 indexes the all-zero fw row (subm_conv_blocked_z)
    blk_zb = jnp.where(inwin, bl, s + 2).reshape(cap // block, block, 9)
    blk_zp = zpos.reshape(cap // block, block, 9, 3)
    # fixup: every PRESENT tap of an out-of-window column (whole columns move
    # together — their window slice reads zeros)
    mv = ((m < cap) & ~inwin[..., None]).reshape(-1)
    pos = jnp.cumsum(mv.astype(jnp.int32)) - 1
    total = pos[-1] + 1
    slot = jnp.where(mv & (pos < fix_cap), pos, fix_cap)
    tgt_all = jnp.broadcast_to(r[:, None], (cap, 27)).reshape(-1)
    tap_all = jnp.broadcast_to(jnp.arange(27, dtype=jnp.int32)[None, :],
                               (cap, 27)).reshape(-1)
    fix_src = jnp.full((fix_cap + 1,), cap, jnp.int32).at[slot].set(
        jnp.where(mv, m.reshape(-1), cap))[:fix_cap]
    fix_tgt = jnp.full((fix_cap + 1,), cap, jnp.int32).at[slot].set(
        jnp.where(mv, tgt_all, cap))[:fix_cap]
    fix_tap = jnp.full((fix_cap + 1,), 13, jnp.int32).at[slot].set(
        jnp.where(mv, tap_all, 13))[:fix_cap]
    return level._replace(
        blk_zb=blk_zb, blk_zp=blk_zp, blk_halo=jnp.zeros((halo,), jnp.int8),
        fix_src=fix_src, fix_tgt=fix_tgt, fix_tap=fix_tap,
        fix_dropped=jnp.maximum(total - fix_cap, 0))


def subm_conv_blocked_z(feats: jax.Array, level: Level, weight: jax.Array,
                        compute_dtype=None) -> jax.Array:
    """3^3 submanifold conv over blocked z-run windows (add_block_meta_z).

    Same values as :func:`subm_conv` in the same single (B, 27*Cin) x
    (27*Cin, Cout) f32-accumulated contraction per row: the aligned tensor
    routes each window column's 3 consecutive rows to their dz taps by exact
    selects (absent taps select zeros). Bit-identical when the fixup list is
    empty; fixup rows reassociate exactly like subm_conv_blocked's."""
    v, cin = feats.shape
    nblk, block, _ = level.blk_zb.shape
    halo = level.blk_halo.shape[0]
    s_win = block + 2 * halo
    cout = weight.shape[-1]
    precision = (jax.lax.Precision.HIGHEST
                 if compute_dtype in (None, jnp.float32, "float32") else None)
    xw = feats if compute_dtype is None else feats.astype(compute_dtype)
    w2 = weight.reshape(27 * cin, cout)
    if compute_dtype is not None:
        w2 = w2.astype(compute_dtype)
    # slices read rows [s0, s0 + s_win + 2): pad so the last window stays
    # in bounds (s0 max = cap - block -> needs cap + 2*halo + 2 rows)
    xp = jnp.pad(xw, ((halo, halo + 2), (0, 0)))
    starts = jnp.arange(nblk, dtype=jnp.int32) * block
    zero3 = jnp.zeros((3, cin), xw.dtype)

    def step(carry, si):
        s0, zb, zp = si
        sl = jax.lax.dynamic_slice(xp, (s0, 0), (s_win + 2, cin))
        slz = jnp.concatenate([sl, zero3])                # rows s_win+2.. zero
        fw = jnp.concatenate([slz[:-2], slz[1:-1], slz[2:]], axis=1)
        g = fw[zb].reshape(block, 9, 3, cin)              # (B, 9, 3, C)
        p = zp[..., None]
        zc = jnp.zeros((1, 1, 1, cin), xw.dtype)
        aligned = jnp.where(p == 0, g[:, :, 0:1, :],
                            jnp.where(p == 1, g[:, :, 1:2, :],
                                      jnp.where(p == 2, g[:, :, 2:3, :], zc)))
        ob = jax.lax.dot_general(
            aligned.reshape(block, 27 * cin), w2,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        return carry, ob

    _, ys = jax.lax.scan(step, 0, (starts, level.blk_zb, level.blk_zp),
                         unroll=2)
    out = ys.reshape(v, cout)                             # f32
    if level.fix_src is not None:
        fe = ext_zero(feats)
        xs = fe[level.fix_src]                            # (F, Cin)
        wt = weight[level.fix_tap]                        # (F, Cin, Cout)
        if compute_dtype is not None:
            xs = xs.astype(compute_dtype)
            wt = wt.astype(compute_dtype)
        contrib = jax.lax.dot_general(
            xs[:, None, :], wt,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=precision)[:, 0]
        out = jnp.concatenate([out, jnp.zeros((1, cout), out.dtype)])
        out = out.at[jnp.minimum(level.fix_tgt, v)].add(contrib)[:v]
    return out.astype(feats.dtype)


# -- z-run slice submanifold conv ----------------------------------------------
#
# The voxel table is sorted by (batch, x, y, z) with z in the LEAST
# significant key bits (hashing.py::pack), so for a fixed (dx, dy) offset the
# three dz ∈ {-1, 0, +1} neighbors of a voxel occupy CONSECUTIVE table rows:
# any voxel keyed strictly between (x', y', z-1) and (x', y', z+1) can only be
# (x', y', z). One gather from a 3-row sliding window therefore fetches all
# three dz taps of a column at once — 9 gathered rows per output instead of
# 27 — and XLA's gather cost on this TPU is per ROW (~3-5 ns), nearly
# independent of row width (BENCH_NOTES cost model). The window rows are
# realigned to their dz taps by exact selects, so the result is BIT-IDENTICAL
# to subm_conv (same single (V, 27*Cin) x (27*Cin, Cout) contraction over the
# same values).


def add_zslice_meta(level: Level) -> Level:
    """Attach the z-run slice kernel map derived from ``nbr_idx``.

    For each of the 9 (dx, dy) columns (taps k = 3*o + dz_index):
    ``z_base[v, o]`` = smallest neighbor row of the column (cap if empty) and
    ``z_pos[v, o, dz]`` = which window row (0..2) holds the dz tap (3 = tap
    absent). Costs one (V, 27) elementwise pass per level per forward,
    amortized over every subm conv at that level."""
    if level.nbr_idx is None:
        return level
    cap = level.cap
    m = level.nbr_idx.reshape(cap, 9, 3)
    base = jnp.min(m, axis=-1)                                # (V, 9)
    pos = jnp.where(m < cap, m - base[..., None], 3).astype(jnp.int8)
    return level._replace(z_base=base, z_pos=pos)


def subm_conv_zslice(feats: jax.Array, level: Level, weight: jax.Array,
                     compute_dtype=None) -> jax.Array:
    """3^3 submanifold conv over z-run slice windows (add_zslice_meta).

    Bit-identical to :func:`subm_conv` (tap_group=27): the aligned tensor
    holds exactly the values ``feats[nbr_idx]`` would gather (window rows are
    routed to their dz taps by pure selects, absent taps select the zero
    row), and the contraction is the same single f32-accumulated GEMM."""
    v, cin = feats.shape
    cout = weight.shape[-1]
    fe3 = jnp.concatenate([feats, jnp.zeros((3, cin), feats.dtype)], axis=0)
    # (V+1, 3, C) sliding window: fw[i, r] = feats row i+r (zeros past V);
    # built by two shifted views — pure streams, no gathers
    fw = jnp.stack([fe3[:-2], fe3[1:-1], fe3[2:]], axis=1)
    g = fw[level.z_base]                                      # (V, 9, 3, C)
    # route window rows to dz taps: aligned[v, o, dz] = g[v, o, pos[v, o, dz]]
    # (zero when pos == 3). Nested selects — exact, no arithmetic.
    p = level.z_pos[..., None]                                # (V, 9, 3, 1)
    zero = jnp.zeros((1, 1, 1, cin), feats.dtype)
    aligned = jnp.where(p == 0, g[:, :, 0:1, :],
                        jnp.where(p == 1, g[:, :, 1:2, :],
                                  jnp.where(p == 2, g[:, :, 2:3, :], zero)))
    out = _mm(aligned.reshape(v, 27 * cin), weight.reshape(27 * cin, cout),
              compute_dtype)
    return out.astype(feats.dtype)


# -- channel-major (C, V) variants --------------------------------------------
#
# (V, C) activations tile to (8, 128) on TPU, padding the C axis up to 8x at
# the backbone's m=16 — every neighbor-gather row fetch then moves 128 lanes
# to use 16 (BENCH_NOTES round-2 lever 3). The channel-major layout keeps the
# BIG axis (V) minor so tiles are dense; neighbor gathers move whole (C, idx)
# columns and the tap GEMMs contract C via dot_general. Weight shapes are
# IDENTICAL to the row-major path, so checkpoints are interchangeable.


def _mm_cm(w: jax.Array, g: jax.Array, compute_dtype=None) -> jax.Array:
    """(g_taps, Cin, Cout) x (Cin, V, g_taps) -> (Cout, V), contracting
    (tap, Cin); f32 accumulate (HIGHEST for the exact-f32 path)."""
    precision = None
    if compute_dtype is not None:
        w = w.astype(compute_dtype)
        g = g.astype(compute_dtype)
    if compute_dtype in (None, jnp.float32, "float32"):
        precision = jax.lax.Precision.HIGHEST
    return jax.lax.dot_general(
        w, g, dimension_numbers=(((0, 1), (2, 0)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)


def ext_zero_cm(feats_cv: jax.Array) -> jax.Array:
    """Append a zero COLUMN: index ``cap`` gathers zeros (missing neighbor)."""
    return jnp.concatenate(
        [feats_cv, jnp.zeros(feats_cv.shape[:-1] + (1,), feats_cv.dtype)], axis=-1)


def subm_conv_cm(feats_cv: jax.Array, level: Level, weight: jax.Array,
                 compute_dtype=None, tap_group: int = 27) -> jax.Array:
    """3^3 submanifold conv, channel-major. feats_cv (Cin, V), weight
    (27, Cin, Cout) -> (Cout, V)."""
    v = feats_cv.shape[1]
    cout = weight.shape[-1]
    fe = ext_zero_cm(feats_cv)
    out = jnp.zeros((cout, v), jnp.float32)
    for g0 in range(0, 27, tap_group):
        g1 = min(g0 + tap_group, 27)
        gathered = fe[:, level.nbr_idx[:, g0:g1]]          # (Cin, V, g)
        out = out + _mm_cm(weight[g0:g1], gathered, compute_dtype)
    return out.astype(feats_cv.dtype)


def down_conv_cm(feats_cv: jax.Array, child: Level, parent_cap: int,
                 weight: jax.Array, compute_dtype=None) -> jax.Array:
    """k2s2 strided conv child -> parent, channel-major. weight (8, Cin, Cout)."""
    cout = weight.shape[-1]
    contrib = jnp.zeros((cout, feats_cv.shape[1]), jnp.float32)
    for k in range(8):
        masked = jnp.where((child.child_kid == k)[None, :], feats_cv, 0)
        contrib = contrib + _mm_cm(weight[k:k + 1], masked[:, :, None], compute_dtype)
    contrib = jnp.where(child.valid[None, :], contrib, 0)
    out = jnp.zeros((cout, parent_cap + 1), jnp.float32).at[:, child.parent_idx].add(contrib)
    return out[:, :parent_cap].astype(feats_cv.dtype)


def up_conv_cm(parent_cv: jax.Array, child: Level, weight: jax.Array,
               compute_dtype=None) -> jax.Array:
    """k2s2 transposed conv parent -> child, channel-major. weight (8, Cp, Cc)."""
    pf = ext_zero_cm(parent_cv)[:, child.parent_idx]       # (Cp, V)
    cout = weight.shape[-1]
    out = jnp.zeros((cout, pf.shape[1]), jnp.float32)
    for k in range(8):
        masked = jnp.where((child.child_kid == k)[None, :], pf, 0)
        out = out + _mm_cm(weight[k:k + 1], masked[:, :, None], compute_dtype)
    out = jnp.where(child.valid[None, :], out, 0)
    return out.astype(parent_cv.dtype)

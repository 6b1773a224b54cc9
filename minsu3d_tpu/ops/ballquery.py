"""Fixed-capacity ball query via spatial grid hashing — TPU replacement for
the reference's O(N^2/batch) CUDA kernel (src/bfs_cluster/bfs_cluster.cu:15-91,
O1 in SURVEY.md §2.3).

Points are binned into cells of size ``radius``; each point scans a bounded
window of the 27 adjacent cells and keeps up to K in-radius neighbors. All 27
cell-run starts are resolved with ONE sorted-union lookup (random gathers are
the expensive primitive on TPU; sorts are cheap — see hashing.py). Output is
a dense (N, K) neighbor table with a validity mask — deterministic by
construction, unlike the reference's atomic-cursor compaction (its wrapper
even retries on overflow, functions/common_ops.py:31-38). Capping K/window
can drop edges inside very dense blobs, but those blobs stay connected through
shared cell-window candidates, which is all the downstream connected-component
pass needs.

Two schedule variants:
  * ``fused=True`` (default): ONE (N, n_off*W) candidate pass — a single
    cumsum + scatter instead of 27 serialized fori_loop steps. Same results,
    much better TPU utilization (the loop version launches 27 small
    gather/scatter kernels back-to-back).
  * ``fused=False``: the original fori_loop schedule (kept as a fallback for
    compilers that choke on the large fused gather — see BENCH_NOTES.md).

``group`` (e.g. the predicted semantic class) is folded into the hash key
when given: the downstream CC pass drops cross-group edges anyway
(bfs_cluster.cpp:28-40 same-label rule), so segregating cell runs by group
loses nothing and stops mixed-group cells from wasting window slots —
windows saturate ~2x later in dense class-boundary regions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minsu3d_tpu.ops import hashing as hs

_CELL_OFFSET = 512  # recentre cells so negative coords stay in [0, 1024)
_GROUP_SHIFT = 16   # khi = batch << 16 | group (both far below 2^15)


def ball_query(coords: jax.Array, batch: jax.Array, valid: jax.Array,
               radius: float, k: int, window: int = 32, half_space: bool = False,
               group: jax.Array | None = None, fused: bool = True):
    """Neighbor lists: up to ``k`` same-batch points within ``radius``.

    Returns (nbr_idx (N, k) int32, nbr_valid (N, k) bool). Includes self.
    ``group`` restricts neighbors to equal group values (see module doc).

    ``half_space=True`` scans only the center + 13 lexicographically-forward
    cells (half the work); every edge still appears in at least one endpoint's
    list, which suffices for consumers doing symmetric propagation (the
    connected-components pass scatter-mins through edges in both directions).
    """
    n = coords.shape[0]
    cell = jnp.floor(coords / radius).astype(jnp.int32) + _CELL_OFFSET
    cell = jnp.clip(cell, 0, hs.COORD_MAX - 1)
    key_hi = batch.astype(jnp.int32)
    if group is not None:
        key_hi = (key_hi << _GROUP_SHIFT) | jnp.clip(group.astype(jnp.int32),
                                                     0, (1 << _GROUP_SHIFT) - 1)
    khi, klo = hs.pack(key_hi, cell)
    khi, klo = hs.mask_invalid(khi, klo, valid)
    perm = hs.lexsort_pairs(khi, klo).astype(jnp.int32)
    s_hi, s_lo = khi[perm], klo[perm]

    offsets = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]
    if half_space:
        offsets = [o for o in offsets if o >= (0, 0, 0)]       # center + 13 forward
    offs = jnp.array(offsets, jnp.int32)                       # (n_off, 3)
    n_off = len(offsets)

    # all neighbor-cell run bounds in two sorted-union passes:
    # run = [upper_bound(key - 1), upper_bound(key)) — knowing the run END
    # means NO key-comparison gathers in the window scan below
    q_cell = cell[None, :, :] + offs[:, None, :]               # (n_off, N, 3)
    in_rng = jnp.all((q_cell >= 0) & (q_cell < hs.COORD_MAX), axis=-1) & valid[None, :]
    q_hi, q_lo = hs.pack(jnp.broadcast_to(key_hi[None, :], (n_off, n)),
                         jnp.clip(q_cell, 0, hs.COORD_MAX - 1))
    q_hi, q_lo = hs.mask_invalid(q_hi, q_lo, in_rng)
    _, _, starts = hs.lookup_sorted_union(s_hi, s_lo, q_hi.reshape(-1), q_lo.reshape(-1) - 1)
    starts = starts.reshape(n_off, n)

    r2 = jnp.float32(radius * radius)
    coords_ext = jnp.concatenate([coords, jnp.zeros((1, 3), coords.dtype)], 0)
    perm_ext = jnp.concatenate([perm, jnp.full((1,), n, jnp.int32)])
    s_hi_ext = jnp.concatenate([s_hi, jnp.full((1,), hs.SENTINEL, jnp.int32)])
    s_lo_ext = jnp.concatenate([s_lo, jnp.full((1,), hs.SENTINEL, jnp.int32)])
    q_hi = q_hi.reshape(n_off, n)
    q_lo = q_lo.reshape(n_off, n)

    if fused:
        # one (n_off, W, N) candidate tensor; a point's candidates across
        # offsets are disjoint (each point lives in exactly one cell), so a
        # single per-point cumsum over the flattened (n_off*W) axis assigns
        # output slots exactly like the sequential fill counter did.
        # Slot validity comes from run bounds (pos < end), so the only
        # window fetches are perm + PRE-PERMUTED coordinates.
        # Layout rules (TPU tiles (8, 128) on the two minor dims): N goes in
        # the MINOR dim — (n_off, N, W) or (..., 3) temps pad 8->128 / 3->128
        # (up to 42x HBM blowup, observed OOM); x/y/z gather as three 1-D
        # arrays for the same reason.
        _, _, ends = hs.lookup_sorted_union(s_hi, s_lo, q_hi.reshape(-1), q_lo.reshape(-1))
        ends = ends.reshape(n_off, n)
        # candidate fetch: ONE channel-major (4, V+1) column gather fetches
        # x/y/z/original-index together (~1 index cost for 4 channels vs 4
        # separate 1-D gathers; tools/microbench_fill.py). Coords ride as
        # int32 bit patterns — the bitcast round-trip is lossless.
        bi = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
        bf = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
        coords_s = coords[perm]
        cand_tbl = jnp.concatenate([
            jnp.stack([bi(coords_s[:, 0]), bi(coords_s[:, 1]),
                       bi(coords_s[:, 2]), perm], 0),
            jnp.array([[0], [0], [0], [n]], jnp.int32)], axis=1)

        pos = starts[:, None, :] + jnp.arange(window, dtype=jnp.int32)[None, :, None]
        pos_c = jnp.minimum(pos, n)                              # (n_off, W, N)
        slot = (pos < ends[:, None, :]) & in_rng[:, None, :]
        cg = cand_tbl[:, pos_c]                                  # (4, n_off, W, N)
        dx = bf(cg[0]) - coords[None, None, :, 0]
        dy = bf(cg[1]) - coords[None, None, :, 1]
        dz = bf(cg[2]) - coords[None, None, :, 2]
        ok = slot & (dx * dx + dy * dy + dz * dz <= r2)
        cand = jnp.where(ok, cg[3], n)                           # (n_off, W, N)

        # per-point slot assignment, WINDOW-POSITION-MAJOR (w0 of every
        # offset before any w1): K then takes >=1 candidate from every
        # nonempty adjacent cell before any single dense run saturates it —
        # offset-major order drops ALL cross-cell edges when the own-cell
        # run alone fills K, which fragments dense blobs under half_space
        # (no reverse probe exists there to recover the edge)
        ok_t = ok.transpose(2, 1, 0).reshape(n, n_off * window)
        cand_t = cand.transpose(2, 1, 0).reshape(n, n_off * window)
        col = jnp.cumsum(ok_t.astype(jnp.int32), axis=1) - 1
        store = ok_t & (col < k)
        col_c = jnp.where(store, col, k)                        # k = dropped
        rows = jnp.broadcast_to(jnp.arange(n)[:, None], col_c.shape)
        # ONE scatter (validity = idx < n; see ball_query_edge)
        tbl = jnp.full((n, k + 1), n, jnp.int32).at[rows, col_c].set(
            jnp.where(store, cand_t, n), mode="drop")
        nbr_idx = tbl[:, :k]
        return nbr_idx, nbr_idx < n

    nbr_idx = jnp.zeros((n, k), jnp.int32)
    nbr_valid = jnp.zeros((n, k), bool)
    fill = jnp.zeros((n,), jnp.int32)

    def body(w, carry):
        # iterate WINDOW POSITIONS, all offsets per step — same interleaved
        # candidate order as the fused schedule (see above)
        nbr_idx, nbr_valid, fill = carry
        pos = starts + w                                        # (n_off, N)
        pos_c = jnp.minimum(pos, n)
        same_cell = (s_hi_ext[pos_c] == q_hi) & (s_lo_ext[pos_c] == q_lo) & \
                    (pos < n) & (q_hi != hs.SENTINEL)
        cand = perm_ext[pos_c]                                  # (n_off, N)
        cand_safe = jnp.where(same_cell, cand, n)
        d = coords_ext[cand_safe] - coords[None, :, :]
        ok = same_cell & (jnp.sum(d * d, axis=-1) <= r2) & valid[None, :]

        prefix = jnp.cumsum(ok.astype(jnp.int32), axis=0)
        col = fill[None, :] + prefix - 1
        store = ok & (col < k)
        col_c = jnp.where(store, col, k)                        # k = dropped
        rows = jnp.broadcast_to(jnp.arange(n)[None, :], (n_off, n))
        nbr_idx = nbr_idx.at[rows, col_c].set(cand_safe, mode="drop")
        nbr_valid = nbr_valid.at[rows, col_c].set(store, mode="drop")
        fill = jnp.minimum(fill + prefix[-1], k)
        return nbr_idx, nbr_valid, fill

    nbr_idx, nbr_valid, fill = jax.lax.fori_loop(0, window, body, (nbr_idx, nbr_valid, fill))
    return jnp.where(nbr_valid, nbr_idx, n), nbr_valid


def ball_query_grid(coords: jax.Array, batch: jax.Array, valid: jax.Array,
                    radius: float, k: int, cell_size: float,
                    half_space: bool = False, group: jax.Array | None = None):
    """Ball query for SINGLE-OCCUPANCY grids: every (batch, group, cell) holds
    at most one point (the unit-grid centroids of make_units_grid — a
    centroid cannot leave its own cell).

    With occupancy <= 1 there are no candidate RUNS: a neighbor cell either
    contributes its one unit or nothing, so presence is ONE exact-match
    sorted-union lookup over all cell offsets within Chebyshev distance
    ceil(radius/cell_size) (statically pruned to offsets whose nearest-corner
    distance is <= radius). No run-end lookup, no window scan, no edge
    buffer — NOTHING is ever dropped beyond the K cap, eliminating the
    edge_factor tuning knob and its overflow failure mode.

    Candidate order per point is offset-enumeration order, which for
    cell_size == radius (m=1) equals the fused W=1 schedule's
    window-position-major order: the result is BIT-IDENTICAL to
    ``ball_query(..., window=1, fused=True)`` there
    (tests/test_cluster.py::test_grid_matches_window1).

    Returns (nbr_idx (N, k) int32, nbr_valid (N, k) bool). Includes self.
    """
    import numpy as np

    n = coords.shape[0]
    m = int(np.ceil(radius / cell_size - 1e-9))
    cell = jnp.floor(coords / cell_size).astype(jnp.int32) + _CELL_OFFSET
    cell = jnp.clip(cell, 0, hs.COORD_MAX - 1)
    key_hi = batch.astype(jnp.int32)
    if group is not None:
        key_hi = (key_hi << _GROUP_SHIFT) | jnp.clip(group.astype(jnp.int32),
                                                     0, (1 << _GROUP_SHIFT) - 1)
    khi, klo = hs.pack(key_hi, cell)
    khi, klo = hs.mask_invalid(khi, klo, valid)
    perm = hs.lexsort_pairs(khi, klo).astype(jnp.int32)
    s_hi, s_lo = khi[perm], klo[perm]

    r2f = radius * radius
    offsets = [(dx, dy, dz)
               for dx in range(-m, m + 1)
               for dy in range(-m, m + 1)
               for dz in range(-m, m + 1)
               # nearest-corner pruning: two points in cells offset by d are
               # at least (|d_a|-1)*cell apart along axis a
               if sum((max(abs(d) - 1, 0) * cell_size) ** 2
                      for d in (dx, dy, dz)) <= r2f]
    if half_space:
        offsets = [o for o in offsets if o >= (0, 0, 0)]
    offs = jnp.array(offsets, jnp.int32)                       # (n_off, 3)
    n_off = len(offsets)

    q_cell = cell[None, :, :] + offs[:, None, :]               # (n_off, N, 3)
    in_rng = jnp.all((q_cell >= 0) & (q_cell < hs.COORD_MAX), axis=-1) & valid[None, :]
    q_hi, q_lo = hs.pack(jnp.broadcast_to(key_hi[None, :], (n_off, n)),
                         jnp.clip(q_cell, 0, hs.COORD_MAX - 1))
    q_hi, q_lo = hs.mask_invalid(q_hi, q_lo, in_rng)
    idx, found, _ = hs.lookup_sorted_union(s_hi, s_lo,
                                           q_hi.reshape(-1), q_lo.reshape(-1))
    pos_c = jnp.minimum(idx, n).reshape(n_off, n)
    found = found.reshape(n_off, n) & in_rng

    # candidate fetch: ONE channel-major (4, V+1) column gather fetches
    # x/y/z/original-index together (same trick as the fused/edge paths)
    bi = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
    bf = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
    coords_s = coords[perm]
    cand_tbl = jnp.concatenate([
        jnp.stack([bi(coords_s[:, 0]), bi(coords_s[:, 1]),
                   bi(coords_s[:, 2]), perm], 0),
        jnp.array([[0], [0], [0], [n]], jnp.int32)], axis=1)   # (4, V+1)
    cg = cand_tbl[:, pos_c]                                    # (4, n_off, N)
    dx = bf(cg[0]) - coords[None, :, 0]
    dy = bf(cg[1]) - coords[None, :, 1]
    dz = bf(cg[2]) - coords[None, :, 2]
    r2 = jnp.float32(r2f)
    ok = found & (dx * dx + dy * dy + dz * dz <= r2)
    cand = jnp.where(ok, cg[3], n)                             # (n_off, N)

    # K-cap in offset-enumeration order (== window-position-major at W=1)
    ok_t = ok.T                                                # (N, n_off)
    cand_t = cand.T
    col = jnp.cumsum(ok_t.astype(jnp.int32), axis=1) - 1
    store = ok_t & (col < k)
    col_c = jnp.where(store, col, k)
    rows = jnp.broadcast_to(jnp.arange(n)[:, None], col_c.shape)
    tbl = jnp.full((n, k + 1), n, jnp.int32).at[rows, col_c].set(
        jnp.where(store, cand_t, n), mode="drop")
    nbr_idx = tbl[:, :k]
    return nbr_idx, nbr_idx < n


def ball_query_edge(coords: jax.Array, batch: jax.Array, valid: jax.Array,
                    radius: float, k: int, window: int, edge_cap: int,
                    half_space: bool = False, group: jax.Array | None = None):
    """Edge-buffer ball query: enumerate only the REAL candidates.

    The fused schedule (``ball_query``) materializes a dense (n_off, W, N)
    slot grid — ~6.4M slots at production caps of which only ~1.2M hold a
    candidate (measured; BENCH_NOTES "next levers" #1). This variant packs the
    candidates into a static edge buffer of ``edge_cap`` entries:

      1. run bounds per (point, offset) exactly as the fused path (two
         sorted-union lookups), run length capped at ``window``;
      2. each run gets a contiguous extent of edge slots by exclusive cumsum
         (POINT-major, so a point's candidates are contiguous and an edge-cap
         overflow degrades tail points instead of whole offsets); slot->run
         and slot->extent-base are both recovered gather-free by scatter +
         cummax (extent bases are monotone in run order);
      3. per-edge distance test on gathered candidate / query coordinates;
      4. one 2-operand sort on a packed (point, rank, offset) key (failing
         edges carry a sentinel key and sort to the end) re-interleaves the
         survivors into window-position-major order — the SAME candidate
         order as the fused schedule — so a positional K-cap keeps identical
         neighbors (fused vs edge paths are bit-identical;
         tests/test_cluster.py).

    Edges beyond ``edge_cap`` are dropped deterministically and surfaced in
    the returned count.

    Returns (nbr_idx (N, k), nbr_valid (N, k), edges_dropped ()).
    """
    n = coords.shape[0]
    cell = jnp.floor(coords / radius).astype(jnp.int32) + _CELL_OFFSET
    cell = jnp.clip(cell, 0, hs.COORD_MAX - 1)
    key_hi = batch.astype(jnp.int32)
    if group is not None:
        key_hi = (key_hi << _GROUP_SHIFT) | jnp.clip(group.astype(jnp.int32),
                                                     0, (1 << _GROUP_SHIFT) - 1)
    khi, klo = hs.pack(key_hi, cell)
    khi, klo = hs.mask_invalid(khi, klo, valid)
    perm = hs.lexsort_pairs(khi, klo).astype(jnp.int32)
    s_hi, s_lo = khi[perm], klo[perm]

    offsets = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]
    if half_space:
        offsets = [o for o in offsets if o >= (0, 0, 0)]
    offs = jnp.array(offsets, jnp.int32)
    n_off = len(offsets)
    assert n * window * _pow2(n_off) < 2**31, "edge sort key overflows int32"

    q_cell = cell[None, :, :] + offs[:, None, :]               # (n_off, N, 3)
    in_rng = jnp.all((q_cell >= 0) & (q_cell < hs.COORD_MAX), axis=-1) & valid[None, :]
    q_hi, q_lo = hs.pack(jnp.broadcast_to(key_hi[None, :], (n_off, n)),
                         jnp.clip(q_cell, 0, hs.COORD_MAX - 1))
    q_hi, q_lo = hs.mask_invalid(q_hi, q_lo, in_rng)
    _, _, starts = hs.lookup_sorted_union(s_hi, s_lo, q_hi.reshape(-1), q_lo.reshape(-1) - 1)
    _, _, ends = hs.lookup_sorted_union(s_hi, s_lo, q_hi.reshape(-1), q_lo.reshape(-1))

    # run extents in edge space, point-major: run r = p * n_off + o
    run_len = jnp.where(in_rng.reshape(-1),
                        jnp.clip(ends - starts, 0, window), 0).astype(jnp.int32)
    run_len = run_len.reshape(n_off, n).T.reshape(-1)
    starts_pm = starts.reshape(n_off, n).T.reshape(-1)
    base = jnp.cumsum(run_len) - run_len                       # exclusive
    total = base[-1] + run_len[-1]
    edges_dropped = jnp.maximum(total - edge_cap, 0)

    # slot -> run and slot -> extent base, both via scatter + cummax (extent
    # bases are non-decreasing in run order, so ties at equal starts resolve
    # to the last = only nonempty run, and the fill is exact)
    run_ids = jnp.arange(run_len.shape[0], dtype=jnp.int32)
    run = jax.lax.cummax(jnp.zeros((edge_cap,), jnp.int32).at[base].max(
        run_ids, mode="drop"))
    base_e = jax.lax.cummax(jnp.zeros((edge_cap,), jnp.int32).at[base].max(
        base, mode="drop"))
    e = jnp.arange(edge_cap, dtype=jnp.int32)
    e_valid = e < jnp.minimum(total, edge_cap)
    w_e = e - base_e

    # per-edge run/query metadata is PIECEWISE CONSTANT along the edge buffer;
    # reconstruct it by scattering per-run int32 DELTAS at extent starts and
    # cumsum-ing (modular int32 arithmetic telescopes exactly — coincident
    # starts of empty runs just add both deltas). This replaces one ~9ns
    # random gather per edge per field with one N-sized scatter + one E scan.
    def fill(vals):
        deltas = vals - jnp.concatenate([vals[:1] * 0, vals[:-1]])
        return jnp.cumsum(jnp.zeros((edge_cap,), jnp.int32).at[base].add(
            deltas, mode="drop"))

    pos = jnp.minimum(fill(starts_pm) + w_e, n)
    p_e = run // n_off                                         # query point
    o_e = run - p_e * n_off

    # candidate fetch: ONE channel-major (4, V+1) column gather per edge
    # fetches x/y/z/original-index together. A column gather costs ~the same
    # as a 1-D gather PER INDEX (measured 7.9 ms vs 28.5 ms for the old
    # complex64-packed 2-gather fetch at E=1.15M; tools/microbench_fill.py),
    # so packing channels amortizes it 4x. Coords ride as int32 bit patterns
    # (bitcast round-trip is lossless) so the table is one dtype.
    bi = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
    bf = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
    coords_s = coords[perm]
    cand_tbl = jnp.concatenate([
        jnp.stack([bi(coords_s[:, 0]), bi(coords_s[:, 1]),
                   bi(coords_s[:, 2]), perm], 0),
        jnp.array([[0], [0], [0], [n]], jnp.int32)], axis=1)   # (4, V+1)
    cg = cand_tbl[:, pos]                                      # (4, E)

    # query fetch: same trick at p_e (replaces three delta-fill
    # reconstructions; values are the identical f32 bit patterns)
    qg = bi(coords).T[:, p_e]                                  # (3, E)
    dx = bf(cg[0]) - bf(qg[0])
    dy = bf(cg[1]) - bf(qg[1])
    dz = bf(cg[2]) - bf(qg[2])
    r2 = jnp.float32(radius * radius)
    ok = e_valid & (dx * dx + dy * dy + dz * dz <= r2)

    # window-position-major order (w, o) per point == the fused schedule's
    # candidate order; see ball_query's layout comment for why that order
    # matters (cross-cell edges must rank before any dense run saturates K).
    # Failed edges get the sentinel key, so after the sort each point's
    # segment holds ONLY its in-radius candidates in (w, o) order. The
    # candidate's original index rides as the sort payload — no post-sort
    # gather needed.
    op2 = _pow2(n_off)
    key = jnp.where(ok, (p_e * window + w_e) * op2 + o_e, hs.SENTINEL)
    key_s, cand_s = jax.lax.sort((key, cg[3]), num_keys=1)
    ok_s = key_s != hs.SENTINEL
    p_s = jnp.where(ok_s, key_s // (window * op2), n)

    # rank within point = distance from the segment's first edge
    first = jnp.concatenate([jnp.ones((1,), bool), p_s[1:] != p_s[:-1]])
    seg_start = jax.lax.cummax(jnp.where(first, e, -1))
    col = e - seg_start
    store = ok_s & (col < k)
    # ONE scatter: non-stored edges route to the (n, k) trash cell; validity
    # is recovered as idx < n (stored candidates are always < n)
    tbl = jnp.full((n + 1, k + 1), n, jnp.int32).at[
        jnp.where(store, p_s, n), jnp.where(store, col, k)].set(
        jnp.where(store, cand_s, n), mode="drop")
    nbr_idx = tbl[:n, :k]
    return nbr_idx, nbr_idx < n, edges_dropped


def _pow2(x: int) -> int:
    return 1 << (x - 1).bit_length()

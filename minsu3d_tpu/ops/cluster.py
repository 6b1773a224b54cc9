"""On-device connected components by iterative min-label propagation — the
TPU replacement for the reference's CPU BFS clustering (pg_bfs_cluster /
sg_bfs_cluster, src/bfs_cluster/bfs_cluster.cpp:28-187, O2/O3 in SURVEY.md),
eliminating its GPU->CPU->GPU round-trip (reference pointgroup.py:49-56).

Each point starts labeled with its own index; sweeps alternate neighbor
min-gather, symmetric min-scatter, and pointer jumping (label <- label[label])
until a fixed point — O(log diameter) sweeps for radius graphs of room scans.
Cluster *membership* matches the reference BFS exactly (given the same graph);
cluster ordering differs, which all consumers are invariant to.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def connected_components(nbr_idx: jax.Array, nbr_valid: jax.Array, active: jax.Array,
                         group: jax.Array | None = None, max_iters: int = 64,
                         jumps: int = 2, coarsen: int = 0,
                         coarsen_sweeps: int = 2) -> jax.Array:
    """Min-index labels of connected components.

    nbr_idx (N, K) neighbor table (value N = absent), nbr_valid (N, K),
    ``active`` masks points that participate at all; ``group`` (N,) restricts
    edges to equal group values (the same-semantic-label rule of the
    reference BFS, bfs_cluster.cpp:28-40). Returns (N,) int32 labels; inactive
    points get N.

    ``jumps`` = pointer-compression steps per sweep: a pure speed knob — the
    loop runs to the fixpoint, which is unique (every node labeled with its
    component minimum), so the returned labels are bit-identical for any
    value; only the sweep count changes. Measured on the bench unit graphs
    (tools/microbench_cc2.py): jumps=2 is fastest (84 ms vs 90 ms at 4
    across both graphs) with no extra sweeps.

    ``coarsen`` > 0 inserts a ROOT-GRAPH acceleration after ``coarsen_sweeps``
    full-graph sweeps: by then most edges connect nodes that already share a
    root, so the distinct cross-root pairs (typically a few % of K*N) are
    compacted into a ``coarsen``-slot edge list and hooking iterates on that
    list — each round costs 4 list-sized ops + the jump gathers instead of
    three (K, N) passes. Also a pure speed knob: the final full-graph loop
    below always runs to the same unique fixpoint, so labels are bit-identical
    with any value (including an overflowing edge list, which only forfeits
    the speedup — dropped pairs are re-propagated by the full sweeps).
    ``coarsen_sweeps=1`` extracts one (K, N) sweep earlier — a larger pair
    list (hooking has merged less), traded against a saved full sweep.
    """
    n = nbr_idx.shape[0]
    # work transposed: (K, N) keeps N in the minor dim — (N, K) arrays tile
    # to (8, 128) on TPU, padding K=8..16 up to 128 (8-16x HBM waste on the
    # arrays every sweep reads)
    nbr_t = nbr_idx.T
    valid_t = nbr_valid.T
    if group is not None:
        g_ext = jnp.concatenate([group, jnp.full((1,), -2, group.dtype)])
        valid_t = valid_t & (g_ext[nbr_t] == group[None, :])
    active_e = jnp.concatenate([active, jnp.zeros((1,), bool)])
    valid_t = valid_t & active[None, :] & active_e[nbr_t]
    # work in (N+1,)-EXTENDED label space throughout: slot n is the sentinel/
    # trash cell, so every sweep runs without the per-jump concat/slice
    # kernels of the (N,)-space form (same integer min-ops in the same order
    # — labels are bit-identical; only kernel count changes). nbr/valid get
    # a padded column n (invalid) so all gathers stay in-bounds.
    nbr_e = jnp.concatenate([nbr_t, jnp.full((nbr_t.shape[0], 1), n, jnp.int32)], 1)
    valid_e = jnp.concatenate([valid_t, jnp.zeros((valid_t.shape[0], 1), bool)], 1)

    label0 = jnp.where(active_e, jnp.arange(n + 1, dtype=jnp.int32), n)

    def sweep(e):
        # ROOT HOOKING (Shiloach–Vishkin style), not plain min-flooding:
        # scatter-mins target neighbor ROOTS (label values as indices), so a
        # whole tree adopts a smaller root in one round and convergence is
        # O(log diameter) rounds — flooding onto neighbor NODES propagates
        # ~1 hop/sweep and needed 36-48 sweeps on original-coordinate graphs
        # (measured; more than the cc_iters budget).
        rv = jnp.where(valid_e, e[nbr_e], n)          # neighbors' roots (K, N+1)
        m = jnp.minimum(jnp.min(rv, axis=0), e)       # best root seen per node
        # my root <- best root among my neighbors
        e2 = e.at[e].min(m)
        # neighbors' roots <- my root (covers half-space/capped reverse edges;
        # invalid slots write into the n trash cell, cleaned by the where)
        e2 = e2.at[rv].min(jnp.broadcast_to(e[None, :], rv.shape))
        # pointer compression: pull the hooked roots down the trees
        for _ in range(jumps):
            e2 = jnp.minimum(e2, e2[e2])
        return jnp.where(active_e, e2, n)

    def cond(state):
        i, e, done = state
        return (~done) & (i < max_iters)

    def body(state):
        i, e, _ = state
        new = sweep(e)
        return i + 1, new, jnp.all(new == e)

    e = sweep(label0)
    if coarsen > 0:
        for _ in range(max(coarsen_sweeps - 1, 0)):
            e = sweep(e)
        # cross-root pairs (canonical order) of every still-unmerged edge
        rv = jnp.where(valid_e, e[nbr_e], n)
        ru = jnp.broadcast_to(e[None, :], rv.shape)
        cross = valid_e & (ru != rv)
        a = jnp.where(cross, jnp.minimum(ru, rv), n).ravel()
        b = jnp.where(cross, jnp.maximum(ru, rv), n).ravel()
        # dedupe by lexicographic sort; invalid (n, n) pairs sort last
        a_s, b_s = jax.lax.sort((a, b), num_keys=2)
        uniq = ((a_s != jnp.concatenate([jnp.full((1,), -1, a_s.dtype), a_s[:-1]]))
                | (b_s != jnp.concatenate([jnp.full((1,), -1, b_s.dtype), b_s[:-1]]))
                ) & (a_s < n)
        pos = jnp.cumsum(uniq.astype(jnp.int32)) - 1
        slot = jnp.where(uniq & (pos < coarsen), pos, coarsen)
        ea = jnp.full((coarsen + 1,), n, jnp.int32).at[slot].set(a_s)[:coarsen]
        eb = jnp.full((coarsen + 1,), n, jnp.int32).at[slot].set(b_s)[:coarsen]

        def csweep(e):
            # hooking over the compact list; invalid slots read/write the
            # n trash cell (e[n] stays n: inactive under the where)
            ra, rb = e[ea], e[eb]
            m = jnp.minimum(ra, rb)
            e2 = e.at[ra].min(m)
            e2 = e2.at[rb].min(m)
            for _ in range(jumps):
                e2 = jnp.minimum(e2, e2[e2])
            return jnp.where(active_e, e2, n)

        def cbody(state):
            i, e, _ = state
            new = csweep(e)
            return i + 1, new, jnp.all(new == e)

        _, e, _ = jax.lax.while_loop(cond, cbody, (0, csweep(e), False))
        # seed the confirm loop with done = (sweep changed nothing): when the
        # coarsen list captured every cross-root pair (the common case), ONE
        # full-graph sweep verifies the fixpoint instead of two — labels are
        # identical, only the sweep count changes
        nxt = sweep(e)
        _, label_e, _ = jax.lax.while_loop(cond, body, (1, nxt, jnp.all(nxt == e)))
        return label_e[:n]
    _, label_e, _ = jax.lax.while_loop(cond, body, (0, sweep(e), False))
    return label_e[:n]


class Clusters(NamedTuple):
    """Compact clustering: per-point cluster id + per-cluster stats."""

    point_cluster: jax.Array  # (N,) int32 in [0, C) or C for none
    sizes: jax.Array          # (C,) int32
    valid: jax.Array          # (C,) bool
    count: jax.Array          # () int32
    edges_dropped: jax.Array | int = 0    # ball-query edge-buffer overflow
    clusters_dropped: jax.Array | int = 0  # components beyond the C capacity


def compact_labels(label: jax.Array, active: jax.Array, c_cap: int,
                   big_thre: int = 1) -> Clusters:
    """Renumber CC labels to dense ids [0, C), LARGEST components first.

    Size-priority matters when components overflow ``c_cap``: noise points
    (e.g. the ~1% of floor misclassified as object classes) form thousands of
    tiny components, and a min-label-order truncation let them EVICT real
    object clusters — the round-2 PointGroup synthetic-AP gap traced to
    exactly this (tools/diag_pointgroup.py). Ties break by representative
    label (deterministic). Overflow is surfaced in ``clusters_dropped``.

    ``big_thre``: only components of >= this many points count as dropped.
    Consumers that filter clusters below a size threshold anyway (PointGroup's
    cluster_npoint_thre, reference pointgroup.py:70-73 via merge_clusterings)
    lose nothing when a SUB-threshold component falls off the size-ranked
    cap, so counting those as accuracy-affecting overflow forced absurdly
    conservative capacities (16384/scene at bench config). Size ranking makes
    the count exact: every >= big_thre component outranks every smaller one,
    so dropped-big = max(n_big - c_cap, 0). Default 1 = every component
    counts (HAIS absorbs sub-threshold fragments instead of discarding them,
    so its callers keep the strict count).
    """
    n = label.shape[0]
    order = jnp.argsort(jnp.where(active, label, n))
    sl = label[order]
    sa = active[order]
    prev = jnp.concatenate([jnp.full((1,), -1, sl.dtype), sl[:-1]])
    first = (sl != prev) & sa
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1                # run id per row
    count = jnp.sum(first.astype(jnp.int32))
    seg_c = jnp.where(sa, seg, n)
    seg_sizes = jnp.zeros((n + 1,), jnp.int32).at[seg_c].add(
        sa.astype(jnp.int32))[:n]                                # per-run size
    # rank runs by size desc (stable: ties keep min-representative order)
    rank_src = jnp.argsort(-seg_sizes, stable=True)
    rank = jnp.zeros((n,), jnp.int32).at[rank_src].set(jnp.arange(n, dtype=jnp.int32))
    cid_sorted = jnp.where(sa & (rank[jnp.minimum(seg, n - 1)] < c_cap),
                           rank[jnp.minimum(seg, n - 1)], c_cap)
    point_cluster = jnp.zeros((n,), jnp.int32).at[order].set(cid_sorted)
    sizes = jnp.zeros((c_cap + 1,), jnp.int32).at[point_cluster].add(
        active.astype(jnp.int32))[:c_cap]
    valid = jnp.arange(c_cap) < jnp.minimum(count, c_cap)
    n_big = (jnp.sum((seg_sizes >= big_thre).astype(jnp.int32))
             if big_thre > 1 else count)
    return Clusters(point_cluster, sizes, valid, jnp.minimum(count, c_cap),
                    clusters_dropped=jnp.maximum(n_big - c_cap, 0))


def cluster_points(coords: jax.Array, batch: jax.Array, active: jax.Array,
                   group: jax.Array | None, radius: float, k: int, window: int,
                   c_cap: int, max_iters: int = 64, half_space: bool = False,
                   edge_cap: int = 0, coarsen: int = 0,
                   coarsen_sweeps: int = 2, big_thre: int = 1) -> Clusters:
    """ball_query + connected_components + compaction in one call."""
    from minsu3d_tpu.ops.ballquery import ball_query, ball_query_edge

    if edge_cap:
        nbr_idx, nbr_valid, dropped = ball_query_edge(
            coords, batch, active, radius, k, window, edge_cap,
            half_space=half_space, group=group)
    else:
        nbr_idx, nbr_valid = ball_query(coords, batch, active, radius, k, window,
                                        half_space=half_space, group=group)
        dropped = jnp.int32(0)
    label = connected_components(nbr_idx, nbr_valid, active, group, max_iters,
                                 coarsen=coarsen, coarsen_sweeps=coarsen_sweeps)
    return compact_labels(label, active, c_cap,
                          big_thre)._replace(edges_dropped=dropped)


def _unit_table(coords: jax.Array, batch: jax.Array, active: jax.Array,
                group: jax.Array | None, unit_id: jax.Array, u_cap: int):
    """Aggregate points into their units: mean coords + batch/group/active.

    Returns (u_coords (U,3), u_batch (U,), u_active (U,), u_group (U,)|None,
    uid (N,) clipped per-point unit id with u_cap = inactive,
    u_counts (U,) int32 member point counts)."""
    uid = jnp.where(active & (unit_id < u_cap), unit_id, u_cap)
    w = (uid < u_cap).astype(jnp.float32)

    # channel-major packed scatters: ONE (4, U+1) column scatter-add for
    # x/y/z/count and one (1-2, U+1) column scatter-max for batch/group —
    # fused multi-channel scatters cost ~the per-index price of a single 1-D
    # scatter (tools/microbench_fill.py). Per-unit f32 sums see the same
    # point-ordered update sequence as the old per-array scatters, so unit
    # centroids are bit-identical.
    vals = jnp.stack([coords[:, 0] * w, coords[:, 1] * w, coords[:, 2] * w, w], 0)
    acc = jnp.zeros((4, u_cap + 1), jnp.float32).at[:, uid].add(vals)
    cnt = acc[3]
    u_coords = (acc[:3] / jnp.maximum(cnt, 1.0)[None, :]).T[:u_cap]
    u_active = cnt[:u_cap] > 0
    ints = [jnp.where(uid < u_cap, batch, -1).astype(jnp.int32)]
    if group is not None:
        ints.append(jnp.where(uid < u_cap, group, -1).astype(jnp.int32))
    mx = jnp.full((len(ints), u_cap + 1), -1, jnp.int32).at[:, uid].max(
        jnp.stack(ints, 0))
    u_batch = mx[0, :u_cap]
    u_group = mx[1, :u_cap].astype(group.dtype) if group is not None else None
    return u_coords, u_batch, u_active, u_group, uid, cnt[:u_cap].astype(jnp.int32)


def _unit_points_compact(u_label: jax.Array, uid: jax.Array, u_cap: int,
                         n_points: int, c_cap: int,
                         u_counts: jax.Array | None = None,
                         big_thre: int = 1) -> Clusters:
    """Map unit labels back to points and compact (cluster_units tail).

    With ``u_counts`` (per-unit member point counts), compaction runs at UNIT
    granularity: the two argsorts operate on U instead of N rows (U is 3-4x
    smaller at production caps) and points only pay one final cid gather.
    Bit-identical to compacting the expanded per-point labels: runs appear in
    the same ascending-label order, sizes are the same point counts, and the
    stable size-rank therefore assigns identical cluster ids
    (tests/test_cluster.py::test_unit_compaction_matches_point).
    """
    if u_counts is None:
        ext = jnp.concatenate([u_label, jnp.full((1,), n_points, jnp.int32)])
        point_label = jnp.where(uid < u_cap, ext[jnp.minimum(uid, u_cap)], n_points)
        return compact_labels(point_label, uid < u_cap, c_cap, big_thre)

    u = u_label.shape[0]
    u_active = u_label < u
    order = jnp.argsort(jnp.where(u_active, u_label, u))
    sl = u_label[order]
    sa = u_active[order]
    cnt_s = u_counts[order]
    prev = jnp.concatenate([jnp.full((1,), -1, sl.dtype), sl[:-1]])
    first = (sl != prev) & sa
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    count = jnp.sum(first.astype(jnp.int32))
    seg_c = jnp.where(sa, seg, u)
    seg_sizes = jnp.zeros((u + 1,), jnp.int32).at[seg_c].add(
        jnp.where(sa, cnt_s, 0))[:u]                  # per-component POINT count
    rank_src = jnp.argsort(-seg_sizes, stable=True)
    rank = jnp.zeros((u,), jnp.int32).at[rank_src].set(jnp.arange(u, dtype=jnp.int32))
    cid_sorted = jnp.where(sa & (rank[jnp.minimum(seg, u - 1)] < c_cap),
                           rank[jnp.minimum(seg, u - 1)], c_cap)
    unit_cid = jnp.full((u,), c_cap, jnp.int32).at[order].set(cid_sorted)
    cid_ext = jnp.concatenate([unit_cid, jnp.full((1,), c_cap, jnp.int32)])
    point_cluster = jnp.where(uid < u_cap, cid_ext[jnp.minimum(uid, u_cap)], c_cap)
    sizes = jnp.zeros((c_cap + 1,), jnp.int32).at[unit_cid].add(u_counts)[:c_cap]
    valid = jnp.arange(c_cap) < jnp.minimum(count, c_cap)
    n_big = (jnp.sum((seg_sizes >= big_thre).astype(jnp.int32))
             if big_thre > 1 else count)
    return Clusters(point_cluster, sizes, valid, jnp.minimum(count, c_cap),
                    clusters_dropped=jnp.maximum(n_big - c_cap, 0))


def cluster_units(coords: jax.Array, batch: jax.Array, active: jax.Array,
                  group: jax.Array | None, unit_id: jax.Array, u_cap: int,
                  radius: float, k: int, window: int, c_cap: int,
                  max_iters: int = 64, half_space: bool = False,
                  edge_cap: int = 0, grid_cell: float = 0.0,
                  coarsen: int = 0, coarsen_sweeps: int = 2,
                  big_thre: int = 1) -> Clusters:
    """Connected components at unit granularity (TPU-first redesign).

    The reference BFS-clusters raw points; at 2cm voxels and a 3cm ball
    radius, points sharing a (voxel, predicted-class) cell are connected by
    construction, so clustering their aggregates is equivalent while cutting
    the ball-query/label-propagation workload ~3-5x. ``unit_id`` maps each
    point to its unit (>= u_cap = inactive); unit coordinates are the mean of
    member points. Cluster sizes are counted in POINTS (the reference's
    npoint thresholds apply unchanged). Returns per-POINT Clusters.
    """
    u_coords, u_batch, u_active, u_group, uid, u_counts = _unit_table(
        coords, batch, active, group, unit_id, u_cap)

    from minsu3d_tpu.ops.ballquery import (ball_query, ball_query_edge,
                                           ball_query_grid)

    # half_space halves the scan; safe at production caps now that group keys
    # keep runs short (50k-point scale test: 0 splits/merges at K16/W8).
    # Confirmed bit-identical on the golden-AP eval (scripts/
    # eval_synth_pointgroup.sh) — config defaults bq_half_space: true
    if grid_cell > 0:
        # unit-grid centroids are single-occupancy in their own cells: the
        # direct grid query replaces run-bound/window/edge machinery with one
        # exact-match lookup, and nothing beyond the K cap is ever dropped
        nbr_idx, nbr_valid = ball_query_grid(
            u_coords, u_batch, u_active, radius, k, grid_cell,
            half_space=half_space, group=u_group)
        dropped = jnp.int32(0)
    elif edge_cap:
        nbr_idx, nbr_valid, dropped = ball_query_edge(
            u_coords, u_batch, u_active, radius, k, window, edge_cap,
            half_space=half_space, group=u_group)
    else:
        nbr_idx, nbr_valid = ball_query(u_coords, u_batch, u_active, radius, k, window,
                                        half_space=half_space, group=u_group)
        dropped = jnp.int32(0)
    u_label = connected_components(nbr_idx, nbr_valid, u_active, u_group, max_iters,
                                   coarsen=coarsen, coarsen_sweeps=coarsen_sweeps)

    # unit labels are unit indices; offset into a point-label namespace is not
    # needed — compact_labels only requires distinct ids per cluster
    return _unit_points_compact(u_label, uid, u_cap, coords.shape[0], c_cap,
                                u_counts=u_counts,
                                big_thre=big_thre)._replace(edges_dropped=dropped)

"""Golden tests: sorted-union lookup, ball query, connected components, and
segment/IoU ops vs exact NumPy implementations of the reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from minsu3d_tpu.ops import hashing as hs
from minsu3d_tpu.ops import segment
from minsu3d_tpu.ops.ballquery import ball_query
from minsu3d_tpu.ops.cluster import cluster_points, compact_labels, connected_components
from minsu3d_tpu.ops.instance_iou import ProposalRows, get_iou, get_mask_label


class TestLookupSortedUnion:
    def test_matches_binary_search(self):
        rng = np.random.default_rng(0)
        v, q = 500, 2000
        s_lo = np.sort(rng.choice(2**20, v, replace=False)).astype(np.int32)
        s_hi = np.zeros(v, np.int32)
        q_lo = (s_lo[rng.integers(0, v, q)] + rng.integers(-1, 2, q)).astype(np.int32)
        q_hi = np.zeros(q, np.int32)

        idx, found, ub = hs.lookup_sorted_union(
            jnp.array(s_hi), jnp.array(s_lo), jnp.array(q_hi), jnp.array(q_lo))
        ref_ub = np.searchsorted(s_lo, q_lo, side="right")
        ref_found = np.isin(q_lo, s_lo)
        np.testing.assert_array_equal(np.asarray(ub), ref_ub)
        np.testing.assert_array_equal(np.asarray(found), ref_found)
        matched = np.asarray(idx)[ref_found]
        np.testing.assert_array_equal(s_lo[matched], q_lo[ref_found])

    def test_multi_batch_keys(self):
        rng = np.random.default_rng(1)
        keys = sorted({(int(rng.integers(0, 3)), int(rng.integers(0, 50))) for _ in range(200)})
        s_hi = jnp.array([k[0] for k in keys], jnp.int32)
        s_lo = jnp.array([k[1] for k in keys], jnp.int32)
        q = [(b, x) for b in range(3) for x in range(50)]
        q_hi = jnp.array([t[0] for t in q], jnp.int32)
        q_lo = jnp.array([t[1] for t in q], jnp.int32)
        idx, found, _ = hs.lookup_sorted_union(s_hi, s_lo, q_hi, q_lo)
        ref = np.array([t in set(keys) for t in q])
        np.testing.assert_array_equal(np.asarray(found), ref)
        f = np.asarray(found)
        np.testing.assert_array_equal(np.asarray(s_hi)[np.asarray(idx)[f]], np.asarray(q_hi)[f])
        np.testing.assert_array_equal(np.asarray(s_lo)[np.asarray(idx)[f]], np.asarray(q_lo)[f])


def np_ball_graph(coords, batch, valid, radius):
    """Exact dense ball graph (reference ballquery_batch_p semantics)."""
    n = len(coords)
    adj = np.zeros((n, n), bool)
    for i in range(n):
        if not valid[i]:
            continue
        d = np.linalg.norm(coords - coords[i], axis=1)
        adj[i] = (d <= radius) & (batch == batch[i]) & valid
    return adj


def np_connected_components(adj, group=None):
    n = adj.shape[0]
    label = np.full(n, -1)
    cur = 0
    for s in range(n):
        if label[s] != -1 or not adj[s, s]:
            continue
        stack = [s]
        label[s] = cur
        while stack:
            u = stack.pop()
            for v in np.flatnonzero(adj[u]):
                if label[v] == -1 and (group is None or group[v] == group[u]):
                    label[v] = cur
                    stack.append(v)
        cur += 1
    return label


class TestBallQueryCC:
    def _setup(self, seed=0, n=300, blobs=5):
        rng = np.random.default_rng(seed)
        centers = rng.uniform(0, 2, (blobs, 3))
        pts = np.concatenate([c + rng.normal(0, 0.01, (n // blobs, 3)) for c in centers])
        batch = np.zeros(len(pts), np.int32)
        valid = np.ones(len(pts), bool)
        return pts.astype(np.float32), batch, valid

    def test_neighbors_within_radius(self):
        pts, batch, valid = self._setup()
        r = 0.05
        idx, ok = ball_query(jnp.array(pts), jnp.array(batch), jnp.array(valid), r, 16, 16)
        idx, ok = np.asarray(idx), np.asarray(ok)
        n = len(pts)
        for i in range(0, n, 17):
            nbrs = idx[i][ok[i]]
            d = np.linalg.norm(pts[nbrs] - pts[i], axis=1)
            assert (d <= r + 1e-5).all()

    def test_cc_membership_matches_bfs(self):
        pts, batch, valid = self._setup(seed=3)
        r = 0.05
        clus = cluster_points(jnp.array(pts), jnp.array(batch), jnp.array(valid),
                              None, r, 16, 16, 64)
        got = np.asarray(clus.point_cluster)
        adj = np_ball_graph(pts, batch, valid, r)
        ref = np_connected_components(adj)
        # same partition (up to relabeling)
        for lab in np.unique(ref):
            members = np.flatnonzero(ref == lab)
            assert len(np.unique(got[members])) == 1, "reference cluster split"
        for lab in np.unique(got):
            members = np.flatnonzero(got == lab)
            assert len(np.unique(ref[members])) == 1, "clusters merged"

    def test_cc_coarsen_bit_identical(self):
        """Root-graph coarsening is a pure speed knob: labels must be
        bit-identical to the default path for ANY cap — ample (all cross
        pairs fit), tight, and overflowing (dropped pairs are re-propagated
        by the final full-graph loop)."""
        pts, batch, valid = self._setup(seed=11, n=400, blobs=7)
        group = (np.arange(len(pts)) * 7 % 3).astype(np.int32)
        for g in (None, jnp.array(group)):
            idx, ok = ball_query(jnp.array(pts), jnp.array(batch),
                                 jnp.array(valid), 0.05, 12, 16, group=g)
            base = np.asarray(connected_components(idx, ok, jnp.array(valid), g))
            for cap in (4096, 64, 4):
                for sweeps in (1, 2, 3):
                    got = np.asarray(connected_components(
                        idx, ok, jnp.array(valid), g, coarsen=cap,
                        coarsen_sweeps=sweeps))
                    np.testing.assert_array_equal(
                        got, base, err_msg=f"cap={cap} sweeps={sweeps}")

    def test_cc_respects_group_and_batch(self):
        pts = np.array([[0, 0, 0], [0.01, 0, 0], [0.02, 0, 0], [0.03, 0, 0]], np.float32)
        batch = jnp.array([0, 0, 0, 0], jnp.int32)
        valid = jnp.ones(4, bool)
        group = jnp.array([1, 1, 2, 2], jnp.int32)
        idx, ok = ball_query(jnp.array(pts), batch, valid, 0.05, 8, 8)
        label = connected_components(idx, ok, jnp.asarray(valid), group)
        lab = np.asarray(label)
        assert lab[0] == lab[1] and lab[2] == lab[3] and lab[0] != lab[2]

        batch2 = jnp.array([0, 1, 0, 1], jnp.int32)
        idx, ok = ball_query(jnp.array(pts), batch2, valid, 0.05, 8, 8)
        label = connected_components(idx, ok, jnp.asarray(valid), None)
        lab = np.asarray(label)
        assert lab[0] == lab[2] and lab[1] == lab[3] and lab[0] != lab[1]

    def test_compact_labels_sizes(self):
        label = jnp.array([5, 5, 2, 2, 2, 9, 9, 9, 9], jnp.int32)
        active = jnp.ones(9, bool)
        clus = compact_labels(label, active, 8)
        assert int(clus.count) == 3
        sizes = sorted(np.asarray(clus.sizes)[np.asarray(clus.valid)].tolist())
        assert sizes == [2, 3, 4]

    def test_compact_labels_big_thre_counter(self):
        # components: sizes 4, 3, 2, 1, 1 — cap 2 keeps the two largest.
        # big_thre=3: only the size-3+ components count as accuracy-affecting
        # when dropped, and both fit -> 0 dropped; strict counting sees 3.
        label = jnp.array([0, 0, 0, 0, 4, 4, 4, 7, 7, 9, 10], jnp.int32)
        active = jnp.ones(11, bool)
        strict = compact_labels(label, active, 2)
        assert int(strict.clusters_dropped) == 3
        lax_ = compact_labels(label, active, 2, big_thre=3)
        assert int(lax_.clusters_dropped) == 0
        # membership/sizes identical regardless of the counter policy
        np.testing.assert_array_equal(np.asarray(strict.point_cluster),
                                      np.asarray(lax_.point_cluster))
        # cap 1 drops one size-3 component: counted under big_thre=3 too
        assert int(compact_labels(label, active, 1, big_thre=3).clusters_dropped) == 1
        # unit-granularity compaction counts in POINTS with the same policy
        from minsu3d_tpu.ops.cluster import _unit_points_compact
        # 3 units sized [4, 3, 2] points; units 0,1 share a component
        u_label = jnp.array([0, 0, 2], jnp.int32)
        uid = jnp.array([0, 0, 0, 0, 1, 1, 1, 2, 2], jnp.int32)
        u_counts = jnp.array([4, 3, 2], jnp.int32)
        c = _unit_points_compact(u_label, uid, 3, 9, 1, u_counts, big_thre=3)
        assert int(c.clusters_dropped) == 0      # dropped comp has 2 < 3 points
        c = _unit_points_compact(u_label, uid, 3, 9, 1, u_counts, big_thre=2)
        assert int(c.clusters_dropped) == 1


class TestBallQuerySchedules:
    """The fused (N, n_off*W) pass and the fori_loop schedule must agree
    bit-for-bit (same candidate enumeration order), and group-keyed queries
    must return only same-group neighbors."""

    def _pts(self, seed, n=600):
        rng = np.random.default_rng(seed)
        pts = rng.uniform(0, 1.5, (n, 3)).astype(np.float32)
        batch = rng.integers(0, 2, n).astype(np.int32)
        valid = rng.random(n) > 0.1
        group = rng.integers(0, 3, n).astype(np.int32)
        return pts, batch, valid, group

    def test_fused_matches_loop(self):
        pts, batch, valid, group = self._pts(7)
        for g in (None, jnp.array(group)):
            a_idx, a_ok = ball_query(jnp.array(pts), jnp.array(batch), jnp.array(valid),
                                     0.08, 12, 8, group=g, fused=True)
            b_idx, b_ok = ball_query(jnp.array(pts), jnp.array(batch), jnp.array(valid),
                                     0.08, 12, 8, group=g, fused=False)
            np.testing.assert_array_equal(np.asarray(a_ok), np.asarray(b_ok))
            np.testing.assert_array_equal(np.asarray(a_idx), np.asarray(b_idx))

    def test_edge_buffer_matches_fused(self):
        """The edge-buffer schedule enumerates only real candidates but must
        keep the fused path's (w, o) candidate order, so with an ample edge
        cap the neighbor tables are bit-identical — including under
        half_space, where K-cap order decides which cross-cell edges survive."""
        from minsu3d_tpu.ops.ballquery import ball_query_edge

        pts, batch, valid, group = self._pts(9)
        for half in (False, True):
            for g in (None, jnp.array(group)):
                a_idx, a_ok = ball_query(jnp.array(pts), jnp.array(batch),
                                         jnp.array(valid), 0.08, 12, 8,
                                         half_space=half, group=g, fused=True)
                b_idx, b_ok, dropped = ball_query_edge(
                    jnp.array(pts), jnp.array(batch), jnp.array(valid),
                    0.08, 12, 8, edge_cap=64 * len(pts), half_space=half, group=g)
                assert int(dropped) == 0
                np.testing.assert_array_equal(np.asarray(a_ok), np.asarray(b_ok))
                np.testing.assert_array_equal(np.asarray(a_idx), np.asarray(b_idx))

    def test_edge_buffer_overflow_surfaces(self):
        """Edges beyond edge_cap are dropped deterministically and counted."""
        from minsu3d_tpu.ops.ballquery import ball_query_edge

        pts, batch, valid, group = self._pts(10)
        _, _, dropped = ball_query_edge(
            jnp.array(pts), jnp.array(batch), jnp.array(valid),
            0.5, 12, 32, edge_cap=256)  # big radius: way more edges than 256
        assert int(dropped) > 0

    def test_group_key_restricts_neighbors(self):
        pts, batch, valid, group = self._pts(8)
        idx, ok = ball_query(jnp.array(pts), jnp.array(batch), jnp.array(valid),
                             0.08, 16, 16, group=jnp.array(group))
        idx, ok = np.asarray(idx), np.asarray(ok)
        for i in range(0, len(pts), 13):
            nbrs = idx[i][ok[i]]
            if len(nbrs):
                assert (group[nbrs] == group[i]).all()
                assert (batch[nbrs] == batch[i]).all()
                d = np.linalg.norm(pts[nbrs] - pts[i], axis=1)
                assert (d <= 0.08 + 1e-5).all()

    def test_group_key_cc_matches_oracle(self):
        pts, batch, valid, group = self._pts(9, n=400)
        batch[:] = 0
        valid[:] = True
        r = 0.1
        clus = cluster_points(jnp.array(pts), jnp.array(batch), jnp.ones(len(pts), bool),
                              jnp.array(group), r, 24, 24, 512)
        got = np.asarray(clus.point_cluster)
        adj = np_ball_graph(pts, batch, np.ones(len(pts), bool), r)
        adj &= group[:, None] == group[None, :]
        ref = np_connected_components(adj, group)
        for lab in np.unique(ref):
            members = np.flatnonzero(ref == lab)
            assert len(np.unique(got[members])) == 1
        for lab in np.unique(got):
            members = np.flatnonzero(got == lab)
            assert len(np.unique(ref[members])) == 1


class TestSegmentOps:
    def test_sec_mean_min_max_roipool(self):
        rng = np.random.default_rng(0)
        n, s = 50, 5
        data = rng.normal(size=(n, 4)).astype(np.float32)
        seg = rng.integers(0, s, n).astype(np.int32)
        valid = rng.random(n) > 0.2
        segj = jnp.where(jnp.array(valid), jnp.array(seg), s)
        for fn, npfn in [(segment.sec_mean, np.mean), (segment.sec_min, np.min),
                         (segment.sec_max, np.max), (segment.roipool, np.max),
                         (segment.global_avg_pool, np.mean)]:
            out = np.asarray(fn(jnp.array(data), segj, jnp.array(valid), s))
            for k in range(s):
                rows = data[(seg == k) & valid]
                if len(rows):
                    np.testing.assert_allclose(out[k], npfn(rows, axis=0), rtol=1e-5, atol=1e-6)


class TestInstanceIoU:
    def _rows(self, assign, valid=None):
        n = len(assign)
        valid = np.ones(n, bool) if valid is None else valid
        return ProposalRows(
            point_idx=jnp.arange(n, dtype=jnp.int32),
            prop_id=jnp.array(assign, jnp.int32),
            valid=jnp.array(valid),
            n_proposals=jnp.int32(int(np.max(assign)) + 1),
        )

    def test_get_iou_matches_bruteforce(self):
        rng = np.random.default_rng(0)
        n, p, i = 200, 4, 3
        assign = rng.integers(0, p, n)
        inst = rng.integers(-1, i, n).astype(np.int32)
        inst_np = np.array([(inst == k).sum() for k in range(i)], np.int32)
        rows = self._rows(assign)
        iou = np.asarray(get_iou(rows, p, jnp.array(inst), jnp.array(inst_np), i))
        for pp in range(p):
            for ii in range(i):
                inter = ((assign == pp) & (inst == ii)).sum()
                expect = inter / ((assign == pp).sum() + inst_np[ii] - inter + 1e-5)
                np.testing.assert_allclose(iou[pp, ii], expect, rtol=1e-5)

    def test_get_mask_label(self):
        # proposal 0 overlaps instance 0 with IoU 1.0; proposal 1 nothing
        inst = jnp.array([0, 0, 0, -1, -1, -1], jnp.int32)
        assign = np.array([0, 0, 0, 1, 1, 1])
        rows = self._rows(assign)
        iou = get_iou(rows, 2, inst, jnp.array([3, 0], jnp.int32), 2)
        label, ok = get_mask_label(rows, 2, inst, jnp.array([4, -1], jnp.int32), iou, 0.5)
        label, ok = np.asarray(label), np.asarray(ok)
        assert ok[:3].all() and not ok[3:].any()
        assert label[:3].all()


class TestUnitClustering:
    def test_unit_vs_point_membership(self):
        """Unit-granularity CC gives the same point partition as point-level
        CC when units are fine (2cm voxels vs 3cm ball radius)."""
        from minsu3d_tpu.model.general_model import make_units
        from minsu3d_tpu.ops.cluster import cluster_units

        rng = np.random.default_rng(5)
        blobs = 4
        pts = np.concatenate([c + rng.normal(0, 0.02, (150, 3))
                              for c in rng.uniform(0, 3, (blobs, 3))]).astype(np.float32)
        n = len(pts)
        batch = jnp.zeros(n, jnp.int32)
        valid = jnp.ones(n, bool)
        group = jnp.array(rng.integers(0, 2, n), jnp.int32)  # two classes mixed in blobs

        # units: (2cm voxel, class)
        vox = np.floor(pts / 0.02).astype(np.int32)
        vox -= vox.min(0)
        key = (vox[:, 0].astype(np.int64) * 4096 + vox[:, 1]) * 4096 + vox[:, 2]
        _, p2v = np.unique(key, return_inverse=True)
        units, _ = make_units(jnp.array(p2v.astype(np.int32)), group, valid, 512)

        r = 0.06
        got = np.asarray(cluster_units(jnp.array(pts), batch, valid, group,
                                       units, 512, r, 16, 16, 64).point_cluster)
        ref = np.asarray(cluster_points(jnp.array(pts), batch, valid, group,
                                        r, 32, 32, 64).point_cluster)
        for lab in np.unique(ref):
            members = np.flatnonzero(ref == lab)
            assert len(np.unique(got[members])) == 1
        for lab in np.unique(got):
            members = np.flatnonzero(got == lab)
            assert len(np.unique(ref[members])) == 1

    def test_window1_matches_edge(self):
        """Grid units whose cell size EQUALS the query radius have <= 1 unit
        per (batch, group, hash cell), so the fused W=1 schedule must give
        bit-identical clusters to the edge-buffer path (the cluster_step fast
        path; see general_model.py::cluster_step)."""
        from minsu3d_tpu.model.general_model import make_units_grid
        from minsu3d_tpu.ops.cluster import cluster_units

        rng = np.random.default_rng(11)
        blobs = 6
        pts = np.concatenate([c + rng.normal(0, 0.03, (200, 3))
                              for c in rng.uniform(0, 3, (blobs, 3))]).astype(np.float32)
        n = len(pts)
        batch = jnp.array(rng.integers(0, 2, n), jnp.int32)
        valid = jnp.array(rng.random(n) > 0.05)
        group = jnp.array(rng.integers(0, 3, n), jnp.int32)

        cap, r = 768, 0.06
        units, _ = make_units_grid(batch, jnp.array(pts), group, valid, cap, r)

        for k in (4, 8):  # k=4 exercises the K-cap ordering agreement
            edge = cluster_units(jnp.array(pts), batch, valid, group, units,
                                 cap, r, k, 8, 64, 64, half_space=True,
                                 edge_cap=16 * cap)
            w1 = cluster_units(jnp.array(pts), batch, valid, group, units,
                               cap, r, k, 1, 64, 64, half_space=True,
                               edge_cap=0)
            np.testing.assert_array_equal(np.asarray(edge.point_cluster),
                                          np.asarray(w1.point_cluster))
            np.testing.assert_array_equal(np.asarray(edge.sizes),
                                          np.asarray(w1.sizes))
            assert int(edge.count) == int(w1.count)
            assert int(edge.edges_dropped) == 0

    def test_grid_matches_window1(self):
        """Direct single-occupancy grid query (ball_query_grid, m=1) must be
        BIT-IDENTICAL to the fused W=1 schedule: same offsets in the same
        enumeration order, same presence + distance tests, same K-cap."""
        from minsu3d_tpu.model.general_model import make_units_grid
        from minsu3d_tpu.ops.cluster import cluster_units

        rng = np.random.default_rng(11)
        pts = np.concatenate([c + rng.normal(0, 0.03, (200, 3))
                              for c in rng.uniform(0, 3, (6, 3))]).astype(np.float32)
        n = len(pts)
        batch = jnp.array(rng.integers(0, 2, n), jnp.int32)
        valid = jnp.array(rng.random(n) > 0.05)
        group = jnp.array(rng.integers(0, 3, n), jnp.int32)
        cap, r = 768, 0.06
        units, _ = make_units_grid(batch, jnp.array(pts), group, valid, cap, r)

        for k in (4, 8):  # k=4 exercises K-cap ordering agreement
            w1 = cluster_units(jnp.array(pts), batch, valid, group, units,
                               cap, r, k, 1, 64, 64, half_space=True,
                               edge_cap=0)
            gr = cluster_units(jnp.array(pts), batch, valid, group, units,
                               cap, r, k, 8, 64, 64, half_space=True,
                               edge_cap=0, grid_cell=r)
            np.testing.assert_array_equal(np.asarray(gr.point_cluster),
                                          np.asarray(w1.point_cluster))
            np.testing.assert_array_equal(np.asarray(gr.sizes),
                                          np.asarray(w1.sizes))

    def test_grid_m2_matches_edge(self):
        """m=2 grid query (cell < radius <= 2 cells) replaces the edge-buffer
        path: with K large enough that the cap never saturates, the radius
        graph — and therefore every component and its sizes — must match the
        edge path exactly (candidate SETS are equal; only enumeration order
        differs, which CC is invariant to)."""
        from minsu3d_tpu.model.general_model import make_units_grid
        from minsu3d_tpu.ops.cluster import cluster_units

        rng = np.random.default_rng(13)
        pts = np.concatenate([c + rng.normal(0, 0.04, (250, 3))
                              for c in rng.uniform(0, 3, (6, 3))]).astype(np.float32)
        n = len(pts)
        batch = jnp.array(rng.integers(0, 2, n), jnp.int32)
        valid = jnp.array(rng.random(n) > 0.05)
        group = jnp.array(rng.integers(0, 3, n), jnp.int32)
        cap, cell, r = 768, 0.035, 0.06  # r/cell in (1, 2] -> m=2
        units, _ = make_units_grid(batch, jnp.array(pts), group, valid, cap, cell)

        edge = cluster_units(jnp.array(pts), batch, valid, group, units,
                             cap, r, 64, 16, 64, 64, half_space=True,
                             edge_cap=64 * cap)
        gr = cluster_units(jnp.array(pts), batch, valid, group, units,
                           cap, r, 64, 8, 64, 64, half_space=True,
                           edge_cap=0, grid_cell=cell)
        np.testing.assert_array_equal(np.asarray(gr.point_cluster),
                                      np.asarray(edge.point_cluster))
        np.testing.assert_array_equal(np.asarray(gr.sizes),
                                      np.asarray(edge.sizes))
        assert int(edge.edges_dropped) == 0

    def test_unit_compaction_matches_point(self):
        """Unit-granularity compaction (argsort over U rows + point-count
        sizes) must assign the exact cluster ids the point-expanded
        compact_labels path does — same run order, same sizes, same stable
        size-rank (ops/cluster.py::_unit_points_compact)."""
        from minsu3d_tpu.ops.cluster import (Clusters, _unit_points_compact,
                                             _unit_table, compact_labels,
                                             connected_components)
        from minsu3d_tpu.ops.ballquery import ball_query

        rng = np.random.default_rng(23)
        blobs = 8
        pts = np.concatenate([c + rng.normal(0, 0.03, (120, 3))
                              for c in rng.uniform(0, 3, (blobs, 3))]).astype(np.float32)
        n = len(pts)
        batch = jnp.array(rng.integers(0, 2, n), jnp.int32)
        valid = jnp.array(rng.random(n) > 0.1)
        group = jnp.array(rng.integers(0, 3, n), jnp.int32)
        vox = np.floor(pts / 0.02).astype(np.int32)
        vox -= vox.min(0)
        key = (vox[:, 0].astype(np.int64) * 4096 + vox[:, 1]) * 4096 + vox[:, 2]
        _, p2v = np.unique(key, return_inverse=True)
        unit_id = jnp.array(p2v.astype(np.int32))

        u_cap, c_cap = 700, 8  # c_cap=8 << components: exercises eviction ties
        u_coords, u_batch, u_active, u_group, uid, u_counts = _unit_table(
            jnp.array(pts), batch, valid, group, unit_id, u_cap)
        nbr_idx, nbr_valid = ball_query(u_coords, u_batch, u_active, 0.06, 8, 16,
                                        group=u_group)
        u_label = connected_components(nbr_idx, nbr_valid, u_active, u_group, 64)

        fast = _unit_points_compact(u_label, uid, u_cap, n, c_cap, u_counts=u_counts)
        slow = _unit_points_compact(u_label, uid, u_cap, n, c_cap)  # point path
        np.testing.assert_array_equal(np.asarray(fast.point_cluster),
                                      np.asarray(slow.point_cluster))
        np.testing.assert_array_equal(np.asarray(fast.sizes), np.asarray(slow.sizes))
        np.testing.assert_array_equal(np.asarray(fast.valid), np.asarray(slow.valid))
        assert int(fast.count) == int(slow.count)
        assert int(fast.clusters_dropped) == int(slow.clusters_dropped) > 0

    def test_unit_sizes_count_points(self):
        from minsu3d_tpu.ops.cluster import cluster_units

        pts = np.zeros((10, 3), np.float32)  # all in one voxel/unit
        units = jnp.zeros(10, jnp.int32)
        clus = cluster_units(jnp.array(pts), jnp.zeros(10, jnp.int32),
                             jnp.ones(10, bool), None, units, 4, 0.05, 8, 8, 16)
        sizes = np.asarray(clus.sizes)
        assert sizes[np.asarray(clus.point_cluster)[0]] == 10


def np_grid_components(pts, radius):
    """Exact connected components of the ball graph via grid-hash pair
    enumeration + union-find — scales to 100k points (the dense-adjacency
    oracle above is O(N^2)). This is the reference BFS semantics
    (bfs_cluster.cu:15-91) with exhaustive (uncapped) neighbor lists."""
    n = len(pts)
    cell = np.floor(pts / radius).astype(np.int64)
    cell -= cell.min(0)
    dims = cell.max(0) + 2
    key = (cell[:, 0] * dims[1] + cell[:, 1]) * dims[2] + cell[:, 2]
    order = np.argsort(key, kind="stable")
    sk = key[order]
    starts = np.flatnonzero(np.diff(sk, prepend=sk[0] - 1))
    runs = {int(sk[s]): order[s:e] for s, e in
            zip(starts, np.append(starts[1:], n))}

    parent = np.arange(n)

    def find(a):
        root = a
        while parent[root] != root:
            root = parent[root]
        while parent[a] != root:
            parent[a], a = root, parent[a]
        return root

    r2 = radius * radius
    fwd = [(dx, dy, dz) for dx in (0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)
           if (dx, dy, dz) >= (0, 0, 0)]
    for k, members in runs.items():
        p = pts[members]
        for dx, dy, dz in fwd:
            nk = k + (dx * dims[1] + dy) * dims[2] + dz
            cand = members if (dx, dy, dz) == (0, 0, 0) else runs.get(int(nk))
            if cand is None:
                continue
            d2 = ((p[:, None, :] - pts[cand][None, :, :]) ** 2).sum(-1)
            ii, jj = np.nonzero(d2 <= r2)
            for a, b in zip(members[ii], cand[jj]):
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    return np.array([find(i) for i in range(n)])


class TestClusteringAtScale:
    """Membership at production scale/caps (K=16, W=8 — the unit-clustering
    path of general_model.cluster_step). Guards against silent candidate-list
    corruption that unit tests at <=2k points missed once (the packed-row
    0x7FFFFFFF/NaN incident — see BENCH_NOTES.md): window saturation in dense
    blobs must still leave every reference cluster connected."""

    def test_membership_50k_dense_blobs(self):
        rng = np.random.default_rng(11)
        blobs = []
        # 12 dense blobs (trained-net shifted coords collapse instances to
        # ~5cm sigma around centroids — windows saturate hard there)
        for c in rng.uniform(0.5, 7.5, (12, 3)):
            blobs.append(c + rng.normal(0, 0.05, (3000, 3)))
        # sparse background slab: singletons and small chains
        slab = rng.uniform(0, 8, (10000, 3))
        slab[:, 2] *= 0.0125
        pts = np.concatenate(blobs + [slab]).astype(np.float32)
        n = len(pts)
        batch = jnp.zeros(n, jnp.int32)
        valid = jnp.ones(n, bool)

        r = 0.03
        idx, ok = ball_query(jnp.array(pts), batch, valid, r, 16, 8)
        got = np.asarray(connected_components(idx, ok, jnp.asarray(valid)))
        ref = np_grid_components(pts, r)

        for lab in np.unique(ref):
            members = np.flatnonzero(ref == lab)
            assert len(np.unique(got[members])) == 1, \
                f"reference cluster of {len(members)} points split"
        for lab in np.unique(got):
            members = np.flatnonzero(got == lab)
            assert len(np.unique(ref[members])) == 1, "clusters merged"


class TestHalfSpaceDenseBlob:
    def test_corner_straddling_blob_stays_connected(self):
        """A sigma=1/4-cell blob straddling a cell corner (8 cells, runs far
        longer than W) must stay ONE component under half_space: the
        window-position-major candidate interleave guarantees every adjacent
        cell an edge before K saturates (offset-major order fragmented this
        into 6 — all K slots went to the own-cell run)."""
        rng = np.random.default_rng(0)
        pts = rng.normal(0, 0.01, (200, 3)).astype(np.float32)
        n = len(pts)
        batch = jnp.zeros(n, jnp.int32)
        valid = jnp.ones(n, bool)
        for half in (True, False):
            for fused in (True, False):
                idx, ok = ball_query(jnp.array(pts), batch, valid, 0.04, 16, 16,
                                     half_space=half, fused=fused)
                lbl = np.asarray(connected_components(idx, ok, valid))
                assert len(np.unique(lbl)) == 1, (half, fused)


class TestGridUnits:
    def test_grid_units_match_point_clustering(self):
        """Units built from the clustering coordinates' own grid
        (general_model.make_units_grid) must reproduce point-granularity
        cluster membership on blob scenes — the same invariant the
        (voxel, class) units satisfy, with the tighter in-metric bound."""
        from minsu3d_tpu.model import general_model as gm
        from minsu3d_tpu.ops.cluster import cluster_points, cluster_units

        rng = np.random.default_rng(3)
        blobs = [c + rng.normal(0, 0.04, (800, 3))
                 for c in rng.uniform(0.5, 7.5, (6, 3))]
        pts = jnp.array(np.concatenate(blobs).astype(np.float32))
        n = pts.shape[0]
        batch = jnp.zeros(n, jnp.int32)
        group = jnp.array(np.repeat(np.arange(6) % 3, 800).astype(np.int32))
        active = jnp.ones(n, bool)
        r = 0.06

        ref = cluster_points(pts, batch, active, group, r, 16, 16, 64)
        units, dropped = gm.make_units_grid(batch, pts, group, active, 4096, 0.02)
        assert int(dropped) == 0
        got = cluster_units(pts, batch, active, group, units, 4096,
                            r, 16, 8, 64)

        pr = np.asarray(ref.point_cluster)
        pg_ = np.asarray(got.point_cluster)
        assert int(ref.count) == int(got.count)
        # same partition (ids may differ)
        import collections
        m = {}
        for a, b in zip(pr, pg_):
            assert m.setdefault(a, b) == b, "partition mismatch"

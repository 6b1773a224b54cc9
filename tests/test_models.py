"""Forward+loss smoke for HAIS and SoftGroup (PointGroup is covered by the
trainer and oracle-pipeline tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import tiny_cfg, make_batch
from minsu3d_tpu.model import get_model
from minsu3d_tpu.model.caps import StaticCaps


@pytest.mark.parametrize("name", ["HAIS", "SoftGroup"])
def test_forward_and_losses_finite(name):
    cfg = tiny_cfg(name.lower())
    batch, arrays, items = make_batch(cfg, "train", 2)
    bundle = get_model(name)
    net = bundle.make_net(cfg, "train")
    caps = StaticCaps.from_cfg(cfg, "train")
    key = jax.random.PRNGKey(0)
    fflags = bundle.forward_flags(cfg, 999, True)
    lflags = bundle.loss_flags(cfg, 999)

    init = jax.jit(lambda k, b: net.init({"params": k, "cluster": k}, b, True, True, **fflags))
    variables = init(key, arrays)

    @jax.jit
    def run(v, b, k):
        out, _ = net.apply(v, b, True, True, **fflags,
                           rngs={"cluster": k}, mutable=["batch_stats"])
        return bundle.losses(cfg, caps, b, out, True, **lflags)

    losses = run(variables, arrays, key)
    vals = {k2: float(v) for k2, v in losses.items()}
    assert all(np.isfinite(v) for v in vals.values()), vals
    assert vals["semantic_loss"] > 0


def test_hais_aggregation_semantics():
    """Kept/primary/absorb logic on a hand-built clustering."""
    from minsu3d_tpu.model.hais import hierarchical_aggregation
    from minsu3d_tpu.ops.cluster import Clusters

    # 3 clusters, one class (id 3): sizes 100 (primary), 20 (kept+absorbable),
    # 2 (fragment only, absorbed if near)
    n = 122
    pc = np.concatenate([np.zeros(100), np.ones(20), np.full(2, 2)]).astype(np.int32)
    shifted = np.zeros((n, 3), np.float32)
    shifted[100:120] += 0.05   # kept cluster near primary
    shifted[120:] += 10.0      # far fragment: not absorbed
    c_cap = 8
    clus = Clusters(
        point_cluster=jnp.array(pc),
        sizes=jnp.array([100, 20, 2, 0, 0, 0, 0, 0], jnp.int32),
        valid=jnp.array([True, True, True] + [False] * 5),
        count=jnp.int32(3),
    )
    sem = jnp.full(n, 3, jnp.int32)
    bid = jnp.zeros(n, jnp.int32)
    active = jnp.ones(n, bool)
    # class 3: mean 100 -> high=30, low=5: sizes 100=primary, 20=kept, 2=frag
    pna = jnp.full(20, 100.0)
    ra = jnp.full(20, 1.0)

    rows, primaries_dropped = hierarchical_aggregation(
        clus, jnp.array(shifted), bid, sem, active, pna, ra, 16,
        use_set_aggr=True)
    assert int(primaries_dropped) == 0
    n_props = int(rows.n_proposals)
    assert n_props == 2  # kept(20) + primary(100)
    pid = np.asarray(rows.prop_id)
    valid = np.asarray(rows.valid)
    # kept-path rows: the 20 mid points form proposal 0
    assert set(pid[:n][valid[:n]]) == {0}
    assert valid[:100].sum() == 0 and valid[100:120].sum() == 20
    # primary-path rows: primary(100) + absorbed kept(20); far frag dropped
    pid2, valid2 = pid[n:], valid[n:]
    assert set(pid2[valid2]) == {1}
    assert valid2[:100].all() and valid2[100:120].all() and not valid2[120:].any()


def test_hais_primaries_dropped_counter():
    """Primaries beyond the 512-slot compact table are COUNTED, not silent."""
    from minsu3d_tpu.model.hais import hierarchical_aggregation
    from minsu3d_tpu.ops.cluster import Clusters

    c_cap, n_primary = 600, 520
    n = c_cap  # one point per cluster
    pc = np.arange(n, dtype=np.int32)
    shifted = np.random.default_rng(0).normal(0, 1, (n, 3)).astype(np.float32)
    sizes = np.ones(c_cap, np.int32)
    clus = Clusters(point_cluster=jnp.array(pc), sizes=jnp.array(sizes),
                    valid=jnp.arange(c_cap) < n_primary,
                    count=jnp.int32(n_primary))
    sem = jnp.full(n, 3, jnp.int32)
    bid = jnp.zeros(n, jnp.int32)
    active = jnp.arange(n) < n_primary
    # class mean 1.0 -> high = 0.3: every size-1 valid cluster is a primary
    _, primaries_dropped = hierarchical_aggregation(
        clus, jnp.array(shifted), bid, sem, active,
        jnp.full(20, 1.0), jnp.full(20, 1.0), 1024, use_set_aggr=True)
    assert int(primaries_dropped) == n_primary - 512


def test_softgroup_grouping_merges_classes():
    from minsu3d_tpu.model.softgroup import soft_grouping
    from minsu3d_tpu.model.caps import StaticCaps

    cfg = tiny_cfg("softgroup")
    caps = StaticCaps.from_cfg(cfg, "train")
    rng = np.random.default_rng(0)
    # two blobs; blob A confident class 2, blob B class 3
    n = 400
    pts = np.concatenate([rng.normal(0, 0.01, (200, 3)),
                          rng.normal(5, 0.01, (200, 3))]).astype(np.float32)
    softmax = np.zeros((n, 20), np.float32)
    softmax[:200, 2] = 0.9
    softmax[200:, 3] = 0.9
    rows, _ = soft_grouping(
        jnp.array(softmax), jnp.array(pts), jnp.zeros(n, jnp.int32),
        jnp.ones(n, bool), tuple(range(2, 20)), 0.2, 0.04,
        0.05, jnp.full(20, 100.0), 100, 200, caps)
    assert int(rows.n_proposals) == 2
    pid = np.asarray(rows.prop_id)
    valid = np.asarray(rows.valid)
    pt = np.asarray(rows.point_idx)
    # each blob in exactly one proposal
    a = set(pid[valid & (pt < 200)])
    b = set(pid[valid & (pt >= 200)])
    assert len(a) == 1 and len(b) == 1 and a != b


def test_softgroup_packed_matches_scan():
    """soft_grouping_packed must produce the same proposal partition as the
    per-class scan (they are interchangeable paths of SoftGroupNet)."""
    from minsu3d_tpu.model.softgroup import soft_grouping, soft_grouping_packed
    from minsu3d_tpu.model.caps import StaticCaps

    cfg = tiny_cfg("softgroup")
    rng = np.random.default_rng(2)
    n = 600
    # overlapping blobs with soft class assignments: points near boundaries
    # are active for two classes at once (the soft-grouping hallmark)
    pts = np.concatenate([
        rng.normal(0.0, 0.02, (200, 3)),
        rng.normal(0.08, 0.02, (200, 3)),
        rng.normal(3.0, 0.02, (200, 3)),
    ]).astype(np.float32)
    softmax = np.full((n, 20), 0.01, np.float32)
    softmax[:200, 2] = 0.6
    softmax[:200, 3] = 0.3
    softmax[200:400, 3] = 0.6
    softmax[200:400, 2] = 0.3
    softmax[400:, 4] = 0.9
    batch = rng.integers(0, 2, n).astype(np.int32)
    mask = rng.random(n) > 0.05
    p2v = np.arange(n, dtype=np.int32)  # 1 point per voxel (point granularity)
    point_num_avg = jnp.full(20, 100.0)

    def partition(rows):
        pid = np.asarray(rows.prop_id)
        valid = np.asarray(rows.valid)
        pt = np.asarray(rows.point_idx)
        groups = {}
        for p, i in zip(pid[valid], pt[valid]):
            groups.setdefault(int(p), set()).add(int(i))
        return {frozenset(v) for v in groups.values()}

    for granularity in ("unit", "point"):
        caps = StaticCaps.from_cfg(cfg, "train")._replace(
            unit_clustering=(granularity == "unit"))
        args = (jnp.array(softmax), jnp.array(pts), jnp.array(batch),
                jnp.array(mask), tuple(range(2, 20)), 0.2, 0.04,
                0.05, point_num_avg, 20, 200, caps)
        scan_rows, _ = soft_grouping(*args, p2v=jnp.array(p2v))
        packed_rows, _ = soft_grouping_packed(*args, jnp.array(p2v), pair_cap=2 * n)
        assert int(scan_rows.n_proposals) == int(packed_rows.n_proposals), granularity
        assert partition(scan_rows) == partition(packed_rows), granularity


def test_softgroup_packed_large_voxel_ids():
    """Regression: unit keys must carry the voxel id in the UNCLIPPED slot.
    With p2v values >= 1024 (any realistic voxel cap), passing the voxel as
    make_units key_lo collapsed all high voxels into one unit per class,
    merging distant same-class blobs into a single proposal."""
    from minsu3d_tpu.model.softgroup import soft_grouping_packed
    from minsu3d_tpu.model.caps import StaticCaps

    cfg = tiny_cfg("softgroup")
    caps = StaticCaps.from_cfg(cfg, "train")._replace(unit_clustering=True)
    rng = np.random.default_rng(5)
    n = 400
    # two same-class blobs 5 m apart -> must be TWO proposals
    pts = np.concatenate([rng.normal(0, 0.01, (200, 3)),
                          rng.normal(5, 0.01, (200, 3))]).astype(np.float32)
    softmax = np.zeros((n, 20), np.float32)
    softmax[:, 4] = 0.9
    # voxel ids far above the 10-bit coord field
    p2v = (2000 + np.arange(n)).astype(np.int32)
    rows, diag = soft_grouping_packed(
        jnp.array(softmax), jnp.array(pts), jnp.zeros(n, jnp.int32),
        jnp.ones(n, bool), tuple(range(2, 20)), 0.2, 0.04,
        0.05, jnp.full(20, 100.0), 20, 200, caps, jnp.array(p2v), pair_cap=2 * n)
    assert int(diag["units_dropped"]) == 0
    assert int(rows.n_proposals) == 2
    pid = np.asarray(rows.prop_id)
    valid = np.asarray(rows.valid)
    pt = np.asarray(rows.point_idx)
    a = set(pid[valid & (pt < 200)])
    b = set(pid[valid & (pt >= 200)])
    assert len(a) == 1 and len(b) == 1 and a != b


def test_softgroup_packed_surfaces_dropped_pairs():
    """Active pairs beyond pair_cap must be counted, not silently dropped."""
    from minsu3d_tpu.model.softgroup import soft_grouping_packed
    from minsu3d_tpu.model.caps import StaticCaps

    cfg = tiny_cfg("softgroup")
    caps = StaticCaps.from_cfg(cfg, "train")
    n = 256
    pts = np.random.default_rng(0).normal(0, 0.5, (n, 3)).astype(np.float32)
    softmax = np.zeros((n, 20), np.float32)
    softmax[:, 2] = 0.4
    softmax[:, 3] = 0.3
    softmax[:, 4] = 0.25  # 3 active classes/point at score_thr=0.2 -> 3N pairs
    rows, diag = soft_grouping_packed(
        jnp.array(softmax), jnp.array(pts), jnp.zeros(n, jnp.int32),
        jnp.ones(n, bool), tuple(range(2, 20)), 0.2, 0.04,
        0.05, jnp.full(20, 100.0), 20, 200, caps,
        jnp.arange(n, dtype=jnp.int32), pair_cap=2 * n)
    assert int(diag["pairs_dropped"]) == n  # 3N active - 2N cap


def test_softgroup_scan_compaction_counts_drops():
    """The NON-packed (per-class scan) path must count rows lost to the 2N
    compaction budget too: with 3 classes above score_thr on every point,
    soft_grouping emits 3N valid rows and compact_rows keeps 2N."""
    from minsu3d_tpu.model.softgroup import soft_grouping_compacted
    from minsu3d_tpu.model.caps import StaticCaps

    cfg = tiny_cfg("softgroup")
    caps = StaticCaps.from_cfg(cfg, "train")._replace(unit_clustering=False)
    n = 256
    # 1-D chain, spacing 0.01 < radius 0.04: connected, but each point sees
    # only ~8 neighbors so the edge buffer (edge_factor*N) can't overflow —
    # a gaussian blob makes all-pairs edges and fragments via edges_dropped.
    pts = np.zeros((n, 3), np.float32)
    pts[:, 0] = np.arange(n, dtype=np.float32) * 0.01
    softmax = np.zeros((n, 20), np.float32)
    softmax[:, 2] = 0.4
    softmax[:, 3] = 0.3
    softmax[:, 4] = 0.25  # 3 active classes/point at score_thr=0.2
    rows, diag = soft_grouping_compacted(
        jnp.array(softmax), jnp.array(pts), jnp.zeros(n, jnp.int32),
        jnp.ones(n, bool), tuple(range(2, 20)), 0.2, 0.04,
        0.05, jnp.full(20, 100.0), 20, 200, caps, r_cap=2 * n)
    assert int(diag["pairs_dropped"]) == n  # 3N valid - 2N cap
    assert rows.point_idx.shape[0] == 2 * n
    assert bool(np.asarray(rows.valid).all())  # kept rows are the valid ones
    for k in ("edges_dropped", "clusters_dropped", "units_dropped"):
        assert int(diag[k]) == 0, (k, diag)

"""Static (hashable) capacity spec threaded through jitted model code."""

from __future__ import annotations

from typing import NamedTuple


class StaticCaps(NamedTuple):
    voxel_caps: tuple          # per-UNet-level voxel capacities
    instances: int             # gt instance axis (I)
    clusters: int              # connected-component axis (C)
    proposals: int             # proposal axis (P)
    neighbors: int             # ball-query K
    window: int                # ball-query per-cell scan window
    cc_iters: int              # max label-propagation sweeps
    proposal_voxel_caps: tuple # proposal mini-grid capacities (TinyUnet levels)
    cluster_units: int         # (voxel, class) unit capacity
    unit_clustering: bool      # cluster at unit (True) or point granularity
    half_space: bool           # scan 13+1 forward cells only (CC's symmetric
                               # scatter-min recovers reverse edges)
    edge_factor: int = 0       # ball-query edge-buffer slots per point/unit
                               # (0 = dense fused (n_off, W, N) schedule)
    shifted_units: bool = False    # build shifted-clustering units from the
                                   # SHIFTED-coordinate grid (see
                                   # general_model.make_units_grid)
    cluster_units_shifted: int = 0  # unit capacity for that grid (trained
                                    # offsets collapse instances, so ~10x
                                    # smaller than cluster_units works)
    xyz_grid_cell: float = 0.0  # >0: original-coordinate clustering units
                                # from a grid of this cell size (meters)
                                # instead of the batch's (voxel, class) ids;
                                # larger cells = fewer units = faster, at
                                # coarser connectivity granularity
    edge_factor_xyz: int = 0    # edge-buffer slots per unit for the ORIGINAL-
                                # coordinate clustering (0 = edge_factor).
                                # xyz grid units are one-per-(cell,class), so
                                # candidate runs are ~1-2 long and the real
                                # edge need is ~5x lower than the shifted
                                # grid's (measured: ~178k vs ~781k edges at
                                # 40960 units; tools/probe_edge_total.py) —
                                # every edge-buffer op scales with this cap
    shifted_grid_cell: float = 0.0  # >0: cell size for the SHIFTED-grid
                                    # units (0 = data.voxel_size). Setting it
                                    # EQUAL to the cluster radius puts the
                                    # shifted clustering on cluster_step's
                                    # W=1 fast path (<= 1 unit per hash cell)
    grid_extent: tuple = ()     # (X, Y, Z) level-0 extent for the dense-grid
                                # backbone (model.network.dense_grid; see
                                # ops/dense_grid.py). Voxels beyond it are
                                # dropped and surfaced as diag grid_dropped
    grid_batch: int = 1         # scenes per shard (the dense grid's B axis)
    cc_coarsen: int = 0         # >0: after two full-graph CC sweeps, compact
                                # the distinct cross-root pairs into this many
                                # edge slots and hook on that list instead of
                                # the (K, N) table (ops/cluster.py). Pure
                                # speed knob — labels are bit-identical for
                                # any value (the final full-graph loop always
                                # runs to the unique fixpoint)
    cc_coarsen_sweeps: int = 2  # full-graph sweeps before the coarse pair
                                # extraction; 1 trades a bigger pair list for
                                # one fewer (K, N) sweep. Labels identical.
    bq_grid_max_m: int = 1      # use the direct single-occupancy grid ball
                                # query (ops/ballquery.py::ball_query_grid)
                                # when radius <= this many unit-grid cells:
                                # m=1 is bit-identical to the old fused W=1
                                # path; m=2 would replace the shifted grid's
                                # edge-buffer path (semantics-equal, nothing
                                # dropped) but measures SLOWER there — the
                                # wide-offset union sort dominates
                                # (tools/microbench_cluster4.py round 4).

    @classmethod
    def from_cfg(cls, cfg, split: str) -> "StaticCaps":
        caps = cfg.data.caps
        v = caps.voxels if split == "train" else caps.eval_voxels
        inst = caps.instances if split == "train" else caps.eval_instances
        n_levels = len(cfg.model.network.blocks)
        points = caps.points if split == "train" else caps.eval_points
        return cls(
            voxel_caps=tuple(max(v // d, 1024) for d in caps.level_divisors[:n_levels]),
            instances=inst,
            clusters=caps.clusters,
            proposals=caps.proposals,
            neighbors=caps.neighbors,
            window=caps.cell_window,
            cc_iters=caps.cc_iters,
            proposal_voxel_caps=(caps.proposal_voxels, max(caps.proposal_voxels // 2, 1024)),
            cluster_units=min(caps.get("cluster_units", 65536), points),
            unit_clustering=caps.get("cluster_granularity", "unit") == "unit",
            half_space=bool(caps.get("bq_half_space", False)),
            edge_factor=int(caps.get("bq_edge_factor", 0)),
            shifted_units=bool(caps.get("shifted_units", False)),
            cluster_units_shifted=int(caps.get("cluster_units_shifted", 0))
            or min(caps.get("cluster_units", 65536), points),
            xyz_grid_cell=float(caps.get("cluster_cell_xyz", 0.0)),
            edge_factor_xyz=int(caps.get("bq_edge_factor_xyz", 0)),
            shifted_grid_cell=float(caps.get("cluster_cell_shifted", 0.0)),
            grid_extent=tuple(int(g) for g in (caps.get("grid", None) or ())),
            grid_batch=int(cfg.data.batch_size) if split == "train" else 1,
            bq_grid_max_m=int(caps.get("bq_grid_max_m", 1)),
            cc_coarsen=int(caps.get("cc_coarsen", 0)),
            cc_coarsen_sweeps=int(caps.get("cc_coarsen_sweeps", 2)),
        )

"""Dense-grid conv ops must reproduce the sparse gather-GEMM path exactly
(same weights, float32): the masked-dense equivalence ops/dense_grid.py is
built on, checked op-by-op against ops/sparse_conv.py on random scenes."""

import numpy as np
import jax.numpy as jnp

from minsu3d_tpu.ops import dense_grid as dg
from minsu3d_tpu.ops import sparse, sparse_conv

from test_sparse import pad, random_voxels


def _plan(rng, n=220, cap=256, levels=3, extent=17, c=8):
    batch, coords = random_voxels(rng, n, extent=extent, batches=2)
    n = len(batch)
    feats = rng.normal(size=(n, c)).astype(np.float32)
    caps = [cap for _ in range(levels)]
    plan, _, feats_v = sparse.build_plan(
        jnp.array(pad(batch, cap)), jnp.array(pad(coords, cap)),
        jnp.arange(cap) < n, caps, levels, jnp.array(pad(feats, cap)))
    shape0 = (extent, extent, extent)  # odd extent exercises SAME end-padding
    ctx = dg.build_ctx(plan, shape0, n_batch=2)
    return plan, ctx, feats_v


def _to_grid(feats, level, shape, n_batch):
    flat, _ = dg._flat_index(level, shape, n_batch)
    size = n_batch * shape[0] * shape[1] * shape[2]
    g = jnp.zeros((size + 1, feats.shape[-1]), feats.dtype).at[flat].set(feats)
    return g[:size].reshape((n_batch,) + shape + (feats.shape[-1],))


def _from_grid(grid, level, shape, n_batch):
    flat, _ = dg._flat_index(level, shape, n_batch)
    c = grid.shape[-1]
    f = jnp.concatenate([grid.reshape(-1, c), jnp.zeros((1, c), grid.dtype)], 0)
    return f[flat]


class TestDenseGridOps:
    def test_scatter_gather_roundtrip(self):
        rng = np.random.default_rng(21)
        plan, ctx, feats_v = _plan(rng)
        g = dg.scatter_to_grid(feats_v, ctx, 2)
        back = np.asarray(dg.gather_from_grid(g, ctx))
        v = np.asarray(plan.levels[0].valid)
        np.testing.assert_array_equal(back[v], np.asarray(feats_v)[v])
        # occupancy mask matches the scatter
        assert bool(jnp.all((jnp.abs(g).sum(-1) > 0) <= ctx.masks[0]))
        assert int(ctx.n_dropped) == 0

    def test_out_of_grid_drops_counted(self):
        rng = np.random.default_rng(22)
        plan, _, _ = _plan(rng, extent=17)
        ctx = dg.build_ctx(plan, (8, 17, 17), n_batch=2)  # x extent too small
        v = np.asarray(plan.levels[0].valid)
        x = np.asarray(plan.levels[0].coords[:, 0])
        assert int(ctx.n_dropped) == int((v & (x >= 8)).sum()) > 0

    def test_subm_matches_sparse(self):
        rng = np.random.default_rng(23)
        plan, ctx, feats_v = _plan(rng)
        lvl = plan.levels[0]
        w = jnp.array(rng.normal(size=(27, 8, 5)).astype(np.float32) * 0.2)
        ref = np.asarray(sparse_conv.subm_conv(feats_v, lvl, w))
        g = dg.scatter_to_grid(feats_v, ctx, 2)
        out = dg.subm_conv_grid(g, ctx.masks[0], w)
        got = np.asarray(_from_grid(out, lvl, ctx.shapes[0], 2))
        v = np.asarray(lvl.valid)
        np.testing.assert_allclose(got[v], ref[v], rtol=1e-5, atol=1e-5)
        # empty cells stay exactly zero (the submanifold invariant)
        assert float(jnp.abs(jnp.where(ctx.masks[0][..., None], 0, out)).max()) == 0.0

    def test_down_matches_sparse(self):
        rng = np.random.default_rng(24)
        plan, ctx, feats_v = _plan(rng)
        child, parent = plan.levels[0], plan.levels[1]
        wd = jnp.array(rng.normal(size=(8, 8, 6)).astype(np.float32) * 0.2)
        ref = np.asarray(sparse_conv.down_conv(feats_v, child, parent.cap, wd))
        g = dg.scatter_to_grid(feats_v, ctx, 2)
        out = dg.down_conv_grid(g, ctx.masks[1], wd)
        got = np.asarray(_from_grid(out, parent, ctx.shapes[1], 2))
        v = np.asarray(parent.valid)
        np.testing.assert_allclose(got[v], ref[v], rtol=1e-5, atol=1e-5)

    def test_up_matches_sparse(self):
        rng = np.random.default_rng(25)
        plan, ctx, feats_v = _plan(rng)
        child, parent = plan.levels[0], plan.levels[1]
        pf = jnp.array(rng.normal(size=(parent.cap, 6)).astype(np.float32))
        pf = jnp.where(parent.valid[:, None], pf, 0)
        wu = jnp.array(rng.normal(size=(8, 6, 8)).astype(np.float32) * 0.2)
        ref = np.asarray(sparse_conv.up_conv(pf, child, wu))
        pg = _to_grid(pf, parent, ctx.shapes[1], 2)
        out = dg.up_conv_grid(pg, ctx.masks[0], wu)
        got = np.asarray(_from_grid(out, child, ctx.shapes[0], 2))
        v = np.asarray(child.valid)
        np.testing.assert_allclose(got[v], ref[v], rtol=1e-5, atol=1e-5)

    def test_grid_shapes_parent_halving(self):
        assert dg.grid_shapes((17, 16, 5), 3) == ((17, 16, 5), (9, 8, 3), (5, 4, 2))


def test_backbone_grid_matches_row_major():
    """Full Backbone forward in dense-grid mode must reproduce the sparse
    row-major outputs with the SAME params (f32, eval + train modes,
    batch_stats updates included) — checkpoints are layout-interchangeable."""
    import jax
    from helpers import tiny_cfg, make_batch
    from minsu3d_tpu.model import general_model as gm
    from minsu3d_tpu.model.module import Backbone

    cfg = tiny_cfg()
    batch, arrays, items = make_batch(cfg, "val", 1, seed=3)
    n_levels = len(cfg.model.network.blocks)
    caps = gm.backbone_caps(cfg, "val")
    plan, v2p, vfeats = gm.build_scene_plan(arrays, caps[:n_levels], n_levels)
    cmax = np.asarray(jnp.max(jnp.where(plan.levels[0].valid[:, None],
                                        plan.levels[0].coords, 0), axis=0))
    ctx = dg.build_ctx(plan, tuple(int(c) + 1 for c in cmax), n_batch=1)
    assert int(ctx.n_dropped) == 0

    kw = dict(input_channel=6, output_channel=cfg.model.network.m,
              block_channels=tuple(cfg.model.network.blocks),
              block_reps=cfg.model.network.block_reps, sem_classes=20)
    row_net = Backbone(**kw)
    grid_net = Backbone(**kw, grid=True)
    variables = row_net.init(jax.random.PRNGKey(0), vfeats, plan, v2p,
                             arrays["point_mask"], False)
    out_row = row_net.apply(variables, vfeats, plan, v2p, arrays["point_mask"], False)
    out_g = grid_net.apply(variables, vfeats, plan, v2p, arrays["point_mask"],
                           False, dense_ctx=ctx)
    for k in out_row:
        np.testing.assert_allclose(np.asarray(out_g[k]), np.asarray(out_row[k]),
                                   rtol=2e-4, atol=2e-4)

    out_row, mrow = row_net.apply(variables, vfeats, plan, v2p, arrays["point_mask"],
                                  True, mutable=["batch_stats"])
    out_g, mg = grid_net.apply(variables, vfeats, plan, v2p, arrays["point_mask"],
                               True, mutable=["batch_stats"], dense_ctx=ctx)
    for k in out_row:
        np.testing.assert_allclose(np.asarray(out_g[k]), np.asarray(out_row[k]),
                                   rtol=2e-4, atol=2e-4)
    flat_r = jax.tree_util.tree_leaves_with_path(mrow["batch_stats"])
    flat_g = dict(jax.tree_util.tree_leaves_with_path(mg["batch_stats"]))
    for path, leaf in flat_r:
        np.testing.assert_allclose(np.asarray(flat_g[path]), np.asarray(leaf),
                                   rtol=2e-4, atol=2e-4)


import pytest


@pytest.mark.parametrize("model", ["pointgroup", "hais", "softgroup"])
@pytest.mark.parametrize("backend", ["dense_grid", "channel_major"])
def test_model_forward_backend_matches(model, backend):
    """Every model's optional backbone backends (model.network.dense_grid,
    model.network.channel_major) must match the sparse row-major default:
    full train-mode forward (batch of 2 scenes), same params, same losses to
    float tolerance; dense grid additionally reports grid_dropped=0 at a
    sufficient extent. Guards e.g. the round-3 SoftGroup dense-grid
    NameError (dg import was missing from softgroup.py)."""
    import jax
    from helpers import tiny_cfg, make_batch
    from minsu3d_tpu.model import get_model
    from minsu3d_tpu.model.caps import StaticCaps

    if backend == "dense_grid":
        # 256 cells = 5.1 m at 2 cm: train-split augmentation draws an
        # UNSEEDED rng (dataset.py), so the rotated/elastic 2.5 m room's
        # voxel extent varies run to run — 224 was occasionally 1 cell short
        extra = ["model.network.dense_grid=True", "data.caps.grid=[256,256,256]",
                 "model.trainer.precision=float32"]
    else:
        extra = ["model.network.channel_major=True", "model.trainer.precision=float32"]
    cfg_b = tiny_cfg(model, extra=extra)
    cfg_s = tiny_cfg(model, extra=["model.trainer.precision=float32"])
    batch, arrays, items = make_batch(cfg_b, "train", 2, room=2.5)
    bundle = get_model({"pointgroup": "PointGroup", "hais": "HAIS",
                        "softgroup": "SoftGroup"}[model])
    caps = StaticCaps.from_cfg(cfg_b, "train")
    fflags = bundle.forward_flags(cfg_b, 999, True)
    lflags = bundle.loss_flags(cfg_b, 999)

    key = jax.random.PRNGKey(0)
    net_s = bundle.make_net(cfg_s, "train")
    net_b = bundle.make_net(cfg_b, "train")
    variables = jax.jit(lambda k, b: net_s.init(
        {"params": k, "cluster": k}, b, True, True, **fflags))(key, arrays)

    def run(net, cfg):
        out, _ = net.apply(variables, arrays, True, True, **fflags,
                           rngs={"cluster": key}, mutable=["batch_stats"])
        losses = bundle.losses(cfg, caps, arrays, out, True, **lflags)
        return out, {k: float(v) for k, v in losses.items()}

    out_s, ls = run(net_s, cfg_s)
    out_b, lb = run(net_b, cfg_b)
    if backend == "dense_grid":
        assert int(out_b["diag"]["grid_dropped"]) == 0
    for k in ls:
        np.testing.assert_allclose(lb[k], ls[k], rtol=1e-3, atol=1e-4, err_msg=k)

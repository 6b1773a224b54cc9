"""model.network.remat must not change training numerics: the backward pass
recomputes each residual block's interior (the (27V, Cin) gathered neighbor
tables) instead of saving it — same ops in the same order, run twice — so
losses, gradients, and batch stats must match the default path. The flag
exists because a batch-4 ScanNet-scale train step saves 19.3G of activations
vs the 15.7G HBM of a v5e chip (bench.py train mode runs with it)."""

import jax
import numpy as np
import pytest

from helpers import make_batch, tiny_cfg
from minsu3d_tpu.model import get_model
from minsu3d_tpu.model.caps import StaticCaps

MODELS = {"pointgroup": "PointGroup", "hais": "HAIS", "softgroup": "SoftGroup"}


# all three models: the flag also remats the dense TinyUnet proposal heads
# (HAIS/SoftGroup saved-volume VJP once OOMed the train bench with only the
# backbone rematted), so each model's full train step must stay identical
@pytest.mark.parametrize("model", list(MODELS))
def test_remat_matches_default(model):
    cfg_r = tiny_cfg(model, extra=["model.network.remat=true",
                                   "model.trainer.precision=float32"])
    cfg_s = tiny_cfg(model, extra=["model.trainer.precision=float32"])
    batch, arrays, items = make_batch(cfg_s, "train", 2, room=2.5)
    arrays = jax.device_put(arrays)  # numpy inputs can't be tracer-indexed
    bundle = get_model(MODELS[model])
    caps = StaticCaps.from_cfg(cfg_s, "train")
    fflags = bundle.forward_flags(cfg_s, 999, True)
    lflags = bundle.loss_flags(cfg_s, 999)

    key = jax.random.PRNGKey(0)
    net_s = bundle.make_net(cfg_s, "train")
    net_r = bundle.make_net(cfg_r, "train")
    assert net_r.remat and not net_s.remat
    variables = jax.jit(lambda k, b: net_s.init(
        {"params": k, "cluster": k}, b, True, True, **fflags))(key, arrays)
    params, bstats = variables["params"], variables["batch_stats"]

    def run(net, cfg):
        def loss_fn(params):
            out, mut = net.apply({"params": params, "batch_stats": bstats},
                                 arrays, True, True, **fflags,
                                 rngs={"cluster": key}, mutable=["batch_stats"])
            losses = bundle.losses(cfg, caps, arrays, out, True, **lflags)
            return sum(losses.values()), mut["batch_stats"]

        (loss, new_bs), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True))(params)
        return loss, grads, new_bs

    loss_s, grads_s, bs_s = run(net_s, cfg_s)
    loss_r, grads_r, bs_r = run(net_r, cfg_r)

    np.testing.assert_allclose(float(loss_r), float(loss_s), rtol=1e-5)
    # the remat'd param tree must be structurally identical (same checkpoint
    # format either way) and every gradient must match
    flat_s = dict(jax.tree_util.tree_leaves_with_path(grads_s))
    flat_r = dict(jax.tree_util.tree_leaves_with_path(grads_r))
    assert flat_s.keys() == flat_r.keys()
    for path, leaf in flat_s.items():
        np.testing.assert_allclose(np.asarray(flat_r[path]), np.asarray(leaf),
                                   rtol=1e-4, atol=1e-5, err_msg=str(path))
    for path, leaf in jax.tree_util.tree_leaves_with_path(bs_s):
        np.testing.assert_allclose(
            np.asarray(dict(jax.tree_util.tree_leaves_with_path(bs_r))[path]),
            np.asarray(leaf), rtol=1e-5, atol=1e-6, err_msg=str(path))


def test_selective_remat_matches_default():
    """model.network.remat=N (int) remats only the N shallowest UNet levels —
    numerics and param-tree structure must match the unremat'd step exactly
    (same rationale as the bool flag; the int trades less recompute time for
    more saved-activation HBM on the deep, small levels)."""
    cfg_r = tiny_cfg("pointgroup", extra=["model.network.remat=2",
                                          "model.trainer.precision=float32"])
    cfg_s = tiny_cfg("pointgroup", extra=["model.trainer.precision=float32"])
    batch, arrays, items = make_batch(cfg_s, "train", 2, room=2.5)
    arrays = jax.device_put(arrays)
    bundle = get_model("PointGroup")
    caps = StaticCaps.from_cfg(cfg_s, "train")
    fflags = bundle.forward_flags(cfg_s, 999, True)
    lflags = bundle.loss_flags(cfg_s, 999)

    key = jax.random.PRNGKey(0)
    net_s = bundle.make_net(cfg_s, "train")
    net_r = bundle.make_net(cfg_r, "train")
    assert net_r.remat == 2 and not isinstance(net_r.remat, bool)
    variables = jax.jit(lambda k, b: net_s.init(
        {"params": k, "cluster": k}, b, True, True, **fflags))(key, arrays)
    params, bstats = variables["params"], variables["batch_stats"]

    def run(net, cfg):
        def loss_fn(params):
            out, mut = net.apply({"params": params, "batch_stats": bstats},
                                 arrays, True, True, **fflags,
                                 rngs={"cluster": key}, mutable=["batch_stats"])
            losses = bundle.losses(cfg, caps, arrays, out, True, **lflags)
            return sum(losses.values()), mut["batch_stats"]

        (loss, new_bs), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True))(params)
        return loss, grads, new_bs

    loss_s, grads_s, _ = run(net_s, cfg_s)
    loss_r, grads_r, _ = run(net_r, cfg_r)
    np.testing.assert_allclose(float(loss_r), float(loss_s), rtol=1e-5)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(grads_s))
    flat_r = dict(jax.tree_util.tree_leaves_with_path(grads_r))
    assert flat_s.keys() == flat_r.keys()
    for path, leaf in flat_s.items():
        np.testing.assert_allclose(np.asarray(flat_r[path]), np.asarray(leaf),
                                   rtol=1e-4, atol=1e-5, err_msg=str(path))


def test_conv_remat_matches_default():
    """model.network.remat="conv" checkpoints each sparse CONV instead of each
    residual block: the backward rebuilds only the gathered neighbor tables
    (XLA prunes the recomputed GEMM), while BN/relu/GEMM outputs stay saved.
    Numerics and the param tree must match the unremat'd step exactly."""
    # blocked_subm on BOTH configs: under remat="conv" the blocked convs take
    # the hand-written gather-form VJP (sparse_conv.subm_conv_blocked_vjp),
    # so this also checks that custom backward inside the full train step
    cfg_r = tiny_cfg("pointgroup", extra=["model.network.remat=conv",
                                          "model.network.blocked_subm=[256,128,64]",
                                          "model.trainer.precision=float32"])
    cfg_s = tiny_cfg("pointgroup", extra=["model.network.blocked_subm=[256,128,64]",
                                          "model.trainer.precision=float32"])
    batch, arrays, items = make_batch(cfg_s, "train", 2, room=2.5)
    arrays = jax.device_put(arrays)
    bundle = get_model("PointGroup")
    caps = StaticCaps.from_cfg(cfg_s, "train")
    fflags = bundle.forward_flags(cfg_s, 999, True)
    lflags = bundle.loss_flags(cfg_s, 999)

    key = jax.random.PRNGKey(0)
    net_s = bundle.make_net(cfg_s, "train")
    net_r = bundle.make_net(cfg_r, "train")
    assert net_r.remat == "conv"
    variables = jax.jit(lambda k, b: net_s.init(
        {"params": k, "cluster": k}, b, True, True, **fflags))(key, arrays)
    params, bstats = variables["params"], variables["batch_stats"]

    def run(net, cfg):
        def loss_fn(params):
            out, mut = net.apply({"params": params, "batch_stats": bstats},
                                 arrays, True, True, **fflags,
                                 rngs={"cluster": key}, mutable=["batch_stats"])
            losses = bundle.losses(cfg, caps, arrays, out, True, **lflags)
            return sum(losses.values()), mut["batch_stats"]

        (loss, new_bs), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True))(params)
        return loss, grads, new_bs

    loss_s, grads_s, _ = run(net_s, cfg_s)
    loss_r, grads_r, _ = run(net_r, cfg_r)
    np.testing.assert_allclose(float(loss_r), float(loss_s), rtol=1e-5)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(grads_s))
    flat_r = dict(jax.tree_util.tree_leaves_with_path(grads_r))
    assert flat_s.keys() == flat_r.keys()
    for path, leaf in flat_s.items():
        np.testing.assert_allclose(np.asarray(flat_r[path]), np.asarray(leaf),
                                   rtol=1e-4, atol=1e-5, err_msg=str(path))

"""Checkpoint-converter tests: a pure-torch skeleton of the reference model
(same module/attribute layout as reference minsu3d/model/module/{backbone.py,
common.py,tiny_unet.py} with ME layers stubbed by parameter holders) produces
a state_dict with the reference's exact key names; the converter must consume
every key, fill every flax leaf, and preserve numerics through the
linear/BN/conv layout transforms."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tools.convert_checkpoint import conv_k2, conv_k3, convert_tree, linear  # noqa: E402


# -- reference skeleton (state_dict layout only; ME layers are param stubs) ----

class MEConv(nn.Module):
    """ME.MinkowskiConvolution param layout: kernel (K^3, in, out); 2-D
    (in, out) when kernel_size == 1. No bias (ME default)."""

    def __init__(self, i, o, k):
        super().__init__()
        shape = (i, o) if k == 1 else (k ** 3, i, o)
        self.kernel = nn.Parameter(torch.randn(shape))


class MEBN(nn.Module):
    """ME.MinkowskiBatchNorm wraps BatchNorm1d as attribute ``bn``."""

    def __init__(self, c):
        super().__init__()
        self.bn = nn.BatchNorm1d(c)


def residual_block(i, o):
    """reference common.py:22-48."""
    m = nn.Module()
    if i != o:
        m.downsample = nn.Sequential(MEConv(i, o, 1))
    m.conv_branch = nn.Sequential(
        MEBN(i), nn.ReLU(), MEConv(i, o, 3), MEBN(o), nn.ReLU(), MEConv(o, o, 3))
    return m


def ublock(planes, reps):
    """reference common.py:51-95."""
    m = nn.Module()
    m.blocks = nn.Sequential()
    for r in range(reps):
        m.blocks.add_module(f"block{r}", residual_block(planes[0], planes[0]))
    if len(planes) > 1:
        m.conv = nn.Sequential(MEBN(planes[0]), nn.ReLU(), MEConv(planes[0], planes[1], 2))
        m.u = ublock(planes[1:], reps)
        m.deconv = nn.Sequential(MEBN(planes[1]), nn.ReLU(), MEConv(planes[1], planes[0], 2))
        m.blocks_tail = nn.Sequential()
        for r in range(reps):
            m.blocks_tail.add_module(f"block{r}",
                                     residual_block(planes[0] * (2 - r), planes[0]))
    return m


def point_branch(c, out):
    """reference backbone.py:20-33 (plain BatchNorm1d, not Minkowski)."""
    return nn.Sequential(nn.Linear(c, c), nn.BatchNorm1d(c), nn.ReLU(), nn.Linear(c, out))


def backbone(in_c, m, blocks, reps, classes):
    """reference backbone.py:8-43."""
    b = nn.Module()
    b.unet = nn.Sequential(MEConv(in_c, m, 3), ublock([m * c for c in blocks], reps),
                           MEBN(m), nn.ReLU())
    b.semantic_branch = point_branch(m, classes)
    b.offset_branch = point_branch(m, 3)
    return b


def tiny_unet(c):
    """reference tiny_unet.py:7-19."""
    t = nn.Module()
    t.unet = nn.Sequential(ublock([c, 2 * c], 2), MEBN(c), nn.ReLU())
    return t


def fake_reference_model(name, in_c, m, blocks, reps, classes, inst_classes=18):
    mdl = nn.Module()
    mdl.backbone = backbone(in_c, m, blocks, reps, classes)
    if name == "PointGroup":
        mdl.score_net = tiny_unet(m)
        mdl.score_branch = nn.Linear(m, 1)
    elif name == "HAIS":
        mdl.tiny_unet = tiny_unet(m)
        mdl.score_branch = nn.Linear(m, 1)
        mdl.mask_branch = nn.Sequential(nn.Linear(m, m), nn.ReLU(), nn.Linear(m, 1))
    elif name == "SoftGroup":
        k1 = inst_classes + 1
        mdl.tiny_unet = tiny_unet(m)
        mdl.classification_branch = nn.Linear(m, k1)
        mdl.mask_scoring_branch = nn.Sequential(nn.Linear(m, m), nn.ReLU(), nn.Linear(m, k1))
        mdl.iou_score = nn.Linear(m, k1)
    return mdl


# -- flax template --------------------------------------------------------------

def flax_variables(model_name):
    from minsu3d_tpu.config import load_config
    from minsu3d_tpu.data.batching import collate, device_arrays, shard_caps
    from minsu3d_tpu.data.dataset import GeneralDataset
    from minsu3d_tpu.data.synthetic import make_scene
    from minsu3d_tpu.model import get_model

    cfg = load_config([
        f"model={model_name.lower()}", "data=synthetic",
        "model.network.m=4", "model.network.blocks=[1,2]", "model.network.block_reps=2",
        "data.caps.eval_points=4096", "data.caps.eval_voxels=4096",
        "data.caps.eval_instances=16",
        "data.caps.clusters=32", "data.caps.proposals=16",
        "data.caps.neighbors=8", "data.caps.cell_window=8",
    ])
    scene = make_scene(seed=0, num_objects=2, points_per_object=200, floor_points=500)
    ds = GeneralDataset(cfg, "val", scenes=[scene])
    batch = device_arrays(collate([ds[0]], shard_caps(cfg, "val")))
    net = get_model(model_name).make_net(cfg, "val")
    variables = net.init({"params": jax.random.PRNGKey(0), "cluster": jax.random.PRNGKey(0)},
                         batch, False, True)
    return cfg, net, batch, jax.tree.map(np.asarray, variables)


@pytest.mark.parametrize("name", ["PointGroup", "HAIS", "SoftGroup"])
def test_convert_full_model(name):
    cfg, net, batch, variables = flax_variables(name)
    classes = cfg.data.classes
    inst_classes = classes - len(cfg.data.ignore_classes)
    tm = fake_reference_model(name, 6, 4, [1, 2], 2, classes, inst_classes)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    converted, consumed = convert_tree(name, variables, sd)

    # every torch tensor consumed (params once, BN stats once)
    expected = {k for k in sd if not k.endswith("num_batches_tracked")}
    assert set(consumed) == expected, sorted(expected - set(consumed))[:5]

    # structure identical to the template
    assert (jax.tree.structure(converted["params"])
            == jax.tree.structure(variables["params"]))
    assert (jax.tree.structure(converted["batch_stats"])
            == jax.tree.structure(variables["batch_stats"]))

    # and the converted weights actually run end-to-end
    out = jax.jit(lambda v, b: net.apply(v, b, False, True))(
        jax.tree.map(jnp.asarray, converted), batch)
    assert np.isfinite(np.asarray(out["semantic_scores"])).all()


def test_point_branch_numerics():
    """Linear->BN1d->ReLU->Linear parity torch vs converted flax PointMLP."""
    from minsu3d_tpu.model.module.blocks import PointMLP

    torch.manual_seed(0)
    branch = point_branch(6, 5).eval()
    # give BN non-trivial stats
    with torch.no_grad():
        branch[1].running_mean.uniform_(-0.5, 0.5)
        branch[1].running_var.uniform_(0.5, 2.0)
        branch[1].weight.uniform_(0.5, 1.5)
        branch[1].bias.uniform_(-0.2, 0.2)

    x = np.random.default_rng(0).normal(size=(12, 6)).astype(np.float32)
    want = branch(torch.from_numpy(x)).detach().numpy()

    params = {
        "Dense_0": {"kernel": linear(branch[0].weight.detach().numpy()),
                    "bias": branch[0].bias.detach().numpy()},
        "MaskedBatchNorm_0": {"scale": branch[1].weight.detach().numpy(),
                              "bias": branch[1].bias.detach().numpy()},
        "Dense_1": {"kernel": linear(branch[3].weight.detach().numpy()),
                    "bias": branch[3].bias.detach().numpy()},
    }
    stats = {"MaskedBatchNorm_0": {"mean": branch[1].running_mean.numpy(),
                                   "var": branch[1].running_var.numpy()}}
    got = PointMLP(6, 5).apply({"params": params, "batch_stats": stats},
                               jnp.asarray(x), jnp.ones(12, bool), False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_k3_tap_permutation_numerics():
    """ME x-fastest tap enumeration vs our dense (kx,ky,kz) kernel layout:
    out(x) = sum_k w[k] * in(x + off_k) must agree on a dense grid."""
    from minsu3d_tpu.model.module.dense_blocks import DenseSubmConv

    rng = np.random.default_rng(1)
    s, ci, co = 5, 3, 2
    w_me = rng.normal(size=(27, ci, co)).astype(np.float32)
    vol = rng.normal(size=(1, s, s, s, ci)).astype(np.float32)

    # ME semantics, x-fastest taps: k = (dx+1) + 3(dy+1) + 9(dz+1)
    want = np.zeros((1, s, s, s, co), np.float32)
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                k = (dx + 1) + 3 * (dy + 1) + 9 * (dz + 1)
                for x in range(s):
                    for y in range(s):
                        for z in range(s):
                            xs, ys, zs = x + dx, y + dy, z + dz
                            if 0 <= xs < s and 0 <= ys < s and 0 <= zs < s:
                                want[0, x, y, z] += vol[0, xs, ys, zs] @ w_me[k]

    occ = jnp.ones((1, s, s, s), bool)
    got = DenseSubmConv(ci, co).apply(
        {"params": {"kernel": jnp.asarray(conv_k3(w_me, "x-fastest", dense=True))}},
        jnp.asarray(vol), occ)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def _sparse_plan(rng, n=60, cap=96, s=6, ci=3):
    """Small 2-level sparse plan + dense volume holding the same features."""
    from minsu3d_tpu.ops import sparse

    from test_sparse import pad  # noqa: PLC0415

    coords = rng.choice(s ** 3, size=n, replace=False)
    coords = np.stack([coords // (s * s), (coords // s) % s, coords % s],
                      axis=1).astype(np.int32)
    batch = np.zeros(n, np.int32)
    feats = rng.normal(size=(n, ci)).astype(np.float32)
    plan, _, feats_v = sparse.build_plan(
        jnp.array(pad(batch, cap)), jnp.array(pad(coords, cap)),
        jnp.arange(cap) < n, [cap, cap], 2, jnp.array(pad(feats, cap)))
    vol = np.zeros((1, ci, s, s, s), np.float32)  # torch NCDHW, D=x H=y W=z
    # advanced indexing moves the indexed axes to the FRONT: result (n, ci)
    vol[0, :, coords[:, 0], coords[:, 1], coords[:, 2]] = feats
    return plan, feats_v, vol, s


def _torch_w3(w_me, tap_order):
    """Unpack an ME (27, ci, co) kernel into torch conv3d (co, ci, 3, 3, 3)
    under the given tap-enumeration rule. ME stride-1 conv evaluates
    out(x) = sum_k w[k] * in(x + off_k) at every input coordinate — dense
    cross-correlation (= torch conv3d, padding 1) read back at the inputs."""
    w = np.zeros((w_me.shape[2], w_me.shape[1], 3, 3, 3), np.float32)
    for dx in range(3):
        for dy in range(3):
            for dz in range(3):
                k = (dx + 3 * dy + 9 * dz) if tap_order == "x-fastest" \
                    else (9 * dx + 3 * dy + dz)
                w[:, :, dx, dy, dz] = w_me[k].T
    return torch.from_numpy(w)


@pytest.mark.parametrize("tap_order", ["x-fastest", "z-fastest"])
def test_sparse_subm_conv_matches_torch_reference(tap_order):
    """Round-trip lock for the ME tap-order assumption (no egress: ME itself
    is not installed, so this pins SELF-consistency): a synthetic ME-layout
    kernel packed under ``tap_order`` and pushed through the converter's
    conv_k3 must make our sparse subm_conv reproduce the torch conv3d
    forward exactly — and the OPPOSITE tap order must NOT (asymmetric
    kernel), so the default can't silently be the flipped one."""
    import torch.nn.functional as F
    from minsu3d_tpu.ops import sparse_conv

    rng = np.random.default_rng(7)
    plan, feats_v, vol, s = _sparse_plan(rng)
    ci, co = 3, 4
    w_me = rng.normal(size=(27, ci, co)).astype(np.float32)

    want_vol = F.conv3d(torch.from_numpy(vol), _torch_w3(w_me, tap_order),
                        padding=1).numpy()  # (1, co, s, s, s)
    lvl = plan.levels[0]
    v = np.asarray(lvl.valid)
    c = np.asarray(lvl.coords)[v]
    # scalar 0 + coord arrays are non-adjacent advanced indices -> (n, co)
    want = want_vol[0, :, c[:, 0], c[:, 1], c[:, 2]]

    got = np.asarray(sparse_conv.subm_conv(
        feats_v, lvl, jnp.asarray(conv_k3(w_me, tap_order, dense=False))))[v]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    wrong = "z-fastest" if tap_order == "x-fastest" else "x-fastest"
    got_wrong = np.asarray(sparse_conv.subm_conv(
        feats_v, lvl, jnp.asarray(conv_k3(w_me, wrong, dense=False))))[v]
    assert np.abs(got_wrong - want).max() > 1e-2


def test_sparse_down_conv_matches_torch_reference():
    """Same lock for the k2s2 downsampling conv: ME stride-2 conv is
    out(p) = sum_k w[k] * in(2p + off_k) = torch conv3d(stride=2)."""
    import torch.nn.functional as F
    from minsu3d_tpu.ops import sparse_conv

    rng = np.random.default_rng(8)
    plan, feats_v, vol, s = _sparse_plan(rng)
    ci, co = 3, 4
    w_me = rng.normal(size=(8, ci, co)).astype(np.float32)
    w_t = np.zeros((co, ci, 2, 2, 2), np.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w_t[:, :, dx, dy, dz] = w_me[dx + 2 * dy + 4 * dz].T
    want_vol = F.conv3d(torch.from_numpy(vol), torch.from_numpy(w_t),
                        stride=2).numpy()

    child, parent = plan.levels[0], plan.levels[1]
    got = np.asarray(sparse_conv.down_conv(
        feats_v, child, parent.cap,
        jnp.asarray(conv_k2(w_me, "x-fastest", dense=False))))
    pv = np.asarray(parent.valid)
    pc = np.asarray(parent.coords)[pv]
    want = want_vol[0, :, pc[:, 0], pc[:, 1], pc[:, 2]]
    np.testing.assert_allclose(got[pv], want, rtol=1e-4, atol=1e-4)


def test_k2_tap_permutation_numerics():
    """k2s2 strided conv: ME out(p) = sum_k w[k] * in(2p + off_k)."""
    from minsu3d_tpu.model.module.dense_blocks import _conv3d

    rng = np.random.default_rng(2)
    s, ci, co = 4, 3, 2
    w_me = rng.normal(size=(8, ci, co)).astype(np.float32)
    vol = rng.normal(size=(1, s, s, s, ci)).astype(np.float32)

    want = np.zeros((1, s // 2, s // 2, s // 2, co), np.float32)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                k = dx + 2 * dy + 4 * dz
                for x in range(s // 2):
                    for y in range(s // 2):
                        for z in range(s // 2):
                            want[0, x, y, z] += vol[0, 2 * x + dx, 2 * y + dy, 2 * z + dz] @ w_me[k]

    got = _conv3d(jnp.asarray(vol), jnp.asarray(conv_k2(w_me, "x-fastest", dense=True)), stride=2)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

"""Dense proposal-head blocks: masked dense conv must equal the sparse
submanifold conv at occupied sites (the claim the dense TinyUnet rests on),
and masked batch norm must follow torch BatchNorm semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from minsu3d_tpu.model.module.blocks import MaskedBatchNorm
from minsu3d_tpu.model.module.dense_blocks import DenseSubmConv
from minsu3d_tpu.ops import sparse, sparse_conv


def test_masked_dense_conv_equals_submanifold():
    rng = np.random.default_rng(0)
    s, cin, cout = 8, 6, 5
    occ = rng.random((1, s, s, s)) < 0.25
    n = int(occ.sum())
    feats_vol = np.where(occ[..., None], rng.normal(size=(1, s, s, s, cin)), 0).astype(np.float32)
    w = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.3

    # dense path
    dense = DenseSubmConv(cin, cout)
    vars_d = {"params": {"kernel": jnp.array(w.reshape(3, 3, 3, cin, cout))}}
    out_d = np.asarray(dense.apply(vars_d, jnp.array(feats_vol), jnp.array(occ)))

    # sparse path on the same occupied coordinates
    coords = np.stack(np.nonzero(occ[0]), 1).astype(np.int32)
    cap = 64 + n
    pad = lambda a, fill=0: np.concatenate(
        [a, np.full((cap - len(a),) + a.shape[1:], fill, a.dtype)])
    level, r2v, feats_v = sparse.build_base(
        jnp.array(pad(np.zeros(n, np.int32))), jnp.array(pad(coords)),
        jnp.arange(cap) < n,
        cap, jnp.array(pad(feats_vol[0][occ[0]].astype(np.float32))))
    level = sparse.add_neighbors(level)
    out_s = np.asarray(sparse_conv.subm_conv(feats_v, level, jnp.array(w)))

    got_sparse = out_s[np.asarray(r2v)[:n]]
    got_dense = out_d[0][occ[0]]
    np.testing.assert_allclose(got_dense, got_sparse, rtol=1e-4, atol=1e-5)
    # empty sites stay zero in the dense path
    assert np.abs(out_d[0][~occ[0]]).max() == 0


def test_masked_batchnorm_torch_semantics():
    rng = np.random.default_rng(1)
    n, c = 64, 4
    x = rng.normal(2.0, 3.0, (n, c)).astype(np.float32)
    mask = rng.random(n) > 0.3

    bn = MaskedBatchNorm(c)
    variables = bn.init(jax.random.PRNGKey(0), jnp.array(x), jnp.array(mask), True)
    y, mutated = bn.apply(variables, jnp.array(x), jnp.array(mask), True,
                          mutable=["batch_stats"])
    y = np.asarray(y)

    xm = x[mask]
    mean = xm.mean(0)
    var = xm.var(0)  # biased, as torch uses for normalization
    expect = (xm - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(y[mask], expect, rtol=1e-4, atol=1e-5)
    assert np.abs(y[~mask]).max() == 0

    # running stats: momentum 0.1, unbiased variance (torch convention)
    ra_mean = np.asarray(mutated["batch_stats"]["mean"])
    ra_var = np.asarray(mutated["batch_stats"]["var"])
    np.testing.assert_allclose(ra_mean, 0.1 * mean, rtol=1e-4, atol=1e-5)
    unbiased = var * len(xm) / (len(xm) - 1)
    np.testing.assert_allclose(ra_var, 0.9 * 1.0 + 0.1 * unbiased, rtol=1e-4)

    # eval mode uses running stats
    vars2 = {"params": variables["params"], "batch_stats": mutated["batch_stats"]}
    y_eval = np.asarray(bn.apply(vars2, jnp.array(x), jnp.array(mask), False))
    expect_eval = (x[mask] - ra_mean) / np.sqrt(ra_var + 1e-5)
    np.testing.assert_allclose(y_eval[mask], expect_eval, rtol=1e-4, atol=1e-4)

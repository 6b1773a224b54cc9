"""Dense 3D-conv refinement blocks for proposal mini-grids.

The reference runs its TinyUnet score/mask heads on a *sparse* re-voxelization
of each proposal (general_model.py:152-193 + tiny_unet.py). Proposal grids are
tiny (spatial_shape 14..20 per proposal), so on TPU the right structure is a
DENSE (P, S, S, S, C) volume: 3D convolutions map straight onto the MXU and no
coordinate hashing happens mid-forward. Masking every conv output by the
occupancy volume makes dense convolution numerically IDENTICAL to the
submanifold sparse conv (empty neighbors contribute zeros either way; outputs
exist only at occupied sites).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from minsu3d_tpu.model.module.blocks import MaskedBatchNorm, _conv_init


def _conv3d(x: jax.Array, w: jax.Array, stride: int = 1, compute_dtype=None) -> jax.Array:
    """NDHWC conv; w (kd, kh, kw, Cin, Cout).

    bf16 mode keeps in/out dtypes uniform (TPU convs accumulate bf16 in f32
    natively; mixing preferred_element_type with bf16 breaks the conv VJP).
    """
    precision = None
    kwargs = {}
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    if compute_dtype in (None, jnp.float32, "float32"):
        precision = jax.lax.Precision.HIGHEST
        kwargs["preferred_element_type"] = jnp.float32
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,) * 3,
        padding="SAME" if stride == 1 else "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=precision, **kwargs,
    )
    return out.astype(jnp.float32)


def _conv3d_transpose(x: jax.Array, w: jax.Array, compute_dtype=None) -> jax.Array:
    """k2s2 transposed conv (ME.MinkowskiConvolutionTranspose equivalent)."""
    precision = None
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    if compute_dtype in (None, jnp.float32, "float32"):
        precision = jax.lax.Precision.HIGHEST
    out = jax.lax.conv_transpose(
        x, w, strides=(2, 2, 2), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=precision,
    )
    return out.astype(jnp.float32)


class DenseBN(nn.Module):
    """Masked batch norm over occupied cells of a dense volume."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array, occ: jax.Array, train: bool) -> jax.Array:
        shape = x.shape
        flat = x.reshape(-1, shape[-1])
        y = MaskedBatchNorm(self.features)(flat, occ.reshape(-1), train)
        return y.reshape(shape)


class DenseSubmConv(nn.Module):
    """3^3 dense conv masked to occupied sites (== submanifold conv)."""

    in_features: int
    out_features: int
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, occ: jax.Array) -> jax.Array:
        w = self.param("kernel", _conv_init(27, self.in_features),
                       (3, 3, 3, self.in_features, self.out_features))
        y = _conv3d(x, w, 1, self.compute_dtype)
        return jnp.where(occ[..., None], y, 0).astype(x.dtype)


class DenseResidualBlock(nn.Module):
    """Pre-activation residual block (reference common.py:22-48), dense."""

    in_features: int
    out_features: int
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, occ: jax.Array, train: bool) -> jax.Array:
        identity = x
        if self.in_features != self.out_features:
            w = self.param("downsample", _conv_init(1, self.in_features),
                           (self.in_features, self.out_features))
            identity = (x @ w).astype(x.dtype)
        y = DenseBN(self.in_features)(x, occ, train)
        y = nn.relu(y)
        y = DenseSubmConv(self.in_features, self.out_features, self.compute_dtype)(y, occ)
        y = DenseBN(self.out_features)(y, occ, train)
        y = nn.relu(y)
        y = DenseSubmConv(self.out_features, self.out_features, self.compute_dtype)(y, occ)
        return y + identity


class DenseTinyUnet(nn.Module):
    """2-level UBlock + BN + ReLU on dense proposal volumes (reference
    tiny_unet.py:7-19 / common.py:51-95 with planes [c, 2c], reps 2)."""

    channel: int
    compute_dtype: str | None = None
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, occ: jax.Array, train: bool) -> jax.Array:
        # remat: recompute block interiors in the backward pass. The dense
        # (P, S, S, S, C) volumes XLA saves for the VJP pad badly (a spatial
        # dim can land on the 128-lane axis: a f32[256,20,20,20,32] relu temp
        # once padded 7.7x to 1.88G) and OOMed the HAIS/SoftGroup train step
        # even with the backbone rematted. Numerically identical (same ops,
        # run twice). Config: model.network.remat, same flag as the backbone.
        Block = (nn.remat(DenseResidualBlock, static_argnums=(3,)) if self.remat
                 else DenseResidualBlock)
        c = self.channel
        s = x.shape[1]
        if s % 2:  # pad to even extent for the k2s2 down/up pair
            pad = [(0, 0), (0, 1), (0, 1), (0, 1), (0, 0)]
            x = jnp.pad(x, pad)
            occ = jnp.pad(occ, [(p[0], p[1]) for p in pad[:-1]])
        occ2 = jnp.max(occ.reshape(occ.shape[0], occ.shape[1] // 2, 2,
                                   occ.shape[2] // 2, 2, occ.shape[3] // 2, 2),
                       axis=(2, 4, 6))

        for i in range(2):
            x = Block(c, c, self.compute_dtype, name=f"block{i}")(x, occ, train)
        identity = x

        y = DenseBN(c, name="conv_bn")(x, occ, train)
        y = nn.relu(y)
        wd = self.param("conv_kernel", _conv_init(8, c), (2, 2, 2, c, 2 * c))
        y = _conv3d(y, wd, 2, self.compute_dtype)
        y = jnp.where(occ2[..., None], y, 0)

        for i in range(2):
            y = Block(2 * c, 2 * c, self.compute_dtype, name=f"u_block{i}")(y, occ2, train)

        y = DenseBN(2 * c, name="deconv_bn")(y, occ2, train)
        y = nn.relu(y)
        wu = self.param("deconv_kernel", _conv_init(8, 2 * c), (2, 2, 2, 2 * c, c))
        y = _conv3d_transpose(y, wu, self.compute_dtype)
        y = jnp.where(occ[..., None], y, 0)

        x = jnp.concatenate([identity, y], axis=-1)
        for i in range(2):
            cin = 2 * c if i == 0 else c
            x = Block(cin, c, self.compute_dtype, name=f"block_tail{i}")(x, occ, train)

        x = DenseBN(c, name="out_bn")(x, occ, train)
        x = nn.relu(x)
        if s % 2:
            x = x[:, :s, :s, :s, :]
        return x

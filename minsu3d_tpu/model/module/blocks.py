"""NN building blocks (flax.linen) over sparse grid plans.

Structural parity with reference minsu3d/model/module/{common.py,backbone.py,
tiny_unet.py}: pre-activation residual blocks, the recursive 7-level UBlock
(k2s2 down / transposed up / skip concat), TinyUnet, and the Backbone with
semantic + offset point heads. Convolutions and batch norms are masked,
fixed-capacity equivalents of the MinkowskiEngine ops.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from minsu3d_tpu.ops import dense_grid, sparse_conv
from minsu3d_tpu.ops.sparse import GridPlan, Level


def _conv_init(kernel_volume: int, fan_in: int):
    """Kaiming-uniform over kernel_volume*fan_in (ME conv init convention)."""
    bound = (6.0 / (kernel_volume * fan_in)) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid rows only (ME.MinkowskiBatchNorm / nn.BatchNorm1d
    semantics: torch defaults momentum=0.1, eps=1e-5, biased batch variance).

    ``cm=True`` takes channel-major (C, V) activations (see sparse_conv.py's
    channel-major section); parameter/stat shapes are identical either way."""

    features: int
    momentum: float = 0.1
    eps: float = 1e-5
    cm: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array, train: bool) -> jax.Array:
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(self.features))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(self.features))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        # rows = the single non-channel axis (V,) — or ALL leading axes for
        # dense-grid (B, X, Y, Z, C) activations (ops/dense_grid.py)
        v_axis = 1 if self.cm else tuple(range(x.ndim - 1))
        mask_b = mask[None, :] if self.cm else mask[..., None]
        # stats in f32 even when activations are stored bf16 (a bf16 sum over
        # ~100k rows loses the mean entirely); output returns to x.dtype
        x32 = x.astype(jnp.float32)
        if train:
            m = mask_b.astype(jnp.float32)
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(x32 * m, axis=v_axis) / cnt
            var = jnp.sum((x32 - _bc(mean, self.cm)) ** 2 * m, axis=v_axis) / cnt
            if not self.is_initializing():
                # torch running stats use the unbiased batch variance
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = ((x32 - _bc(mean, self.cm)) * _bc(jax.lax.rsqrt(var + self.eps), self.cm)
             * _bc(scale, self.cm) + _bc(bias, self.cm))
        return jnp.where(mask_b, y, 0).astype(x.dtype)


def _bc(vec: jax.Array, cm: bool) -> jax.Array:
    """Broadcast a (C,) vector against (V, C) rows or (C, V) columns."""
    return vec[:, None] if cm else vec


def _conv_ckpt(fn, ckpt: bool, *static_argnums):
    """Wrap a sparse-conv function in jax.checkpoint (conv-granularity remat).

    Unlike nn.remat(ResidualBlock) — which recomputes the whole block
    interior (both convs' gathers AND GEMMs, batch norms, relus) in the
    backward — checkpointing the conv alone recomputes just enough of its
    interior to rebuild the (rows, 27, Cin) gathered neighbor table the
    backward needs; the forward GEMM is dead code in that recomputation and
    XLA prunes it. Saved residuals drop from 27x(V, Cin) per conv to the
    (V, Cin) input, so the train step fits HBM without paying the full
    block recompute (model.network.remat="conv")."""
    return jax.checkpoint(fn, static_argnums=static_argnums) if ckpt else fn


class SubmConv(nn.Module):
    """3^3 stride-1 sparse conv (ME.MinkowskiConvolution k3 s1)."""

    in_features: int
    out_features: int
    compute_dtype: str | None = None
    cm: bool = False
    grid: bool = False
    ckpt: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, level) -> jax.Array:
        w = self.param("kernel", _conv_init(27, self.in_features),
                       (27, self.in_features, self.out_features))
        if self.grid:  # dense-grid mode: ``level`` is the occupancy mask
            return dense_grid.subm_conv_grid(x, level, w, self.compute_dtype)
        if self.cm:
            return _conv_ckpt(sparse_conv.subm_conv_cm, self.ckpt, 3)(
                x, level, w, self.compute_dtype)
        if level.blk_zb is not None:  # blocked z-run window kernel map
            return _conv_ckpt(sparse_conv.subm_conv_blocked_z, self.ckpt, 3)(
                x, level, w, self.compute_dtype)
        if level.z_base is not None:  # z-run slice kernel map (bit-identical)
            return _conv_ckpt(sparse_conv.subm_conv_zslice, self.ckpt, 3)(
                x, level, w, self.compute_dtype)
        if level.blk_li is not None:  # blocked halo-window kernel map
            if self.ckpt:
                # hand-written gather-form VJP: saves only (x, w) like
                # jax.checkpoint but the backward is gathers all the way
                # down (no scan-transpose scatters) — see sparse_conv.py
                return sparse_conv.subm_conv_blocked_vjp(
                    x, level, w, self.compute_dtype)
            return sparse_conv.subm_conv_blocked(x, level, w, self.compute_dtype)
        if level.tap_src is not None:  # compact per-tap kernel map attached
            return _conv_ckpt(sparse_conv.subm_conv_tap, self.ckpt, 3)(
                x, level, w, self.compute_dtype)
        return _conv_ckpt(sparse_conv.subm_conv, self.ckpt, 3, 4)(
            x, level, w, self.compute_dtype, 27)


class Conv1x1(nn.Module):
    """1^3 sparse conv = per-voxel linear map (no bias, as ME convs)."""

    in_features: int
    out_features: int
    cm: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("kernel", _conv_init(1, self.in_features),
                       (self.in_features, self.out_features))
        if self.cm:
            return jax.lax.dot_general(
                w, x, dimension_numbers=(((0,), (0,)), ((), ()))).astype(x.dtype)
        return (x @ w).astype(x.dtype)


class DownConv(nn.Module):
    """k2s2 strided conv to the next level (ME.MinkowskiConvolution k2 s2)."""

    in_features: int
    out_features: int
    compute_dtype: str | None = None
    cm: bool = False
    grid: bool = False
    ckpt: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, child, parent_cap: int = 0) -> jax.Array:
        w = self.param("kernel", _conv_init(8, self.in_features),
                       (8, self.in_features, self.out_features))
        if self.grid:  # dense-grid mode: ``child`` is the PARENT's mask
            return dense_grid.down_conv_grid(x, child, w, self.compute_dtype)
        if self.cm:
            return _conv_ckpt(sparse_conv.down_conv_cm, self.ckpt, 2, 4)(
                x, child, parent_cap, w, self.compute_dtype)
        return _conv_ckpt(sparse_conv.down_conv, self.ckpt, 2, 4)(
            x, child, parent_cap, w, self.compute_dtype)


class UpConv(nn.Module):
    """k2s2 transposed conv back to the child level (ME ConvTranspose k2 s2)."""

    in_features: int
    out_features: int
    compute_dtype: str | None = None
    cm: bool = False
    grid: bool = False
    ckpt: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, child) -> jax.Array:
        w = self.param("kernel", _conv_init(8, self.in_features),
                       (8, self.in_features, self.out_features))
        if self.grid:  # dense-grid mode: ``child`` is the child's mask
            return dense_grid.up_conv_grid(x, child, w, self.compute_dtype)
        if self.cm:
            return _conv_ckpt(sparse_conv.up_conv_cm, self.ckpt, 3)(
                x, child, w, self.compute_dtype)
        return _conv_ckpt(sparse_conv.up_conv, self.ckpt, 3)(
            x, child, w, self.compute_dtype)


class ResidualBlock(nn.Module):
    """Pre-activation residual block (reference common.py:22-48)."""

    in_features: int
    out_features: int
    compute_dtype: str | None = None
    cm: bool = False
    grid: bool = False
    ckpt: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, level, train: bool) -> jax.Array:
        # grid mode: ``level`` is the occupancy mask (ops/dense_grid.py)
        valid = level if self.grid else level.valid
        identity = x
        if self.in_features != self.out_features:
            identity = Conv1x1(self.in_features, self.out_features, cm=self.cm,
                               name="downsample")(x)
        y = MaskedBatchNorm(self.in_features, cm=self.cm)(x, valid, train)
        y = nn.relu(y)
        y = SubmConv(self.in_features, self.out_features, self.compute_dtype,
                     self.cm, self.grid, self.ckpt)(y, level)
        y = MaskedBatchNorm(self.out_features, cm=self.cm)(y, valid, train)
        y = nn.relu(y)
        y = SubmConv(self.out_features, self.out_features, self.compute_dtype,
                     self.cm, self.grid, self.ckpt)(y, level)
        return y + identity


class UBlock(nn.Module):
    """Recursive U-Net block (reference common.py:51-95).

    ``planes[0]`` is this level's width; deeper entries recurse. The grid plan
    supplies per-level kernel maps; ``depth`` indexes into plan.levels.
    """

    planes: Sequence[int]
    block_reps: int = 2
    compute_dtype: str | None = None
    depth: int = 0
    cm: bool = False
    grid: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, plan, train: bool) -> jax.Array:
        # grid mode: ``plan`` is a dense_grid.DenseCtx; levels become masks
        if self.grid:
            level, valid = plan.masks[self.depth], plan.masks[self.depth]
        else:
            level, valid = plan.levels[self.depth], plan.levels[self.depth].valid
        # remat: recompute each residual block in the backward pass instead of
        # saving its interior — the (27V, Cin) gathered neighbor tables each
        # conv materializes dominate training HBM (a batch-4 ScanNet-scale
        # step needs 19.3G saved vs the chip's 15.7G; with remat it fits).
        # Numerically identical: the same ops run in the same order, they just
        # run twice. Config: model.network.remat — true/false, or an INT n to
        # remat only the n SHALLOWEST levels: level-l voxel caps halve per
        # level, so the shallow levels hold nearly all the saved-table HBM
        # while deep levels recompute for almost no memory return.
        # remat="conv": checkpoint each CONV instead of each block — the
        # backward recomputes only the gathered neighbor tables (the memory
        # hog), while BN/relu/GEMM outputs stay saved (see _conv_ckpt).
        r = self.remat
        ckpt = r == "conv"
        use_remat = (False if ckpt
                     else r if isinstance(r, bool) else self.depth < int(r))
        Block = (nn.remat(ResidualBlock, static_argnums=(3,)) if use_remat
                 else ResidualBlock)
        p0 = self.planes[0]
        for i in range(self.block_reps):
            x = Block(p0, p0, self.compute_dtype, self.cm, self.grid, ckpt,
                      name=f"block{i}")(x, level, train)
        identity = x

        if len(self.planes) > 1:
            p1 = self.planes[1]
            if self.grid:
                parent, p_valid, p_cap = plan.masks[self.depth + 1], plan.masks[self.depth + 1], 0
                down_nbr = parent  # DownConv's grid mode takes the parent mask
            else:
                parent, p_valid, p_cap = plan.levels[self.depth + 1], plan.levels[self.depth + 1].valid, plan.levels[self.depth + 1].cap
                down_nbr = level
            y = MaskedBatchNorm(p0, cm=self.cm, name="conv_bn")(x, valid, train)
            y = nn.relu(y)
            y = DownConv(p0, p1, self.compute_dtype, self.cm, self.grid, ckpt,
                         name="conv")(y, down_nbr, p_cap)
            y = UBlock(self.planes[1:], self.block_reps, self.compute_dtype,
                       self.depth + 1, self.cm, self.grid, self.remat,
                       name="u")(y, plan, train)
            y = MaskedBatchNorm(p1, cm=self.cm, name="deconv_bn")(y, p_valid, train)
            y = nn.relu(y)
            y = UpConv(p1, p0, self.compute_dtype, self.cm, self.grid, ckpt,
                       name="deconv")(y, level)
            # skip connection: ME.cat (common.py:93) — channel axis is 0 in cm
            x = jnp.concatenate([identity, y], axis=0 if self.cm else -1)
            for i in range(self.block_reps):
                cin = p0 * 2 if i == 0 else p0
                x = Block(cin, p0, self.compute_dtype, self.cm, self.grid, ckpt,
                          name=f"block_tail{i}")(x, level, train)
        return x


class TinyUnet(nn.Module):
    """2-level refinement UNet (reference tiny_unet.py:7-19)."""

    channel: int
    compute_dtype: str | None = None
    cm: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, plan: GridPlan, train: bool) -> jax.Array:
        c = self.channel
        x = UBlock((c, 2 * c), 2, self.compute_dtype, 0, self.cm, name="unet")(x, plan, train)
        x = MaskedBatchNorm(c, cm=self.cm)(x, plan.levels[0].valid, train)
        return nn.relu(x)


class PointMLP(nn.Module):
    """Linear -> BN1d -> ReLU -> Linear point head (backbone.py:20-33)."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array, train: bool) -> jax.Array:
        x = nn.Dense(self.hidden)(x)
        x = MaskedBatchNorm(self.hidden)(x, mask, train)
        x = nn.relu(x)
        return nn.Dense(self.out)(x)


class Backbone(nn.Module):
    """Shared backbone (reference backbone.py:8-43): k3 input conv, 7-level
    UBlock, BN+ReLU, voxel->point devoxelization, semantic + offset heads."""

    input_channel: int
    output_channel: int
    block_channels: Sequence[int]
    block_reps: int
    sem_classes: int
    compute_dtype: str | None = None
    cm: bool = False
    grid: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, voxel_feats: jax.Array, plan: GridPlan, v2p: jax.Array,
                 point_mask: jax.Array, train: bool, dense_ctx=None) -> dict:
        m = self.output_channel
        # store activations in the compute dtype: halves the HBM traffic of
        # every conv gather/scatter (stats and heads still run in f32)
        if self.compute_dtype is not None:
            voxel_feats = voxel_feats.astype(self.compute_dtype)
        if self.grid:
            # dense-grid mode (ops/dense_grid.py): one scatter into the
            # (B, X, Y, Z, C) scene grid, the whole UNet as masked dense
            # convs, one gather back at the level-0 voxel cells
            n_batch = dense_ctx.masks[0].shape[0]
            x = dense_grid.scatter_to_grid(voxel_feats, dense_ctx, n_batch)
            x = SubmConv(self.input_channel, m, self.compute_dtype, grid=True,
                         name="input_conv")(x, dense_ctx.masks[0])
            x = UBlock(tuple(m * c for c in self.block_channels), self.block_reps,
                       self.compute_dtype, 0, grid=True, remat=self.remat,
                       name="unet")(x, dense_ctx, train)
            x = MaskedBatchNorm(m, name="out_bn")(x, dense_ctx.masks[0], train)
            x = nn.relu(x)
            x = dense_grid.gather_from_grid(x, dense_ctx)  # (V, m)
        else:
            if self.cm:
                # one (V, Cin) -> (Cin, V) relayout at entry; the whole UNet
                # then runs channel-major (dense tiles, see sparse_conv.py)
                voxel_feats = voxel_feats.T
            x = SubmConv(self.input_channel, m, self.compute_dtype, self.cm,
                         ckpt=self.remat == "conv",
                         name="input_conv")(voxel_feats, plan.levels[0])
            x = UBlock(tuple(m * c for c in self.block_channels), self.block_reps,
                       self.compute_dtype, 0, self.cm, remat=self.remat,
                       name="unet")(x, plan, train)
            x = MaskedBatchNorm(m, cm=self.cm, name="out_bn")(x, plan.levels[0].valid, train)
            x = nn.relu(x)
            if self.cm:
                x = x.T  # back to (V, m) for the point heads

        # devoxelize: voxel -> point gather (backbone.py:40); v2p == cap reads 0
        pf = sparse_conv.ext_zero(x)[v2p]
        pf = jnp.where(point_mask[:, None], pf, 0)
        out = {"point_features": pf}
        out["semantic_scores"] = PointMLP(m, self.sem_classes, name="semantic_branch")(
            pf, point_mask, train)
        out["point_offsets"] = PointMLP(m, 3, name="offset_branch")(pf, point_mask, train)
        return out

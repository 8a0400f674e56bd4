"""Shared NN building blocks (flax linen).

Norm semantics follow the reference host frameworks: BatchNorm with
eps=1e-3, momentum=0.01 on sparse voxel features and BEV maps
(det3d scn.py norm_cfg / pcdet spconv_backbone). Sparse rows are masked —
statistics are computed over VALID voxels only, which the torch original
gets implicitly by operating on packed (dynamic-length) tensors. Under
pjit, full-array means are global, so this is SyncBN across the data mesh
for free (reference needed explicit SyncBatchNorm wrappers, SURVEY §2.6).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from df3d.ops.sparse import ConvPlan, SparseTensor, apply_sparse_conv


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the valid rows of padded (..., C) features; stats are
    pooled over all leading dims (so batch + rows), masked."""

    momentum: float = 0.99  # torch momentum 0.01 == flax-style 0.99
    eps: float = 1e-3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array, train: bool) -> jax.Array:
        c = x.shape[-1]
        red = tuple(range(x.ndim - 1))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(c))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(c))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if train:
            xf = x.astype(jnp.float32)
            m = mask.astype(jnp.float32)[..., None]
            cnt = jnp.maximum(m.sum(), 1.0)
            mean = (xf * m).sum(red) / cnt
            var = (jnp.square(xf - mean) * m).sum(red) / cnt
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.eps) * scale
        y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype) + bias.astype(x.dtype)
        return jnp.where(mask[..., None], y, 0.0)


def _kaiming_taps(key, shape, dtype=jnp.float32):
    """He-normal over (K, Cin, Cout) treating K*Cin as fan-in."""
    k, cin, _ = shape
    std = (2.0 / (k * cin)) ** 0.5
    return std * jax.random.normal(key, shape, dtype)


class SubMConv3d(nn.Module):
    """Submanifold conv (weights only; plan supplied by caller so it can be
    shared across the layers of a stage, like spconv's indice_key).

    Polymorphic over the backbone-tail representation: a SparseTensor +
    ConvPlan runs the gather-GEMM body; a dense3d.DenseTensor +
    DenseConvSpec runs a plain XLA conv masked to the active set. The
    parameter tree ((K, Cin, Cout) kernel) is IDENTICAL either way, so
    checkpoints and torch importers never see the representation."""

    out_channels: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, st, plan):
        from df3d.ops.dense3d import DenseTensor, dense_conv

        k = plan.num_taps
        w = self.param(
            "kernel", _kaiming_taps, (k, st.features.shape[-1], self.out_channels)
        )
        if isinstance(st, DenseTensor):
            return dense_conv(
                st, w, plan.ksize, stride=1,
                padding=tuple(kk // 2 for kk in plan.ksize), subm=True,
            )
        return st.with_features(apply_sparse_conv(st.features, plan, w))


class SparseConv3d(nn.Module):
    """Strided conv; produces a new coord set (from plan.out_coords), or on
    the dense tail a new DenseTensor whose mask is the EXACT spconv
    dilation of the input's (uncapped — see ops/dense3d.py)."""

    out_channels: int

    @nn.compact
    def __call__(self, st, plan):
        from df3d.ops.dense3d import DenseTensor, dense_conv

        k = plan.num_taps
        w = self.param(
            "kernel", _kaiming_taps, (k, st.features.shape[-1], self.out_channels)
        )
        if isinstance(st, DenseTensor):
            return dense_conv(
                st, w, plan.ksize, stride=plan.stride,
                padding=plan.padding, subm=False,
            )
        feats = apply_sparse_conv(st.features, plan, w)
        return SparseTensor(
            feats, plan.out_coords, plan.out_spatial_shape,
            rows_sorted=plan.out_rows_sorted,
            packed_table=plan.out_packed,
            packed_table_grid=(
                tuple(plan.out_spatial_shape)
                if plan.out_packed is not None else None),
        )


class SparseConvBNReLU(nn.Module):
    out_channels: int
    subm: bool = True

    @nn.compact
    def __call__(self, st: SparseTensor, plan: ConvPlan, train: bool) -> SparseTensor:
        conv = SubMConv3d if self.subm else SparseConv3d
        st = conv(self.out_channels)(st, plan)
        feats = MaskedBatchNorm()(st.features, st.valid, train)
        return st.with_features(nn.relu(feats))


class SparseBasicBlock(nn.Module):
    """ResNet-style block of two subm convs (det3d scn.py SparseBasicBlock /
    pcdet spconv_backbone post-act block). Channels must match input."""

    channels: int

    @nn.compact
    def __call__(self, st: SparseTensor, plan: ConvPlan, train: bool) -> SparseTensor:
        identity = st.features
        out = SubMConv3d(self.channels)(st, plan)
        h = nn.relu(MaskedBatchNorm()(out.features, st.valid, train))
        out = SubMConv3d(self.channels)(st.with_features(h), plan)
        h = MaskedBatchNorm()(out.features, st.valid, train)
        return st.with_features(nn.relu(h + identity))


_COMPUTE_DTYPE_2D = None


def set_compute_dtype_2d(dtype):
    """Computation dtype for the dense BEV 2D blocks (neck/head convs +
    BN), mirroring ops.sparse.set_compute_dtype. Params stay f32; flax
    casts inputs/params to `dtype` per-op. bf16 keeps the big BEV conv
    stack on the MXU at half the HBM traffic — intended for inference
    (bench: the neck+head+predict tail)."""
    global _COMPUTE_DTYPE_2D
    _COMPUTE_DTYPE_2D = dtype


class ConvBNReLU2d(nn.Module):
    """BEV 2D conv block, channel-last (B, H, W, C)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        x = nn.Conv(
            self.out_channels, (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride), padding="SAME",
            use_bias=self.use_bias, kernel_init=nn.initializers.he_normal(),
            dtype=_COMPUTE_DTYPE_2D,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=_COMPUTE_DTYPE_2D,
        )(x)
        return nn.relu(x)


class DeconvBNReLU2d(nn.Module):
    """Transposed-conv upsample block (RPN deblocks)."""

    out_channels: int
    stride: int = 2

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        x = nn.ConvTranspose(
            self.out_channels, (self.stride, self.stride),
            strides=(self.stride, self.stride), use_bias=False,
            kernel_init=nn.initializers.he_normal(),
            dtype=_COMPUTE_DTYPE_2D,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=_COMPUTE_DTYPE_2D,
        )(x)
        return nn.relu(x)


class MLP(nn.Module):
    """Simple ReLU MLP (fusion heads, FFNs)."""

    hidden: Sequence[int]
    activate_final: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, h in enumerate(self.hidden):
            x = nn.Dense(h)(x)
            if i < len(self.hidden) - 1 or self.activate_final:
                x = nn.relu(x)
        return x

"""Deformable 2D convolution (DCN v1) for BEV maps, pure JAX, TPU lane-first.

Equivalent of the reference's DCN CUDA op (CenterPoint/det3d/ops/dcn,
deform_conv_cuda.cpp) as consumed by FeatureAdaption / DCNSepHead
(CenterPoint/det3d/models/bbox_heads/center_head.py:25-170): per output
position, each of the K*K kernel taps samples the input bilinearly at
(base grid + tap offset + learned per-position delta), deformable groups
share deltas across their channel slice, and the tap matmuls accumulate.

Reuses the MSDA quad-table layout (ops/msda.py): the 4 bilinear corners of
one sample come from ONE 4*d-float row gather, outputs produced transposed
(channels, B*H*W) so tap matmuls are full-lane MXU contractions. Sampling
outside the image contributes zeros (torch zero padding_mode).

Offset layout: (B, H, W, G*K2*2), minor order (dy, dx) per tap, taps
row-major over the kernel window, groups outermost — matching mmcv/det3d
conv_offset conv output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from df3d.ops.msda import _DN_T, _quad_tables


def deform_conv2d(x: jax.Array, offsets: jax.Array, weights: jax.Array,
                  groups: int = 4, kernel_size: int = 3) -> jax.Array:
    """x (B, H, W, C); offsets (B, H, W, G*K2*2); weights (K2, C, Cout)
    -> (B, H, W, Cout) f32. SAME padding, stride 1, dilation 1 (the only
    configuration the reference's FeatureAdaption uses)."""
    b, h, w, c = x.shape
    k2 = kernel_size * kernel_size
    g = groups
    d = c // g
    assert offsets.shape[-1] == g * k2 * 2
    cout = weights.shape[-1]
    bq = b * h * w

    # per-group quad tables with a 1-px zero border (M, 4d)
    tables = _quad_tables(x.reshape(b, h * w, c), h, w, g, d)
    sample = jnp.arange(bq, dtype=jnp.int32) // (h * w)
    base_row = sample * ((h + 2) * (w + 2))

    # static base grid, lane-first (BQ,)
    yy = jnp.tile(
        jnp.repeat(jnp.arange(h, dtype=jnp.float32), w), b)
    xx = jnp.tile(jnp.tile(jnp.arange(w, dtype=jnp.float32), h), b)

    # offsets transposed once: (G*K2*2, BQ)
    off_t = offsets.reshape(bq, g * k2 * 2).T

    r = kernel_size // 2
    acc = jnp.zeros((cout, bq), jnp.float32)
    for t in range(k2):
        ty, tx = t // kernel_size - r, t % kernel_size - r
        parts = []
        for gi in range(g):
            dy = off_t[(gi * k2 + t) * 2]
            dx = off_t[(gi * k2 + t) * 2 + 1]
            py = yy + ty + dy
            px = xx + tx + dx
            y0 = jnp.floor(py)
            x0 = jnp.floor(px)
            fy = (py - y0).astype(jnp.float32)
            fx = (px - x0).astype(jnp.float32)
            y0i = jnp.clip(y0, -1, h).astype(jnp.int32)
            x0i = jnp.clip(x0, -1, w).astype(jnp.int32)
            idx = base_row + (y0i + 1) * (w + 2) + (x0i + 1)
            q = lax.gather(
                tables[gi], idx[:, None], _DN_T, slice_sizes=(1, 4 * d),
                mode="clip",
            )  # (4d, BQ)
            okx0 = (x0 >= 0) & (x0 < w)
            okx1 = (x0 + 1 >= 0) & (x0 + 1 < w)
            oky0 = (y0 >= 0) & (y0 < h)
            oky1 = (y0 + 1 >= 0) & (y0 + 1 < h)
            w00 = (1 - fx) * (1 - fy) * (okx0 & oky0)
            w01 = fx * (1 - fy) * (okx1 & oky0)
            w10 = (1 - fx) * fy * (okx0 & oky1)
            w11 = fx * fy * (okx1 & oky1)
            parts.append(
                q[0 * d:1 * d].astype(jnp.float32) * w00
                + q[1 * d:2 * d].astype(jnp.float32) * w01
                + q[2 * d:3 * d].astype(jnp.float32) * w10
                + q[3 * d:4 * d].astype(jnp.float32) * w11
            )
        sampled = jnp.concatenate(parts, axis=0)  # (C, BQ)
        acc = acc + jnp.einsum(
            "cq,co->oq", sampled, weights[t].astype(jnp.float32))
    return acc.T.reshape(b, h, w, cout)

"""Multi-scale deformable attention sampling core, pure JAX.

Replaces the reference MSDeformAttn CUDA op
(VoxelRCNN/pcdet/models/model_utils/ops/src/cuda/ms_deform_im2col_cuda.cuh
forward/backward kernels; python fallback ms_deform_attn_func.py:41-61
`ms_deform_attn_core_pytorch`). Semantics match the fallback exactly:
grid_sample(mode=bilinear, padding_mode=zeros, align_corners=False) over
each level, weighted sum over (levels x points).

Static shapes: spatial_shapes is a python tuple of (H, W), so the level
loop unrolls at trace time. Gradient flows through both the sampling
locations (bilinear weights) and the values — XLA autodiff handles the VJP
the CUDA backward kernels implement by hand.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _bilinear_gather(value_l, px, py, h, w):
    """value_l (B, H*W, nH, D); px/py (B, Q, nH, P) pixel coords (already
    -0.5 shifted). Returns (B, Q, nH, P, D) with zero padding OOB."""
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    dx = px - x0
    dy = py - y0

    out = None
    for cx, cy, cw in (
        (x0, y0, (1 - dx) * (1 - dy)),
        (x0 + 1, y0, dx * (1 - dy)),
        (x0, y0 + 1, (1 - dx) * dy),
        (x0 + 1, y0 + 1, dx * dy),
    ):
        inb = (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)
        xi = jnp.clip(cx, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(cy, 0, h - 1).astype(jnp.int32)
        flat = yi * w + xi  # (B, Q, nH, P)
        # gather per (batch, head): (HW, D)[Q, P] -> (Q, P, D)
        g = jax.vmap(  # over batch
            jax.vmap(  # over heads
                lambda v, i: v[i], in_axes=(1, 1), out_axes=1
            )
        )(value_l, flat)  # (B, Q?, ...) -> see axes below
        contrib = g * (cw * inb)[..., None]
        out = contrib if out is None else out + contrib
    return out


def ms_deform_attn(
    value: jax.Array,                 # (B, Len_v, nH, D)
    spatial_shapes: Sequence[tuple],  # static ((H0, W0), ...)
    sampling_locations: jax.Array,    # (B, Q, nH, L, P, 2) in [0, 1]
    attention_weights: jax.Array,     # (B, Q, nH, L, P) softmaxed over L*P
) -> jax.Array:
    """Returns (B, Q, nH * D)."""
    b, _, nh, d = value.shape
    q = sampling_locations.shape[1]
    start = 0
    out = jnp.zeros((b, q, nh, d), jnp.float32)
    for lid, (h, w) in enumerate(spatial_shapes):
        value_l = value[:, start:start + h * w]
        loc = sampling_locations[:, :, :, lid]  # (B, Q, nH, P, 2)
        # align_corners=False pixel coords
        px = loc[..., 0] * w - 0.5
        py = loc[..., 1] * h - 0.5
        sampled = _bilinear_gather(value_l, px, py, h, w)  # (B, Q, nH, P, D)
        out = out + jnp.einsum(
            "bqhp,bqhpd->bqhd", attention_weights[:, :, :, lid], sampled,
            preferred_element_type=jnp.float32,
        )
        start += h * w
    return out.reshape(b, q, nh * d).astype(value.dtype)


def level_start_index(spatial_shapes) -> tuple:
    idx, acc = [], 0
    for h, w in spatial_shapes:
        idx.append(acc)
        acc += h * w
    return tuple(idx)

"""Multi-scale deformable attention sampling core, pure JAX, TPU lane-first.

Replaces the reference MSDeformAttn CUDA op
(VoxelRCNN/pcdet/models/model_utils/ops/src/cuda/ms_deform_im2col_cuda.cuh
forward/backward kernels; python fallback ms_deform_attn_func.py:41-61
`ms_deform_attn_core_pytorch`). Semantics match the fallback exactly:
grid_sample(mode=bilinear, padding_mode=zeros, align_corners=False) over
each level, weighted sum over (levels x points).

Layout design (v5e rules measured in tools/probes/r2_probe*.py — the same
rules that shaped ops/keytable.py):

  * every per-(head, level, point) stream is a contiguous (B*Q,) vector —
    (B, Q, nH, L, P)-shaped tensors put tiny dims in the vreg minor
    position and pad 16-32x (the round-2 fused model OOM'd on 2.75 GB
    padded temps from exactly that);
  * the four bilinear corners of one sample come from ONE row gather: a
    per-(head, level) "quad" table stores [v(y,x) v(y,x+1) v(y+1,x)
    v(y+1,x+1)] per pixel (4*D floats = 128 B rows, a fast gather shape;
    per-head tables stay under the ~12 MB fast-gather budget);
  * gather outputs are produced TRANSPOSED ((4D, B*Q)) so corner slices
    are contiguous full-lane vectors;
  * images get a 1-pixel zero border so corner reads at the clip edge are
    memory-safe; out-of-image corners are zeroed via (B*Q,) weight masks
    (padding_mode=zeros semantics).

Static shapes: spatial_shapes is a python tuple of (H, W); the
(head, level, point) loops unroll at trace time. Gradient flows through
both the sampling locations (bilinear weights) and the values — XLA
autodiff handles the VJP the CUDA backward kernels implement by hand.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

_DN_T = lax.GatherDimensionNumbers(
    offset_dims=(0,), collapsed_slice_dims=(0,), start_index_map=(0,)
)


def _quad_tables(value, h, w, nh, d):
    """value (B, H*W, C) one level -> per-head quad tables
    [(M, 4*d)] with a 1-pixel zero border; M = B*(h+2)*(w+2)."""
    b = value.shape[0]
    img = value.reshape(b, h, w, nh * d)
    img = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w2 = w + 2
    m = b * (h + 2) * w2
    flat = img.reshape(m, nh * d)
    tables = []
    for hd in range(nh):
        fh = flat[:, hd * d:(hd + 1) * d]
        fh = jnp.concatenate(
            [fh, jnp.zeros((w2 + 1, d), fh.dtype)], axis=0)
        tables.append(jnp.concatenate(
            [fh[0:m], fh[1:m + 1], fh[w2:m + w2], fh[w2 + 1:m + w2 + 1]],
            axis=-1,
        ))  # (M, 4d)
    return tables


def ms_deform_attn_t(
    value: jax.Array,                 # (B, Len_v, C) channel-flat
    spatial_shapes: Sequence[tuple],  # static ((H0, W0), ...)
    loc_t: jax.Array,                 # (nH*L*P*2, B*Q) in [0, 1]
    attn_t: jax.Array,                # (nH*L*P, B*Q) softmaxed over L*P
    n_heads: int,
) -> jax.Array:
    """Lane-first core. loc_t rows are ordered
    [((h*L + l)*P + p)*2 + xy]; attn_t rows [(h*L + l)*P + p].
    Returns (B, Q, C)."""
    b, _, c = value.shape
    nh = n_heads
    d = c // nh
    nl = len(spatial_shapes)
    npnt = loc_t.shape[0] // (nh * nl * 2)
    bq = loc_t.shape[1]
    q = bq // b
    sample = jnp.arange(bq, dtype=jnp.int32) // q  # (BQ,) sample id

    # per-level, per-head quad tables + per-level index bases
    start = 0
    levels = []
    for (h, w) in spatial_shapes:
        vl = value[:, start:start + h * w]
        levels.append((
            _quad_tables(vl, h, w, nh, d),
            sample * ((h + 2) * (w + 2)),  # per-sample row base
            h, w,
        ))
        start += h * w

    head_outs = []
    for hd in range(nh):
        acc = jnp.zeros((d, bq), jnp.float32)
        for lid, (tables, base, h, w) in enumerate(levels):
            tab = tables[hd]
            nrow = tab.shape[0]
            for p in range(npnt):
                r = ((hd * nl + lid) * npnt + p) * 2
                px = loc_t[r] * w - 0.5
                py = loc_t[r + 1] * h - 0.5
                x0 = jnp.floor(px)
                y0 = jnp.floor(py)
                dx = (px - x0).astype(jnp.float32)
                dy = (py - y0).astype(jnp.float32)
                x0i = jnp.clip(x0, -1, w).astype(jnp.int32)
                y0i = jnp.clip(y0, -1, h).astype(jnp.int32)
                # +1 border shift; row pitch w+2
                idx = base + (y0i + 1) * (w + 2) + (x0i + 1)
                g = lax.gather(
                    tab, idx[:, None], _DN_T, slice_sizes=(1, 4 * d),
                    mode="clip",
                )  # (4d, BQ) transposed output
                g = lax.optimization_barrier(g)
                okx0 = (x0 >= 0) & (x0 < w)
                okx1 = (x0 + 1 >= 0) & (x0 + 1 < w)
                oky0 = (y0 >= 0) & (y0 < h)
                oky1 = (y0 + 1 >= 0) & (y0 + 1 < h)
                a = attn_t[(hd * nl + lid) * npnt + p]
                w00 = a * (1 - dx) * (1 - dy) * (okx0 & oky0)
                w01 = a * dx * (1 - dy) * (okx1 & oky0)
                w10 = a * (1 - dx) * dy * (okx0 & oky1)
                w11 = a * dx * dy * (okx1 & oky1)
                acc = (acc
                       + g[0 * d:1 * d].astype(jnp.float32) * w00
                       + g[1 * d:2 * d].astype(jnp.float32) * w01
                       + g[2 * d:3 * d].astype(jnp.float32) * w10
                       + g[3 * d:4 * d].astype(jnp.float32) * w11)
        head_outs.append(acc)
    out = jnp.concatenate(head_outs, axis=0)  # (C, BQ)
    return out.T.reshape(b, q, c).astype(value.dtype)


def ms_deform_attn(
    value: jax.Array,                 # (B, Len_v, nH, D)
    spatial_shapes: Sequence[tuple],  # static ((H0, W0), ...)
    sampling_locations: jax.Array,    # (B, Q, nH, L, P, 2) in [0, 1]
    attention_weights: jax.Array,     # (B, Q, nH, L, P) softmaxed over L*P
) -> jax.Array:
    """Reference-shaped entry (matches the CUDA op's calling convention);
    transposes into the lane-first core. Returns (B, Q, nH * D)."""
    b, lenv, nh, d = value.shape
    q = sampling_locations.shape[1]
    loc_t = sampling_locations.transpose(2, 3, 4, 5, 0, 1).reshape(-1, b * q)
    attn_t = attention_weights.transpose(2, 3, 4, 0, 1).reshape(-1, b * q)
    return ms_deform_attn_t(
        value.reshape(b, lenv, nh * d), spatial_shapes, loc_t, attn_t, nh
    )


def level_start_index(spatial_shapes) -> tuple:
    idx, acc = [], 0
    for h, w in spatial_shapes:
        idx.append(acc)
        acc += h * w
    return tuple(idx)

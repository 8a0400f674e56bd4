"""Pallas TPU kernel for multi-scale deformable attention sampling.

Replaces the reference CUDA `ms_deformable_im2col_gpu_kernel`
(VoxelRCNN/pcdet/models/model_utils/ops/src/cuda/ms_deform_im2col_cuda.cuh:238)
on TPU. One program per (batch*head, query-tile): the full per-head value
table (all levels, flattened rows) stays resident in VMEM; each query tile
computes its 4-corner bilinear gathers with jnp.take from VMEM and reduces
L x P weighted samples on the VPU.

Forward-only: gradients route through the XLA implementation via
jax.custom_vjp (df3d.ops.msda.ms_deform_attn is the autodiff reference,
mirroring how the reference pairs its CUDA kernel with
ms_deform_attn_core_pytorch).

Use `ms_deform_attn_pallas(..., interpret=True)` on CPU for testing.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from df3d.ops import msda as msda_xla


def _kernel(value_ref, locs_ref, attn_ref, out_ref, *, spatial_shapes, head_dim):
    """Blocks: value (1, LenV, D) VMEM; locs (1, TQ, L, P, 2);
    attn (1, TQ, L, P); out (1, TQ, D)."""
    value = value_ref[0]
    tq = locs_ref.shape[1]
    acc = jnp.zeros((tq, head_dim), jnp.float32)
    start = 0
    for lid, (h, w) in enumerate(spatial_shapes):
        loc = locs_ref[0, :, lid]     # (TQ, P, 2)
        wgt = attn_ref[0, :, lid]     # (TQ, P)
        px = loc[..., 0] * w - 0.5
        py = loc[..., 1] * h - 0.5
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        dx = px - x0
        dy = py - y0
        for cx, cy, cw in (
            (x0, y0, (1 - dx) * (1 - dy)),
            (x0 + 1, y0, dx * (1 - dy)),
            (x0, y0 + 1, (1 - dx) * dy),
            (x0 + 1, y0 + 1, dx * dy),
        ):
            inb = (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)
            xi = jnp.clip(cx, 0, w - 1).astype(jnp.int32)
            yi = jnp.clip(cy, 0, h - 1).astype(jnp.int32)
            flat = start + yi * w + xi               # (TQ, P)
            npnt = flat.shape[-1]
            # per-lane gather (Mosaic take_along_axis form)
            idx2d = jnp.broadcast_to(
                flat.reshape(-1)[:, None], (tq * npnt, head_dim)
            )
            rows = jnp.take_along_axis(value, idx2d, axis=0).reshape(
                tq, npnt, head_dim
            )
            acc += jnp.sum(rows * (wgt * cw * inb)[..., None], axis=1)
        start += h * w
    out_ref[0] = acc


def _forward_pallas(value, spatial_shapes, locs, attn, q_tile, interpret):
    """value (BH, LenV, D); locs (BH, Q, L, P, 2); attn (BH, Q, L, P)."""
    bh, len_v, d = value.shape
    q = locs.shape[1]
    nl, npnt = locs.shape[2], locs.shape[3]
    q_pad = ((q + q_tile - 1) // q_tile) * q_tile
    if q_pad != q:
        locs = jnp.pad(locs, ((0, 0), (0, q_pad - q), (0, 0), (0, 0), (0, 0)))
        attn = jnp.pad(attn, ((0, 0), (0, q_pad - q), (0, 0), (0, 0)))

    grid = (bh, q_pad // q_tile)
    out = pl.pallas_call(
        functools.partial(
            _kernel, spatial_shapes=tuple(spatial_shapes), head_dim=d
        ),
        out_shape=jax.ShapeDtypeStruct((bh, q_pad, d), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, len_v, d), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_tile, nl, npnt, 2), lambda b, t: (b, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_tile, nl, npnt), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_tile, d), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(value, locs, attn)
    return out[:, :q]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4, 5))
def ms_deform_attn_pallas(
    value: jax.Array,                 # (B, Len_v, nH, D)
    spatial_shapes: Sequence[tuple],
    sampling_locations: jax.Array,    # (B, Q, nH, L, P, 2)
    attention_weights: jax.Array,     # (B, Q, nH, L, P)
    q_tile: int = 256,
    interpret: bool = False,
) -> jax.Array:
    b, len_v, nh, d = value.shape
    q = sampling_locations.shape[1]
    v = value.transpose(0, 2, 1, 3).reshape(b * nh, len_v, d)
    locs = sampling_locations.transpose(0, 2, 1, 3, 4, 5).reshape(
        b * nh, q, *sampling_locations.shape[3:]
    )
    attn = attention_weights.transpose(0, 2, 1, 3, 4).reshape(
        b * nh, q, *attention_weights.shape[3:]
    )
    out = _forward_pallas(v, spatial_shapes, locs, attn, q_tile, interpret)
    out = out.reshape(b, nh, q, d).transpose(0, 2, 1, 3).reshape(b, q, nh * d)
    return out.astype(value.dtype)


def _fwd(value, spatial_shapes, locs, attn, q_tile, interpret):
    out = ms_deform_attn_pallas(
        value, spatial_shapes, locs, attn, q_tile, interpret
    )
    return out, (value, locs, attn)


def _bwd(spatial_shapes, q_tile, interpret, residuals, g):
    value, locs, attn = residuals
    _, vjp = jax.vjp(
        lambda v, l, a: msda_xla.ms_deform_attn(v, spatial_shapes, l, a),
        value, locs, attn,
    )
    return vjp(g)


ms_deform_attn_pallas.defvjp(_fwd, _bwd)


_PALLAS_OK: bool | None = None


def pallas_msda_available() -> bool:
    """One-time probe: can the Pallas kernel compile on this backend?"""
    global _PALLAS_OK
    if _PALLAS_OK is None:
        try:
            v = jnp.zeros((1, 12, 2, 8))
            l = jnp.full((1, 4, 2, 1, 2, 2), 0.5)
            a = jnp.full((1, 4, 2, 1, 2), 0.5)
            ms_deform_attn_pallas(v, ((3, 4),), l, a, q_tile=4).block_until_ready()
            _PALLAS_OK = True
        except Exception:
            _PALLAS_OK = False
    return _PALLAS_OK

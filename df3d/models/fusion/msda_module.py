"""MSDeformAttn module with the dual-query extension.

Equivalent of VoxelRCNN/pcdet/models/model_utils/ops/modules/
ms_deform_attn.py:33-190: value/output projections, per-head sampling-offset
and attention-weight predictors with the deformable-DETR directional grid
init, and the paper's dual-query combination (q_method in {gating, sum,
image}; q_rep_place subset of {offset, weight}) that mixes the LiDAR query
with the image query before predicting offsets/weights (:130-148).
The sampling core is df3d.ops.msda (Pallas/XLA) instead of the CUDA op.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from df3d.ops.msda import ms_deform_attn_t


def _offset_bias_init(n_heads: int, n_levels: int, n_points: int):
    """Directional grid init for sampling offsets (deformable DETR)."""

    def init(key, shape, dtype=jnp.float32):
        thetas = np.arange(n_heads) * (2.0 * np.pi / n_heads)
        grid = np.stack([np.cos(thetas), np.sin(thetas)], axis=-1)  # (H, 2)
        grid = grid / np.abs(grid).max(-1, keepdims=True)
        grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
        grid = grid * (np.arange(n_points) + 1)[None, None, :, None]
        return jnp.asarray(grid.reshape(-1), dtype)

    return init


class MSDeformAttnModule(nn.Module):
    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    q_method: Optional[str] = None      # None | 'gating' | 'sum' | 'image'
    q_rep_place: tuple = ("weight",)    # subset of {'offset', 'weight'}

    @nn.compact
    def __call__(
        self,
        query: jax.Array,              # (B, Q, C)
        reference_points: jax.Array,   # (B, Q, L, 2) normalized [0,1]
        value_flatten: jax.Array,      # (B, Len_v, C)
        spatial_shapes: Sequence[tuple],
        i_query: jax.Array | None = None,
        value_mask: jax.Array | None = None,  # (B, Len_v) True = valid
    ) -> jax.Array:
        b, q, _ = query.shape
        nh, nl, npnt = self.n_heads, self.n_levels, self.n_points

        value = nn.Dense(self.d_model, name="value_proj")(value_flatten)
        if value_mask is not None:
            value = value * value_mask[..., None]

        weight_query = query
        if self.q_method is not None:
            assert i_query is not None
            if self.q_method == "gating":
                g_q = nn.sigmoid(nn.Dense(1, name="q_gate")(query))
                g_i = nn.sigmoid(nn.Dense(1, name="i_gate")(i_query))
                # matches ms_deform_attn.py:139: gated sum minus originals
                new_query = query * g_q + i_query * g_i - query - i_query
            elif self.q_method == "sum":
                new_query = query + i_query
            elif self.q_method == "image":
                new_query = i_query
            else:
                raise ValueError(self.q_method)
            if "offset" in self.q_rep_place:
                query = new_query
            if "weight" in self.q_rep_place:
                weight_query = new_query

        offsets = nn.Dense(
            nh * nl * npnt * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=_offset_bias_init(nh, nl, npnt),
            name="sampling_offsets",
        )(query)                              # (B, Q, nH*L*P*2)
        attn = nn.Dense(
            nh * nl * npnt,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(weight_query)                       # (B, Q, nH*L*P)

        # lane-first from here (see ops/msda.py): ONE transpose into
        # (rows, B*Q) streams; all per-(head, level, point) math is then
        # contiguous full-lane vectors instead of minor-dim-2/4 tensors
        offs_t = offsets.reshape(b * q, -1).T       # (nH*L*P*2, BQ)
        attn_t = attn.reshape(b * q, -1).T          # (nH*L*P, BQ)
        lp = nl * npnt
        heads = []
        for hd in range(nh):                        # softmax over L*P rows
            sl = attn_t[hd * lp:(hd + 1) * lp]
            sl = sl - sl.max(axis=0, keepdims=True)
            e = jnp.exp(sl)
            heads.append(e / e.sum(axis=0, keepdims=True))
        attn_t = jnp.concatenate(heads, axis=0)

        ref_t = reference_points.reshape(b * q, nl * 2).T  # (L*2, BQ)
        # row r = ((h*L + l)*P + p)*2 + xy  ->  ref row l*2 + xy
        row_map = jnp.asarray(
            [l * 2 + xy
             for _ in range(nh) for l in range(nl)
             for _ in range(npnt) for xy in range(2)], jnp.int32)
        inv_norm = jnp.asarray(
            [1.0 / (spatial_shapes[l][1] if xy == 0 else spatial_shapes[l][0])
             for _ in range(nh) for l in range(nl)
             for _ in range(npnt) for xy in range(2)], jnp.float32)
        loc_t = jnp.take(ref_t, row_map, axis=0) + offs_t * inv_norm[:, None]

        out = ms_deform_attn_t(value, spatial_shapes, loc_t, attn_t, nh)
        return nn.Dense(self.d_model, name="output_proj")(out)

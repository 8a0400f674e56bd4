"""Positional encodings for the fusion transformer.

Equivalents of VoxelRCNN/pcdet/models/model_utils/position_encoding.py:
dense 2D sine over feature maps (:17), sparse sine over normalized image
coords (:56), depth sine with 60 m normalization (:91), learned depth-bin
embedding (:122). DETR convention: interleaved sin/cos, temperature 10000,
scale 2*pi.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

_TWO_PI = 2 * jnp.pi


def _sine_embed(x: jax.Array, num_feats: int, temperature: float = 10000.0) -> jax.Array:
    """x (...,) scaled positions -> (..., num_feats) interleaved sin/cos."""
    dim_t = temperature ** (
        2 * (jnp.arange(num_feats) // 2) / num_feats
    )  # (num_feats,)
    pos = x[..., None] / dim_t
    sin = jnp.sin(pos[..., 0::2])
    cos = jnp.cos(pos[..., 1::2])
    return jnp.stack([sin, cos], axis=-1).reshape(*x.shape, num_feats)


def position_embedding_sine_2d(h: int, w: int, num_pos_feats: int) -> jax.Array:
    """Dense 2D sine map -> (h, w, 2*num_pos_feats); normalize=True."""
    eps = 1e-6
    y = (jnp.arange(h, dtype=jnp.float32) + 1) / (h + eps) * _TWO_PI
    x = (jnp.arange(w, dtype=jnp.float32) + 1) / (w + eps) * _TWO_PI
    pos_y = _sine_embed(y, num_pos_feats)  # (h, f)
    pos_x = _sine_embed(x, num_pos_feats)  # (w, f)
    pos_y = jnp.broadcast_to(pos_y[:, None, :], (h, w, num_pos_feats))
    pos_x = jnp.broadcast_to(pos_x[None, :, :], (h, w, num_pos_feats))
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def position_embedding_sine_sparse(coords: jax.Array, num_pos_feats: int) -> jax.Array:
    """coords (..., 2) normalized [0,1] image (x, y) -> (..., 2*num_pos_feats)."""
    x = coords[..., 0] * _TWO_PI
    y = coords[..., 1] * _TWO_PI
    return jnp.concatenate(
        [_sine_embed(y, num_pos_feats), _sine_embed(x, num_pos_feats)], axis=-1
    )


def position_embedding_sine_depth(
    depth: jax.Array, num_pos_feats: int, max_depth: float = 60.0
) -> jax.Array:
    """depth (...,) meters -> (..., num_pos_feats) (SineSparseDepth)."""
    return _sine_embed(depth / max_depth * _TWO_PI, num_pos_feats)


class PositionEmbeddingLearnedDepth(nn.Module):
    """Learned depth-bin embedding (PositionEmbeddingLearnedDepth:122)."""

    num_pos_feats: int
    num_bins: int = 91
    bin_size: float = 1.0

    @nn.compact
    def __call__(self, depth: jax.Array) -> jax.Array:
        bins = jnp.clip(
            (depth / self.bin_size).astype(jnp.int32), 0, self.num_bins - 1
        )
        return nn.Embed(self.num_bins, self.num_pos_feats)(bins)

"""IACTR: image-query variant of the fusion core.

Equivalent of the IACTR / IACTRv2/v3 modules
(VoxelRCNN/pcdet/models/model_utils/actr.py:194,335,460 and
DeformableTransformerIACTR, actr_transformer.py:187): the dual of ACTR —
IMAGE pixels are the queries (dense, per level), voxel features splatted to
the image plane form the second query stream, and the output is the
ENHANCED IMAGE feature maps (fed to the camera branch / IFAT), not enhanced
voxels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .actr import ACTRConfig, EncoderLayer, FusionEncoderLayer
from .position_encoding import position_embedding_sine_2d
from .projection import splat_to_image


class IACTR(nn.Module):
    cfg: ACTRConfig

    @nn.compact
    def __call__(self, i_feats, voxel_feats, uv_norm, v_mask, train: bool = False):
        """i_feats: list of (B, H_l, W_l, C_l); voxel_feats (B, N, Cv);
        uv_norm (B, N, 2); v_mask (B, N). Returns enhanced maps (same
        shapes/channels as d_model per level)."""
        c = self.cfg
        assert len(i_feats) == c.n_levels

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (c.n_levels, c.d_model)
        )
        srcs, shapes, pos_list = [], [], []
        for l, feat in enumerate(i_feats):
            b, h, w, _ = feat.shape
            s = nn.Conv(c.d_model, (1, 1), name=f"input_proj{l}")(feat)
            s = nn.GroupNorm(num_groups=min(32, c.d_model), name=f"input_gn{l}")(s)
            pos = position_embedding_sine_2d(h, w, c.d_model // 2)
            srcs.append((s + pos[None] + level_embed[l]).reshape(b, h * w, c.d_model))
            pos_list.append(pos.reshape(1, h * w, c.d_model))
            shapes.append((h, w))
        value = jnp.concatenate(srcs, axis=1)
        shapes = tuple(shapes)

        # splat voxel features to each level -> the second query stream
        vproj = nn.Dense(c.d_model, name="v_proj")(voxel_feats)
        out_maps = []
        for l, (h, w) in enumerate(shapes):
            b = i_feats[l].shape[0]
            splat = splat_to_image(uv_norm, vproj, v_mask, (h, w))
            q = srcs[l]                       # image queries (flattened)
            qi = splat.reshape(b, h * w, c.d_model)  # voxel-splat queries
            # reference points: each pixel's own normalized coordinate
            gy, gx = jnp.meshgrid(
                (jnp.arange(h) + 0.5) / h, (jnp.arange(w) + 0.5) / w,
                indexing="ij",
            )
            ref = jnp.broadcast_to(
                jnp.stack([gx, gy], -1).reshape(1, h * w, 2), (b, h * w, 2)
            )
            ref_levels = jnp.repeat(ref[:, :, None, :], c.n_levels, axis=2)
            layer_cls = FusionEncoderLayer if c.hybrid else EncoderLayer
            qq, _ = layer_cls(c, name=f"layer{l}")(
                q, qi, None, ref_levels, value, shapes
            )
            out_maps.append(qq.reshape(b, h, w, c.d_model))
        return out_maps

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
from .position_encoding import (
    position_embedding_sine_2d, position_embedding_sine_depth,
    position_embedding_sine_sparse,
)
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


class IACTRv2(nn.Module):
    """Sparse-query image enhancement (reference IACTRv2,
    VoxelRCNN/pcdet/models/model_utils/actr.py:335-457): queries are only
    the pixels HIT by the voxel splat (nonzero of p_feats), per level,
    padded to a static max_ne; the dual query streams are the image feature
    and the (splat + image) feature at those pixels; deformable attention
    reads the combined (splat + image) multi-level maps; enhanced queries
    scatter back into zero image maps.

    IACTRv3 (actr.py:460-604) = the same with depth sine positional
    encodings — pass `p_depth` (per-level splat depth maps) and set
    cfg.pos_encode_method to 'depth'.
    """

    cfg: ACTRConfig
    max_ne: int = 4096

    @nn.compact
    def __call__(self, i_feats, p_feats, p_depth=None, train: bool = False):
        """i_feats / p_feats: lists of (B, H_l, W_l, C) image / voxel-splat
        maps; p_depth: optional list of (B, H_l, W_l) splat depths (v3).
        Returns enhanced image maps, d_model channels per level."""
        c = self.cfg
        assert len(i_feats) == c.n_levels == len(p_feats)

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (c.n_levels, c.d_model)
        )
        values, shapes = [], []
        q_i_all, q_p_all, ref_all, pos_all, mask_all, idx_all = [], [], [], [], [], []
        for l, (i_src, p_src) in enumerate(zip(i_feats, p_feats)):
            b, h, w, _ = i_src.shape
            i_proj = nn.Conv(c.d_model, (1, 1), name=f"i_input_proj{l}")(i_src)
            i_proj = nn.GroupNorm(
                num_groups=min(32, c.d_model), name=f"i_input_gn{l}")(i_proj)
            p_proj = nn.Conv(c.d_model, (1, 1), name=f"p_input_proj{l}")(p_src)
            p_proj = nn.GroupNorm(
                num_groups=min(32, c.d_model), name=f"p_input_gn{l}")(p_proj)

            pos = position_embedding_sine_2d(h, w, c.d_model // 2)
            comb = (p_proj + i_proj).reshape(b, h * w, c.d_model)
            values.append(comb + pos.reshape(1, h * w, c.d_model)
                          + level_embed[l])
            shapes.append((h, w))

            # splat-hit pixels -> static top-max_ne query set per level
            occ = (jnp.abs(p_src).max(-1) > 0).reshape(b, h * w)
            score = occ.astype(jnp.float32)
            k = min(self.max_ne, h * w)
            top, idx = jax.lax.top_k(score, k)
            qmask = top > 0
            take = lambda m: jnp.take_along_axis(m, idx[..., None], axis=1)
            q_i_all.append(take(i_proj.reshape(b, h * w, c.d_model)))
            q_p_all.append(take(comb))
            ys = (idx // w).astype(jnp.float32)
            xs = (idx % w).astype(jnp.float32)
            ref = jnp.stack([(xs + 0.5) / w, (ys + 0.5) / h], -1)
            ref_all.append(ref)
            if c.pos_encode_method == "depth" and p_depth is not None:
                d = jnp.take_along_axis(
                    p_depth[l].reshape(b, h * w), idx, axis=1)
                pos_all.append(
                    position_embedding_sine_depth(d, c.d_model, c.max_depth))
            else:
                pos_all.append(position_embedding_sine_sparse(
                    ref, c.d_model // 2))
            mask_all.append(qmask)
            idx_all.append(idx)

        value = jnp.concatenate(values, axis=1)
        shapes = tuple(shapes)
        q_i = jnp.concatenate(q_i_all, axis=1)
        q_p = jnp.concatenate(q_p_all, axis=1)
        q_pos = jnp.concatenate(pos_all, axis=1)
        ref = jnp.concatenate(ref_all, axis=1)
        qmask = jnp.concatenate(mask_all, axis=1)
        ref_levels = jnp.repeat(ref[:, :, None, :], c.n_levels, axis=2)

        layer_cls = FusionEncoderLayer if c.hybrid else EncoderLayer
        q, qi = q_p, q_i
        for i in range(c.num_layers):
            q, qi = layer_cls(c, name=f"layer{i}")(
                q, qi, q_pos, ref_levels, value, shapes
            )
        q = jnp.where(qmask[..., None], q, 0.0)

        # scatter enhanced queries back into zero image maps
        out_maps = []
        off = 0
        for l, (h, w) in enumerate(shapes):
            b = i_feats[l].shape[0]
            k = idx_all[l].shape[1]
            q_l = q[:, off:off + k]
            m_l = qmask[:, off:off + k]
            safe = jnp.where(m_l, idx_all[l], h * w)

            def one(flat_idx, feats):
                buf = jnp.zeros((h * w + 1, c.d_model), feats.dtype)
                return buf.at[flat_idx].set(feats, mode="drop")[:-1]

            out = jax.vmap(one)(safe, q_l).reshape(b, h, w, c.d_model)
            out_maps.append(out)
            off += k
        return out_maps

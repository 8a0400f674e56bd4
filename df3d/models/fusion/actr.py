"""ACTR: dual-query deformable cross-attention from voxel queries onto
multi-scale camera features — the paper's core module.

Equivalents (fresh TPU-native code; behavior matched, file:line for parity):
  * ACTR module / build()      — VoxelRCNN/pcdet/models/model_utils/actr.py:40-191,623
  * DeformableTransformerACTR  — actr_transformer.py:22-184 (flatten levels,
    level embeds, encoder call)
  * Encoder / (Fusion)Layers   — actr_transformer.py:361-598 ('hybrid' dual
    query layer with BiGate + dual FFN; ACTRv2 interleaves LocalTransformer
    on the voxel queries before every layer)

Differences by design:
  * all shapes static: queries padded to max_ne_voxel with a mask;
  * image levels are a python tuple of static (H, W);
  * no dropout by default (reference uses dropout=0.1; config-controlled).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .gates import GATES
from .msda_module import MSDeformAttnModule
from .pointformer import LocalTransformer
from .position_encoding import (
    position_embedding_sine_2d,
    position_embedding_sine_depth,
    position_embedding_sine_sparse,
)


@dataclasses.dataclass(frozen=True)
class ACTRConfig:
    d_model: int = 64
    n_heads: int = 8
    n_points: int = 4
    n_levels: int = 3
    num_layers: int = 1
    dim_feedforward: int = 256
    model_name: str = "ACTRv2"        # 'ACTR' | 'ACTRv2' (with LT)
    hybrid: bool = True               # dual-query fusion layers
    q_method: Optional[str] = "gating"
    q_rep_place: tuple = ("weight",)
    attn_layer: str = "BiGateSum1D_2"
    pos_encode_method: str = "depth"  # 'image_coor' | 'depth'
    max_depth: float = 60.0
    # LocalTransformer cfg (ACTRv2)
    lt_npoint: int = 2048
    lt_radius: float = 2.0
    lt_nsample: int = 32
    lt_num_layers: int = 2
    lt_feat_agg: str = "replace"
    # reference-exact FPS (chunks=1) + ball query (lax.top_k) for
    # checkpoint-parity evals (ADVICE r2): `--set actr.exact_ops=true`.
    # ~100x slower FPS on v5e — parity runs only.
    exact_ops: bool = False


class EncoderLayer(nn.Module):
    """Single-stream deformable encoder layer (actr_transformer.py:361-421)."""

    cfg: ACTRConfig

    @nn.compact
    def __call__(self, q_feat, q_i_feat, q_pos, ref_points, value, shapes,
                 value_mask=None):
        c = self.cfg
        attn_in = q_feat + q_pos if q_pos is not None else q_feat
        src2 = MSDeformAttnModule(
            c.d_model, c.n_levels, c.n_heads, c.n_points, name="self_attn"
        )(attn_in, ref_points, value, shapes, value_mask=value_mask)
        q_feat = nn.LayerNorm()(q_feat + src2)
        h = nn.Dense(c.dim_feedforward)(q_feat)
        h = nn.relu(h)
        h = nn.Dense(c.d_model)(h)
        q_feat = nn.LayerNorm()(q_feat + h)
        return q_feat, q_i_feat


class FusionEncoderLayer(nn.Module):
    """Dual-query (hybrid) layer (actr_transformer.py:424-512): MSDA with
    gated query mix writes into the IMAGE-query stream, bidirectional gate
    fuses the streams, separate FFNs per stream."""

    cfg: ACTRConfig

    @nn.compact
    def __call__(self, q_feat, q_i_feat, q_pos, ref_points, value, shapes,
                 value_mask=None):
        c = self.cfg
        add_pos = lambda t: t + q_pos if q_pos is not None else t
        src2 = MSDeformAttnModule(
            c.d_model, c.n_levels, c.n_heads, c.n_points,
            q_method=c.q_method, q_rep_place=c.q_rep_place, name="self_attn",
        )(
            add_pos(q_feat), ref_points, value, shapes,
            i_query=add_pos(q_i_feat), value_mask=value_mask,
        )
        q_i_feat = nn.LayerNorm()(q_i_feat + src2)

        q_feat, q_i_feat = GATES[c.attn_layer](name="gate")(q_feat, q_i_feat)

        hi = nn.Dense(c.dim_feedforward, name="i_ffn0")(q_i_feat)
        hi = nn.relu(hi)
        hi = nn.Dense(c.d_model, name="i_ffn1")(hi)
        q_i_feat = nn.LayerNorm()(q_i_feat + hi)

        hp = nn.Dense(c.dim_feedforward, name="p_ffn0")(q_feat)
        hp = nn.relu(hp)
        hp = nn.Dense(c.d_model, name="p_ffn1")(hp)
        q_feat = nn.LayerNorm()(q_feat + hp)
        return q_feat, q_i_feat


class ACTR(nn.Module):
    """Top-level fusion module.

    Inputs (all static shapes):
      q_feat      (B, Q, Cv)   voxel (LiDAR) query features
      q_i_feat    (B, Q, Ci)   image features sampled at voxel projections
                               (None unless hybrid/image modal)
      q_ref_coors (B, Q, 2)    normalized [0,1] image-plane reference points
      q_lidar_grid(B, Q, 3)    metric voxel centers (depth = x for pos enc,
                               xyz for LT)
      q_mask      (B, Q)       valid-query mask
      i_feats     list of (B, H_l, W_l, C_l) camera feature maps
    Returns enhanced voxel features (B, Q, d_model).
    """

    cfg: ACTRConfig
    query_in_dim: int | None = None  # for shape hints only

    @nn.compact
    def __call__(self, q_feat, q_i_feat, q_ref_coors, q_lidar_grid, q_mask,
                 i_feats, train: bool = False):
        c = self.cfg
        assert len(i_feats) == c.n_levels

        # query projections to d_model
        q = nn.Dense(c.d_model, name="q_proj")(q_feat)
        if c.hybrid or c.q_method is not None:
            assert q_i_feat is not None
            qi = nn.Dense(c.d_model, name="i_input_proj")(q_i_feat)
        else:
            qi = None

        # query positional encoding
        if c.pos_encode_method == "image_coor":
            q_pos = position_embedding_sine_sparse(q_ref_coors, c.d_model // 2)
        else:  # depth sine on forward distance
            q_pos = position_embedding_sine_depth(
                q_lidar_grid[..., 0], c.d_model, c.max_depth
            )

        # image side: channel-reduce each level + dense sine pos + level embed
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (c.n_levels, c.d_model)
        )
        srcs, shapes = [], []
        for l, feat in enumerate(i_feats):
            b, h, w, _ = feat.shape
            s = nn.Conv(c.d_model, (1, 1), name=f"input_proj{l}")(feat)
            s = nn.GroupNorm(num_groups=min(32, c.d_model), name=f"input_gn{l}")(s)
            pos = position_embedding_sine_2d(h, w, c.d_model // 2)
            s = s + pos[None] + level_embed[l]
            srcs.append(s.reshape(b, h * w, c.d_model))
            shapes.append((h, w))
        value = jnp.concatenate(srcs, axis=1)
        shapes = tuple(shapes)

        # reference points broadcast to every level
        ref = jnp.repeat(q_ref_coors[:, :, None, :], c.n_levels, axis=2)

        layer_cls = FusionEncoderLayer if c.hybrid else EncoderLayer
        for i in range(c.num_layers):
            if c.model_name == "ACTRv2":
                q = LocalTransformer(
                    c.lt_npoint, c.lt_radius, c.lt_nsample, c.d_model,
                    c.lt_num_layers, feat_agg_method=c.lt_feat_agg,
                    fps_chunks=1 if c.exact_ops else None,
                    exact_ball=c.exact_ops,
                    name=f"lidar_attn{i}",
                )(q_lidar_grid, q, q_mask)
            q, qi = layer_cls(c, name=f"layer{i}")(
                q, qi, q_pos, ref, value, shapes
            )

        # the encoder returns the enhanced LiDAR-query stream (q_feat)
        return jnp.where(q_mask[..., None], q, 0.0)

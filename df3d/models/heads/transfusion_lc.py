"""TransFusion (LC) image-fusion decoder stage.

Equivalent of the second, camera-attending decoder of the full TransFusion
(TransFusion/mmdet3d/models/dense_heads/transfusion_head.py:816-833,
902-1010): object queries from the LiDAR decoder cross-attend to multi-view
image features (visibility-masked by the queries' camera projections) and a
second set of FFN branches predicts residual refinements on top of the
first-stage boxes. Used when training the LC variant from a frozen -L
checkpoint (README LC rows).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .transfusion_head import PositionEmbeddingLearned, TransFusionHeadCfg


class TransFusionLCDecoder(nn.Module):
    cfg: TransFusionHeadCfg
    num_cams: int = 6

    @nn.compact
    def __call__(self, query_feat, query_pos_xy, first_preds, img_feats,
                 query_uv, query_vis, train: bool = False):
        """query_feat (B, P, C) decoder output; query_pos_xy (B, P, 2) BEV
        pixels; first_preds: first-stage prediction dict; img_feats
        (B, n_cam, Hc, Wc, Ci); query_uv (B, n_cam, P, 2) normalized image
        coords; query_vis (B, n_cam, P) visibility.

        Returns refined preds dict (same keys as the first stage).
        """
        c = self.cfg
        d = c.hidden_channel
        b, p, _ = query_feat.shape
        nc = self.num_cams
        hc, wc = img_feats.shape[2:4]

        kv = nn.Dense(d, name="img_proj")(img_feats)  # (B, nc, Hc, Wc, d)
        kv = kv.reshape(b, nc * hc * wc, d)

        # key positions: per-camera dense pixel grid embedding
        gy, gx = jnp.meshgrid(
            jnp.arange(hc, dtype=jnp.float32), jnp.arange(wc, dtype=jnp.float32),
            indexing="ij",
        )
        pix = jnp.stack([gx / wc, gy / hc], -1).reshape(1, 1, hc * wc, 2)
        cam_embed = self.param(
            "cam_embed", nn.initializers.normal(0.02), (nc, d)
        )
        kv_pos = PositionEmbeddingLearned(d, name="key_pos")(
            jnp.broadcast_to(pix, (b, nc, hc * wc, 2))
        ) + cam_embed[None, :, None, :]
        kv_pos = kv_pos.reshape(b, nc * hc * wc, d)

        q_pos = PositionEmbeddingLearned(d, name="query_pos")(query_pos_xy)

        # visibility mask: a query attends only to cameras that see it
        vis = jnp.transpose(query_vis, (0, 2, 1))      # (B, P, nc)
        vis = jnp.repeat(vis, hc * wc, axis=-1)        # (B, P, nc*Hc*Wc)
        mask = vis[:, None]                            # (B, 1, P, K)

        h = nn.MultiHeadDotProductAttention(
            c.num_heads, name="img_cross_attn"
        )(query_feat + q_pos, kv + kv_pos, mask=mask)
        q = nn.LayerNorm()(query_feat + h)
        hf = nn.Dense(c.ffn_channel)(q)
        hf = nn.relu(hf)
        hf = nn.Dense(d)(hf)
        q = nn.LayerNorm()(q + hf)

        def branch(name, ch):
            y = nn.Dense(d, name=f"{name}_fc0")(q)
            y = nn.relu(y)
            return nn.Dense(
                ch, kernel_init=nn.initializers.zeros, name=f"{name}_fc1"
            )(y)

        # residual refinement over the first-stage predictions
        out = dict(first_preds)
        out["center"] = first_preds["center"] + branch("center", 2)
        out["height"] = first_preds["height"] + branch("height", 1)[..., 0]
        out["dim"] = first_preds["dim"] + branch("dim", 3)
        out["rot"] = first_preds["rot"] + branch("rot", 2)
        out["vel"] = first_preds["vel"] + branch("vel", 2)
        out["cls"] = first_preds["cls"] + branch("cls", c.num_classes)
        return out

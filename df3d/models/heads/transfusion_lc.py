"""TransFusion (LC) image-fusion decoder stage.

Equivalent of the camera-attending second decoder of the full TransFusion
(TransFusion/mmdet3d/models/dense_heads/transfusion_head.py:816-833,
902-1010):
  * object queries from the LiDAR decoder are projected into the camera
    views; each query attends to ONE visible view (the reference keeps the
    last view whose frustum contains it),
  * the cross-attention carries an additive LOG-GAUSSIAN spatial bias
    centered at the projected box center with sigma from the projected
    corner extent (the reference's `gaussian_mask.log()` attn_mask),
  * a second FFN stack predicts from concat(image-query, lidar-query)
    (2*hidden channels), center residual added on the query BEV position,
  * queries visible in NO camera keep their first-stage predictions.

Image-guided query initialization (the height-collapsed per-view decoder
layers at :816-833) is provided by `collapse_image_init`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .transfusion_head import DecoderLayer, PositionEmbeddingLearned, TransFusionHeadCfg

_NEG = -1e9


def collapse_image_init(cfg, bev_feat, img_feats, make_layer):
    """Image-guided query init (transfusion_head.py:816-833): collapse each
    view's features over image height, then refine the flattened BEV
    features with one decoder layer per view.

    bev_feat (B, HW, C); img_feats (B, nc, Hc, Wc, C) already projected to
    hidden channels; make_layer(i) -> DecoderLayer module instance."""
    b, nc = img_feats.shape[:2]
    hc, wc = img_feats.shape[2:4]
    collapsed = img_feats.max(axis=2)  # (B, nc, Wc, C) max over height
    for v in range(nc):
        kv = collapsed[:, v]
        kv_pos = jnp.zeros_like(kv)
        q_pos = jnp.zeros_like(bev_feat)
        bev_feat = make_layer(v)(bev_feat, q_pos, kv, kv_pos)
    return bev_feat


class TransFusionLCDecoder(nn.Module):
    cfg: TransFusionHeadCfg
    num_cams: int = 6

    @nn.compact
    def __call__(self, query_feat, query_pos_xy, first_preds, img_feats,
                 query_uv, query_vis, query_radius=None, train: bool = False):
        """query_feat (B, P, C) LiDAR-decoder output; query_pos_xy (B, P, 2)
        BEV pixels; first_preds: first-stage prediction dict; img_feats
        (B, n_cam, Hc, Wc, Ci); query_uv (B, n_cam, P, 2) image-FEATURE
        pixel coords of the projected box centers; query_vis (B, n_cam, P)
        in-frustum mask; query_radius (B, n_cam, P) optional projected-
        corner circumradius in feature pixels (drives the gaussian bias).

        Returns refined preds dict (same keys as the first stage).
        """
        c = self.cfg
        d = c.hidden_channel
        b, p, _ = query_feat.shape
        nc = self.num_cams
        hc, wc = img_feats.shape[2:4]
        hw = hc * wc

        kv = nn.Dense(d, name="img_proj")(img_feats)  # (B, nc, Hc, Wc, d)
        kv = kv.reshape(b, nc, hw, d)

        # one view per query: the reference keeps the LAST visible view
        vis = jnp.transpose(query_vis, (0, 2, 1))  # (B, P, nc)
        rev = vis[..., ::-1]
        view_of_q = nc - 1 - rev.argmax(-1)            # (B, P)
        any_vis = vis.any(-1)
        view_of_q = jnp.where(any_vis, view_of_q, 0)

        # gather that view's kv per query is O(P*HW*d) memory; instead bias
        # the attention over the (nc*HW) keys: -inf outside the chosen view
        view_mask = (
            jnp.arange(nc)[None, None, :] == view_of_q[..., None]
        )  # (B, P, nc)
        bias = jnp.where(view_mask[..., None], 0.0, _NEG)  # (B, P, nc, 1)
        bias = jnp.broadcast_to(bias, (b, p, nc, hw))

        # log-gaussian spatial constraint around the projected center
        gy, gx = jnp.meshgrid(jnp.arange(hc, dtype=jnp.float32),
                              jnp.arange(wc, dtype=jnp.float32), indexing="ij")
        pix = jnp.stack([gx, gy], -1).reshape(1, 1, 1, hw, 2) + 0.5
        uv = jnp.transpose(query_uv, (0, 2, 1, 3))[:, :, :, None, :]
        dist2 = jnp.sum((uv - pix) ** 2, -1)  # (B, P, nc, HW)
        if query_radius is not None:
            radius = jnp.transpose(query_radius, (0, 2, 1))  # (B, P, nc)
            sigma = (2.0 * radius + 1.0) / 6.0
            bias = bias + (-dist2 / jnp.maximum(
                2.0 * sigma[..., None] ** 2, 1e-6))
        bias = bias.reshape(b, 1, p, nc * hw)  # broadcast over heads

        kv_flat = kv.reshape(b, nc * hw, d)
        img_pos = PositionEmbeddingLearned(d, name="key_pos")(
            jnp.broadcast_to(
                (pix - 0.5).reshape(1, hw, 2), (b, hw, 2)), train
        )
        kv_pos = jnp.tile(img_pos, (1, nc, 1))
        q_pos = PositionEmbeddingLearned(d, name="query_pos")(
            query_pos_xy, train
        )

        import functools

        h = nn.MultiHeadDotProductAttention(
            c.num_heads, name="img_cross_attn",
            attention_fn=functools.partial(
                nn.dot_product_attention, bias=bias),
        )(query_feat + q_pos, kv_flat + kv_pos)
        q = nn.LayerNorm()(query_feat + h)
        hf = nn.Dense(c.ffn_channel)(q)
        hf = nn.relu(hf)
        hf = nn.Dense(d)(hf)
        q = nn.LayerNorm()(q + hf)
        q = jnp.where(any_vis[..., None], q, 0.0)

        # second FFN stack over concat(img-query, lidar-query) — the
        # reference's prediction_heads[num_decoder_layers] on 2*hidden ch
        qq = jnp.concatenate([q, query_feat], axis=-1)

        def branch(name, ch):
            y = nn.Dense(c.head_conv, use_bias=False, name=f"{name}_fc0")(qq)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name=f"{name}_bn0")(y)
            y = nn.relu(y)
            return nn.Dense(ch, name=f"{name}_fc1")(y)

        out = dict(first_preds)
        refined = {
            "center": branch("center", 2) + query_pos_xy,
            "height": branch("height", 1)[..., 0],
            "dim": branch("dim", 3),
            "rot": branch("rot", 2),
            "vel": branch("vel", 2),
            "cls": branch("cls", c.num_classes),
        }
        # off-image queries keep the first-stage predictions
        for k, v in refined.items():
            m = any_vis if v.ndim == 2 else any_vis[..., None]
            out[k] = jnp.where(m, v, first_preds[k])
        return out

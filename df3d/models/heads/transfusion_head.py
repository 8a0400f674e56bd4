"""TransFusion-L query-decoder head, TPU-native.

Behavioral equivalent of TransFusion/mmdet3d/models/dense_heads/
transfusion_head.py:594-1376 (L variant, initialize_by_heatmap=True,
num_decoder_layers=1):
  dense heatmap -> class-specific maxpool NMS -> top-200 queries with
  category embedding -> one transformer decoder layer over BEV features ->
  FFN prediction branches -> (train) Hungarian matching + focal/L1/gaussian-
  focal losses, (eval) direct top-200 decode, nms_type=None.

TPU notes: the Hungarian assignment is backend-resolved (hungarian_match):
a host pure_callback to scipy linear_sum_assignment — train-only, tiny, and
identical to the reference's CPU scipy call (hungarian_assigner.py:93-149)
— where host callbacks exist, and the in-graph auction (ops/assign.py)
on relay backends that reject them.
Everything else is on device with static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from df3d.core.box_coders import TransFusionBBoxCoder
from df3d.core.iou import iou_3d
from df3d.core.target_utils import draw_gaussians, gaussian_radius
from df3d.models.losses import gaussian_focal_loss, sigmoid_focal_loss


@dataclasses.dataclass(frozen=True)
class TransFusionHeadCfg:
    num_classes: int = 10
    num_proposals: int = 200
    hidden_channel: int = 128
    num_heads: int = 8
    ffn_channel: int = 256
    nms_kernel_size: int = 3
    small_classes: tuple = (8, 9)  # pedestrian, traffic_cone: no maxpool NMS
    bev_size: tuple = (180, 180)
    out_size_factor: int = 8
    voxel_size: tuple = (0.075, 0.075)
    pc_range: tuple = (-54.0, -54.0)
    code_weights: tuple = (1.0,) * 8 + (0.2, 0.2)
    # costs (HungarianAssigner3D)
    cls_cost_weight: float = 0.15
    reg_cost_weight: float = 0.25
    iou_cost_weight: float = 0.25
    # losses
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 0.25
    loss_heatmap_weight: float = 1.0
    gaussian_overlap: float = 0.1
    min_radius: int = 2
    head_conv: int = 64  # FFN mid channels (reference FFN head_conv)

    @property
    def coder(self):
        return TransFusionBBoxCoder(
            pc_range=self.pc_range, voxel_size=self.voxel_size,
            out_size_factor=self.out_size_factor, code_size=10,
        )


class PositionEmbeddingLearned(nn.Module):
    """Conv1d -> BN1d -> ReLU -> Conv1d (reference transfusion_head.py
    PositionEmbeddingLearned), as Dense over the point axis."""

    d_model: int

    @nn.compact
    def __call__(self, xy: jax.Array, train: bool = False) -> jax.Array:
        h = nn.Dense(self.d_model)(xy)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn")(h)
        h = nn.relu(h)
        return nn.Dense(self.d_model)(h)


class DecoderLayer(nn.Module):
    """Self-attn over queries + cross-attn to BEV + FFN (pre-residual LN),
    matching the reference TransformerDecoderLayer (transfusion_head.py:44)."""

    d_model: int
    n_heads: int
    d_ffn: int

    @nn.compact
    def __call__(self, q, q_pos, kv, kv_pos):
        qp = q + q_pos
        h = nn.MultiHeadDotProductAttention(self.n_heads, name="self_attn")(
            qp, qp
        )
        q = nn.LayerNorm()(q + h)
        h = nn.MultiHeadDotProductAttention(self.n_heads, name="cross_attn")(
            q + q_pos, kv + kv_pos
        )
        q = nn.LayerNorm()(q + h)
        h = nn.Dense(self.d_ffn)(q)
        h = nn.relu(h)
        h = nn.Dense(self.d_model)(h)
        return nn.LayerNorm()(q + h)


class TransFusionHead(nn.Module):
    cfg: TransFusionHeadCfg

    @nn.compact
    def __call__(self, bev: jax.Array, train: bool):
        """bev (B, H, W, C_in) -> preds dict, all (B, P, ch)."""
        c = self.cfg
        b, hh, ww, _ = bev.shape
        d = c.hidden_channel
        p = c.num_proposals

        feat = nn.Conv(d, (3, 3), padding="SAME", name="shared_conv")(bev)

        # dense heatmap branch (heatmap_head.0 is a ConvModule with BN and
        # bias='auto' -> conv bias OFF; transfusion_head.py:670-678)
        h = nn.Conv(d, (3, 3), padding="SAME", use_bias=False,
                    name="hm_conv0")(feat)
        h = nn.BatchNorm(use_running_average=not train, name="hm_bn")(h)
        h = nn.relu(h)
        dense_heatmap = nn.Conv(
            c.num_classes, (3, 3), padding="SAME",
            bias_init=nn.initializers.constant(-2.19), name="hm_conv1",
        )(h)  # (B, H, W, ncls)

        heatmap = jax.nn.sigmoid(dense_heatmap)
        pad = c.nms_kernel_size // 2
        local_max = nn.max_pool(
            heatmap, (c.nms_kernel_size,) * 2, strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
        )
        is_peak = heatmap == local_max
        for cls_id in c.small_classes:  # kernel-1 (no pooling) classes
            is_peak = is_peak.at[..., cls_id].set(True)
        peaks = jnp.where(is_peak, heatmap, 0.0)

        flat = peaks.transpose(0, 3, 1, 2).reshape(b, -1)  # (B, ncls*H*W)
        top_scores, top_idx = jax.lax.top_k(flat, p)
        query_labels = top_idx // (hh * ww)                # (B, P)
        pos_idx = top_idx % (hh * ww)
        ys = (pos_idx // ww).astype(jnp.float32)
        xs = (pos_idx % ww).astype(jnp.float32)

        feat_flat = feat.reshape(b, hh * ww, d)
        query_feat = jnp.take_along_axis(feat_flat, pos_idx[..., None], axis=1)
        # category embedding added to the query features
        one_hot = jax.nn.one_hot(query_labels, c.num_classes)
        query_feat = query_feat + nn.Dense(d, name="class_encoding")(one_hot)

        query_pos_xy = jnp.stack([xs, ys], axis=-1)  # (B, P, 2) bev pixels
        q_pos = PositionEmbeddingLearned(d, name="query_pos_embed")(
            query_pos_xy, train
        )
        grid_y, grid_x = jnp.meshgrid(
            jnp.arange(hh, dtype=jnp.float32), jnp.arange(ww, dtype=jnp.float32),
            indexing="ij",
        )
        bev_xy = jnp.stack([grid_x, grid_y], -1).reshape(1, hh * ww, 2)
        kv_pos = PositionEmbeddingLearned(d, name="key_pos_embed")(
            jnp.broadcast_to(bev_xy, (b, hh * ww, 2)), train
        )

        q = DecoderLayer(d, c.num_heads, c.ffn_channel, name="decoder0")(
            query_feat, q_pos, feat_flat, kv_pos
        )

        def branch(name, ch, bias_init=0.0):
            # reference FFN: ConvModule(Conv1d no-bias + BN1d + ReLU) then
            # biased Conv1d (head_conv=64 mid channels)
            h = nn.Dense(c.head_conv, use_bias=False, name=f"{name}_fc0")(q)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name=f"{name}_bn0")(h)
            h = nn.relu(h)
            return nn.Dense(
                ch, bias_init=nn.initializers.constant(bias_init),
                name=f"{name}_fc1",
            )(h)

        center = branch("center", 2) + query_pos_xy  # offset from query pixel
        preds = {
            "query_feat": q,            # decoder output (LC stage input)
            "query_pos_xy": query_pos_xy,
            "center": center,
            "height": branch("height", 1)[..., 0],
            "dim": branch("dim", 3),
            "rot": branch("rot", 2),
            "vel": branch("vel", 2),
            "cls": branch("cls", c.num_classes, bias_init=-2.19),
            "dense_heatmap": dense_heatmap,
            "query_labels": query_labels,
            "query_score": jnp.take_along_axis(
                heatmap.reshape(b, hh * ww, c.num_classes), pos_idx[..., None],
                axis=1,
            ),  # (B, P, ncls) heatmap scores at query positions
        }
        return preds


def _hungarian_host(cost: np.ndarray, valid_cols: np.ndarray):
    """Host callback: linear_sum_assignment over valid gt columns only."""
    from scipy.optimize import linear_sum_assignment

    p, m = cost.shape
    matched_gt = np.full((p,), -1, np.int32)
    cols = np.nonzero(valid_cols)[0]
    if len(cols) > 0:
        r, cidx = linear_sum_assignment(cost[:, cols])
        matched_gt[r] = cols[cidx].astype(np.int32)
    return matched_gt


# "host": scipy linear_sum_assignment via pure_callback (reference-exact,
# needs a backend that supports host callbacks). "auction": fully in-graph
# Bertsekas auction (ops/assign.py) — required on backends that cannot
# host-call out of a compiled graph and for fully device-resident
# multi-host training; matches scipy's optimum up to near-ties (n*eps
# bound, tests/test_assign.py). "auto" (default) resolves per backend:
# the axon TPU relay rejects send/recv callbacks outright (probe 13:
# "UNIMPLEMENTED: axon_pjrt does not support host send/recv callbacks"),
# so it gets the auction; cpu/gpu/local-tpu keep reference-exact scipy.
ASSIGN_METHOD = "auto"


def set_assign_method(method: str) -> None:
    global ASSIGN_METHOD
    assert method in ("auto", "host", "auction"), method
    ASSIGN_METHOD = method


def _resolved_assign_method() -> str:
    if ASSIGN_METHOD != "auto":
        return ASSIGN_METHOD
    # NOTE: jax.default_backend() reports "tpu" on the axon relay (the
    # plugin registers platform "axon" but the devices are plain TPU), so
    # the r4 check never fired and "auto" kept the host callback — probe
    # 15 re-hit UNIMPLEMENTED there. The PJRT client's platform_version
    # ("axon 0.1.0; ...") is the reliable signal.
    try:
        ver = getattr(jax.devices()[0].client, "platform_version", "")
    except Exception:
        ver = ""
    return "auction" if "axon" in str(ver).lower() else "host"


def hungarian_match(cost: jax.Array, valid_cols: jax.Array) -> jax.Array:
    """(P, M) cost + (M,) validity -> (P,) matched gt index or -1."""
    if _resolved_assign_method() == "auction":
        from df3d.ops.assign import auction_assign

        return auction_assign(cost, valid_cols)
    p = cost.shape[0]
    return jax.pure_callback(
        _hungarian_host,
        jax.ShapeDtypeStruct((p,), jnp.int32),
        cost, valid_cols, vmap_method="sequential",
    )


def transfusion_targets_and_loss(
    cfg: TransFusionHeadCfg, preds, gt_boxes, gt_classes, gt_valid,
):
    """Hungarian assignment + losses (get_targets_single:1089, loss:1218).

    gt_boxes (B, M, 9) df3d 9-dof gravity-center boxes (converted to the
    coder's bottom-center convention internally); gt_classes (B, M).
    """
    coder = cfg.coder
    hh, ww = cfg.bev_size
    b, p = preds["cls"].shape[:2]

    # encode gt (coder expects bottom-center z)
    gt_bc = gt_boxes.at[..., 2].add(-0.5 * gt_boxes[..., 5])
    # reorder to coder input (x,y,z,dx,dy,dz,rot,vx,vy) == df3d layout
    gt_enc = coder.encode(gt_bc)  # (B, M, 10)

    pred_box = jnp.concatenate(
        [
            preds["center"], preds["height"][..., None], preds["dim"],
            preds["rot"], preds["vel"],
        ],
        axis=-1,
    )  # (B, P, 10) in encoded space

    # decode preds for IoU cost
    dec = coder.decode(
        preds["center"], preds["height"], preds["dim"],
        preds["rot"][..., 0], preds["rot"][..., 1], preds["vel"],
    )  # bottom-center 9-dof
    dec_gc = dec.at[..., 2].add(0.5 * dec[..., 5])

    cls_prob = jax.nn.sigmoid(preds["cls"])  # (B, P, ncls)

    def one(cls_prob_s, pred_box_s, dec_s, gt_enc_s, gt_s, gt_cls_s, gt_valid_s):
        # FocalLossCost (mmdet): pos_cost - neg_cost at the gt class
        eps = 1e-12
        pg = cls_prob_s  # (P, ncls)
        neg_cost = -jnp.log(1 - pg + eps) * 0.75 * pg**2
        pos_cost = -jnp.log(pg + eps) * 0.25 * (1 - pg) ** 2
        cls_cost = (pos_cost - neg_cost)[:, gt_cls_s]  # (P, M)
        # BBoxBEVL1Cost: normalized bev center l1
        pr = jnp.asarray(cfg.pc_range)
        extent = jnp.asarray(
            [cfg.voxel_size[0] * cfg.out_size_factor * ww,
             cfg.voxel_size[1] * cfg.out_size_factor * hh]
        )
        p_xy = (dec_s[:, :2] - pr) / extent
        g_xy = (gt_s[:, :2] - pr) / extent
        reg_cost = jnp.abs(p_xy[:, None, :] - g_xy[None, :, :]).sum(-1)
        # IoU3DCost
        iou = iou_3d(dec_s[:, :7], gt_s[:, :7])
        cost = (
            cfg.cls_cost_weight * cls_cost
            + cfg.reg_cost_weight * reg_cost
            + cfg.iou_cost_weight * (-iou)
        )
        # assignment is non-differentiable (reference runs it under no_grad)
        return hungarian_match(jax.lax.stop_gradient(cost), gt_valid_s)

    matched = jax.vmap(one)(
        cls_prob, pred_box, dec_gc, gt_enc, gt_boxes, gt_classes, gt_valid
    )  # (B, P) gt idx or -1

    pos_mask = matched >= 0
    safe_gt = jnp.maximum(matched, 0)

    # classification: matched -> gt class, else background (all-zero one-hot)
    tgt_cls = jnp.take_along_axis(gt_classes, safe_gt, axis=1)
    one_hot = jax.nn.one_hot(tgt_cls, cfg.num_classes) * pos_mask[..., None]
    num_pos = jnp.maximum(pos_mask.sum(), 1.0)
    cls_loss = (
        sigmoid_focal_loss(preds["cls"], one_hot, jnp.ones_like(pos_mask, jnp.float32))
        .sum() / num_pos
    )

    # bbox L1 on encoded targets
    tgt_box = jnp.take_along_axis(gt_enc, safe_gt[..., None], axis=1)
    bbox_l = jnp.abs(pred_box - tgt_box) * jnp.asarray(cfg.code_weights)
    bbox_loss = (bbox_l * pos_mask[..., None]).sum() / num_pos

    # dense heatmap loss (gaussian focal vs rendered gt heatmap)
    def render(gt_s, gt_cls_s, gt_valid_s):
        dx_pix = gt_s[:, 3] / cfg.voxel_size[0] / cfg.out_size_factor
        dy_pix = gt_s[:, 4] / cfg.voxel_size[1] / cfg.out_size_factor
        radius = jnp.maximum(
            cfg.min_radius,
            jnp.floor(gaussian_radius(dy_pix, dx_pix, cfg.gaussian_overlap)),
        ).astype(jnp.float32)
        x_pix = (gt_s[:, 0] - cfg.pc_range[0]) / cfg.voxel_size[0] / cfg.out_size_factor
        y_pix = (gt_s[:, 1] - cfg.pc_range[1]) / cfg.voxel_size[1] / cfg.out_size_factor
        centers = jnp.stack([x_pix, y_pix], -1)

        def per_class(ci):
            sel = gt_valid_s & (gt_cls_s == ci) & (dx_pix > 0) & (dy_pix > 0)
            return draw_gaussians(jnp.zeros((hh, ww)), centers, radius, sel)

        return jax.vmap(per_class)(jnp.arange(cfg.num_classes))  # (ncls,H,W)

    gt_hm = jax.vmap(render)(gt_boxes, gt_classes, gt_valid)
    pred_hm = jnp.clip(
        jax.nn.sigmoid(preds["dense_heatmap"]).transpose(0, 3, 1, 2), 1e-4, 1 - 1e-4
    )
    hm_loss = gaussian_focal_loss(pred_hm, gt_hm).sum() / jnp.maximum(
        (gt_hm == 1).sum(), 1.0
    )

    total = (
        cfg.loss_cls_weight * cls_loss
        + cfg.loss_bbox_weight * bbox_loss
        + cfg.loss_heatmap_weight * hm_loss
    )
    return total, {
        "tf_cls_loss": cls_loss, "tf_bbox_loss": bbox_loss,
        "tf_hm_loss": hm_loss, "tf_matched": pos_mask.sum(), "loss": total,
    }


def transfusion_get_bboxes(cfg: TransFusionHeadCfg, preds):
    """Direct top-200 decode, nms_type=None (get_bboxes:1285).

    Returns dict boxes (B, P, 9) gravity-center df3d convention, scores,
    labels."""
    coder = cfg.coder
    dec = coder.decode(
        preds["center"], preds["height"], preds["dim"],
        preds["rot"][..., 0], preds["rot"][..., 1], preds["vel"],
    )
    dec = dec.at[..., 2].add(0.5 * dec[..., 5])  # bottom -> gravity center
    cls_prob = jax.nn.sigmoid(preds["cls"])
    # reference: final score multiplies the query heatmap score (one-hot class)
    hm_score = jnp.take_along_axis(
        preds["query_score"], preds["query_labels"][..., None], axis=-1
    )[..., 0]
    scores = cls_prob.max(-1) * hm_score
    labels = cls_prob.argmax(-1)
    return {"boxes": dec, "scores": scores, "labels": labels}

"""CenterPoint detection head, TPU-native.

Behavioral equivalent of CenterPoint/det3d/models/bbox_heads/
center_head.py:65-515 (SepHead branches, FastFocal + masked-L1 losses,
decode + rotated NMS) with all post-processing on device and static shapes:
top-k pre-NMS instead of boolean masking, fixed post_max slots per task.

Box outputs are df3d 9-dof (x, y, z, dx, dy, dz, heading, vx, vy).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from df3d.core import nms as NMS
from df3d.core.target_utils import assign_center_targets
from df3d.models.losses import clamped_sigmoid, fast_focal_loss, reg_l1_loss

# (name, out_channels, num_convs) — det3d common_heads for nuScenes
DEFAULT_BRANCHES = (
    ("reg", 2, 2), ("height", 1, 2), ("dim", 3, 2), ("rot", 2, 2), ("vel", 2, 2),
)


class SepHeadBranch(nn.Module):
    out_channels: int
    num_convs: int
    head_conv: int = 64
    final_kernel: int = 3
    init_bias: float | None = None  # set for the heatmap branch

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        k = (self.final_kernel, self.final_kernel)
        from df3d.models import layers as _L

        dt = _L._COMPUTE_DTYPE_2D
        for _ in range(self.num_convs - 1):
            x = nn.Conv(self.head_conv, k, padding="SAME", dtype=dt)(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=dt)(x)
            x = nn.relu(x)
        bias_init = (
            nn.initializers.constant(self.init_bias)
            if self.init_bias is not None
            else nn.initializers.zeros
        )
        # final branch conv back in f32 (regression/heatmap numerics)
        return nn.Conv(
            self.out_channels, k, padding="SAME", bias_init=bias_init
        )(x.astype(jnp.float32))


class FeatureAdaption(nn.Module):
    """DCN-v1 feature adaption (det3d center_head.py:25-63): a zero-init
    1x1 conv predicts per-position tap deltas, a deformable 3x3 conv
    resamples; relu. Zero-init offsets make it a plain 3x3 conv at init."""

    channels: int
    groups: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        from df3d.ops.dcn import deform_conv2d

        off = nn.Conv(
            self.groups * 9 * 2, (1, 1),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name="conv_offset",
        )(x.astype(jnp.float32))
        w = self.param(
            "adapt_kernel", nn.initializers.he_normal(),
            (9, x.shape[-1], self.channels), jnp.float32,
        )
        y = deform_conv2d(x.astype(jnp.float32), off, w, self.groups)
        return nn.relu(y).astype(x.dtype)


class CenterHead(nn.Module):
    task_num_classes: Sequence[int]  # e.g. (1, 2, 2, 1, 2, 2) for nuScenes
    branches: tuple = DEFAULT_BRANCHES
    share_conv_channel: int = 64
    init_bias: float = -2.19
    dcn_head: bool = False  # DCNSepHead (det3d center_head.py:112-170)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool):
        """x (B, H, W, Cin) BEV features -> list over tasks of dicts of maps
        (B, H, W, c), plus 'hm' logits."""
        from df3d.models import layers as _L

        dt = _L._COMPUTE_DTYPE_2D
        x = nn.Conv(self.share_conv_channel, (3, 3), padding="SAME", dtype=dt)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=dt)(x)
        x = nn.relu(x)

        outs = []
        for t, ncls in enumerate(self.task_num_classes):
            if self.dcn_head:
                # separate deformable adaptions for cls / reg (DCNSepHead)
                x_cls = FeatureAdaption(
                    self.share_conv_channel, name=f"task{t}_adapt_cls"
                )(x, train)
                x_reg = FeatureAdaption(
                    self.share_conv_channel, name=f"task{t}_adapt_reg"
                )(x, train)
            else:
                x_cls = x_reg = x
            task_out = {}
            for name, ch, nconv in self.branches:
                task_out[name] = SepHeadBranch(ch, nconv, name=f"task{t}_{name}")(
                    x_reg, train
                )
            task_out["hm"] = SepHeadBranch(
                ncls, 2, init_bias=self.init_bias, name=f"task{t}_hm"
            )(x_cls, train)
            outs.append(task_out)
        return outs


def center_head_targets(
    gt_boxes, gt_classes, gt_valid, task_num_classes, feature_size,
    voxel_size, pc_range, out_size_factor, gaussian_overlap=0.1,
    min_radius=2, max_objs=500,
):
    """Batched multi-task target assignment. gt_classes are GLOBAL ids; each
    task takes its contiguous slice (det3d AssignLabel task split).

    Returns list over tasks of dicts with batched heatmap/anno_box/inds/mask/cat.
    """
    targets = []
    offset = 0
    for ncls in task_num_classes:
        in_task = (gt_classes >= offset) & (gt_classes < offset + ncls) & gt_valid
        local_cls = jnp.clip(gt_classes - offset, 0, ncls - 1)
        t = jax.vmap(
            lambda b, c, v: assign_center_targets(
                b, c, v, num_classes=ncls, feature_size=feature_size,
                voxel_size=voxel_size, pc_range=pc_range,
                out_size_factor=out_size_factor,
                gaussian_overlap=gaussian_overlap, min_radius=min_radius,
                max_objs=max_objs,
            )
        )(gt_boxes, local_cls, in_task)
        targets.append(t)
        offset += ncls
    return targets


def center_head_loss(preds, targets, code_weights, loc_weight=0.25):
    """Total loss across tasks (center_head.py:250-300 semantics)."""
    total, logs = 0.0, {}
    cw = jnp.asarray(code_weights)
    for t, (pred, tgt) in enumerate(zip(preds, targets)):
        b, h, w, ncls = pred["hm"].shape
        hm = clamped_sigmoid(pred["hm"]).reshape(b, h * w, ncls)
        tgt_hm = tgt["heatmap"].transpose(0, 2, 3, 1).reshape(b, h * w, ncls)
        hm_loss = fast_focal_loss(hm, tgt_hm, tgt["inds"], tgt["mask"], tgt["cats"])

        reg_map = jnp.concatenate(
            [pred["reg"], pred["height"], pred["dim"], pred["vel"], pred["rot"]],
            axis=-1,
        ).reshape(b, h * w, -1)
        box_loss = reg_l1_loss(reg_map, tgt["inds"], tgt["mask"], tgt["anno_box"])
        loc_loss = (box_loss * cw).sum()

        total = total + hm_loss + loc_weight * loc_loss
        logs[f"task{t}_hm_loss"] = hm_loss
        logs[f"task{t}_loc_loss"] = loc_loss
    logs["loss"] = total
    return total, logs


def center_head_predict(
    preds, voxel_size, pc_range, out_size_factor, post_center_range,
    score_threshold=0.1, nms_thresh=0.2, pre_max_size=1024, post_max_size=83,
):
    """Decode + rotated NMS, fully on device.

    Returns dict with boxes (B, K, 9), scores (B, K), labels (B, K),
    valid (B, K) where K = num_tasks * post_max_size.
    """
    pcr = jnp.asarray(post_center_range)

    # decode candidates for every task, then STACK tasks into one batched
    # greedy NMS: the 1024-step sequential suppression loop is latency-
    # bound, so running all (batch x task) problems through one vmapped
    # call amortizes it num_tasks-fold (v5e: ~6x on the nuScenes split)
    cand_boxes, cand_scores, cand_labels, cand_ok = [], [], [], []
    class_offset = 0
    for pred in preds:
        b, h, w, ncls = pred["hm"].shape
        hm = clamped_sigmoid(pred["hm"]).reshape(b, h * w, ncls)
        scores = hm.max(-1)
        labels = hm.argmax(-1) + class_offset

        def decode_one(scores_i, labels_i, reg, height, dim, rot, vel):
            # approx_max_k: TPU-accelerated; candidates beyond the NMS keep
            # set are score-thresholded anyway, so approximate recall is fine
            top_scores, idx = jax.lax.approx_max_k(scores_i, pre_max_size)
            ys = (idx // w).astype(jnp.float32)
            xs = (idx % w).astype(jnp.float32)
            reg_i = reg.reshape(h * w, 2)[idx]
            x = (xs + reg_i[:, 0]) * out_size_factor * voxel_size[0] + pc_range[0]
            y = (ys + reg_i[:, 1]) * out_size_factor * voxel_size[1] + pc_range[1]
            z = height.reshape(h * w)[idx]
            dims = jnp.exp(dim.reshape(h * w, 3)[idx])
            rot_i = rot.reshape(h * w, 2)[idx]
            heading = jnp.arctan2(rot_i[:, 0], rot_i[:, 1])
            vel_i = vel.reshape(h * w, 2)[idx]
            boxes = jnp.concatenate(
                [jnp.stack([x, y, z], -1), dims, heading[:, None], vel_i], axis=-1
            )
            in_range = (boxes[:, :3] >= pcr[:3]).all(-1) & (boxes[:, :3] <= pcr[3:]).all(-1)
            ok = (top_scores > score_threshold) & in_range
            return boxes, top_scores, labels_i[idx], ok

        boxes, scs, lbs, ok = jax.vmap(decode_one)(
            scores, labels, pred["reg"], pred["height"], pred["dim"],
            pred["rot"], pred["vel"],
        )
        cand_boxes.append(boxes)
        cand_scores.append(scs)
        cand_labels.append(lbs)
        cand_ok.append(ok)
        class_offset += ncls

    nt = len(preds)
    boxes = jnp.stack(cand_boxes, 1).reshape(b * nt, pre_max_size, -1)
    scores = jnp.stack(cand_scores, 1).reshape(b * nt, pre_max_size)
    labels = jnp.stack(cand_labels, 1).reshape(b * nt, pre_max_size)
    ok = jnp.stack(cand_ok, 1).reshape(b * nt, pre_max_size)

    def nms_one(boxes_s, scores_s, labels_s, ok_s):
        keep_idx, keep_mask = NMS.nms_bev(
            boxes_s[:, :7], scores_s, nms_thresh,
            pre_max_size=pre_max_size, post_max_size=post_max_size,
            valid=ok_s,
        )
        return (
            boxes_s[keep_idx], scores_s[keep_idx] * keep_mask,
            labels_s[keep_idx], keep_mask,
        )

    kb, ks, kl, kv = jax.vmap(nms_one)(boxes, scores, labels, ok)
    k = nt * post_max_size
    return {
        "boxes": kb.reshape(b, k, -1),
        "scores": ks.reshape(b, k),
        "labels": kl.reshape(b, k),
        "valid": kv.reshape(b, k),
    }

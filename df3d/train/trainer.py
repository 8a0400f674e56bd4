"""Train-step factory: the TPU-native replacement for the reference's three
trainers (pcdet train_utils.train_one_epoch, det3d torchie Trainer, mmcv
Runner — SURVEY §2.7). One functional step: voxelize (device) -> forward ->
loss -> grads -> optax update, all inside a single jit; data parallelism
comes from sharding the batch leading dim over the mesh.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax.training import train_state

from df3d.models.detectors.centerpoint import (
    CenterPoint, CenterPointConfig, centerpoint_loss, centerpoint_predict,
)
from df3d.ops.voxelize import voxelize_batch


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def create_centerpoint_state(
    cfg: CenterPointConfig, rng: jax.Array, tx, example_points
) -> tuple[CenterPoint, TrainState]:
    model = CenterPoint(cfg)
    res = voxelize_batch(
        example_points, jnp.ones(example_points.shape[:2], bool),
        cfg.voxel_size, cfg.pc_range, cfg.grid_size, cfg.max_voxels,
        cfg.max_points_per_voxel,
    )
    variables = model.init(rng, res.features, res.coords, train=False)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        batch_stats=variables["batch_stats"],
    )
    return model, state


def make_centerpoint_train_step(model: CenterPoint, cfg: CenterPointConfig) -> Callable:
    """batch dict: points (B, P, F), points_valid (B, P), gt_boxes (B, M, 9),
    gt_classes (B, M), gt_valid (B, M)."""

    def train_step(state: TrainState, batch):
        res = voxelize_batch(
            batch["points"], batch["points_valid"], cfg.voxel_size,
            cfg.pc_range, cfg.grid_size, cfg.max_voxels,
            cfg.max_points_per_voxel,
        )

        def loss_fn(params):
            (preds, _), updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                res.features, res.coords, train=True,
                mutable=["batch_stats", "intermediates"],
            )
            total, logs = centerpoint_loss(
                cfg, preds, batch["gt_boxes"], batch["gt_classes"],
                batch["gt_valid"],
            )
            logs["cap_overflow"] = _overflow_log(updates)
            return total, (logs, updates)

        (_, (logs, updates)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(
            grads=grads, batch_stats=updates["batch_stats"]
        )
        return state, logs

    return train_step


def make_voxelrcnn_train_step(model, head, cfg, fused: bool = False,
                              aux: bool = False, image_hw=None,
                              aux_seg_weight: float = 1.0,
                              aux_consistency_weight: float = 0.1,
                              ) -> Callable:
    """Two-stage Voxel R-CNN train step: RPN targets/loss + proposal NMS +
    ROI sampling + RCNN head/loss (pcdet train_one_epoch semantics).

    `model` is the VoxelRCNN detector, `head` a bound-compatible
    VoxelRCNNHead; state.params = {"rpn": ..., "rcnn": ...} and
    state.batch_stats = {"rpn": ..., "rcnn": ...} (the rcnn head carries
    BatchNorm, matching pcdet's Linear+BN1d stacks). The train step takes
    (state, batch, rng) — rng drives the ROI subsampler (the reference
    uses torch's global RNG there).

    `fused=True` drives a VoxelRCNN3DDF model instead: the batch must also
    carry images (B, n_cam, H, W, 3) + proj (B, n_cam, 3, 4), forwarded to
    the fused detector's signature (images feed the ACTR hook).
    """
    from df3d.models.detectors.voxel_rcnn import (
        assign_rpn_targets, build_anchors, proposal_layer,
        voxel_rcnn_train_losses,
    )
    from df3d.models.heads.voxelrcnn_head import sample_rois_for_training
    from df3d.ops.voxelize import voxelize_batch as _vox

    anchors = build_anchors(cfg)

    def train_step(state, batch, rng):
        res = _vox(
            batch["points"], batch["points_valid"], cfg.voxel_size,
            cfg.pc_range, cfg.grid_size, cfg.max_voxels,
            cfg.max_points_per_voxel,
        )
        rpn_targets = assign_rpn_targets(
            cfg, anchors, batch["gt_boxes"][..., :7], batch["gt_classes"],
            batch["gt_valid"],
        )

        def loss_fn(params):
            fwd_args = (res.features, res.coords)
            if fused:
                fwd_args = fwd_args + (batch["images"], batch["proj"])
            preds, updates = model.apply(
                {"params": params["rpn"],
                 "batch_stats": state.batch_stats["rpn"]},
                *fwd_args, train=True,
                mutable=["batch_stats", "intermediates"],
            )
            rois, roi_scores, roi_mask = proposal_layer(
                cfg, preds, anchors, train=True
            )
            keys = jax.random.split(rng, rois.shape[0])
            rcnn_targets = jax.vmap(
                lambda r, s, m, g, gv, key: sample_rois_for_training(
                    key, r, s, m, g, gv, cfg.rcnn
                )
            )(rois, roi_scores, roi_mask, batch["gt_boxes"][..., :7],
              batch["gt_valid"], keys)
            (cls, reg), r_updates = head.apply(
                {"params": params["rcnn"],
                 "batch_stats": state.batch_stats["rcnn"]},
                rcnn_targets["rois"], rcnn_targets["mask"], preds["ms"],
                train=True, mutable=["batch_stats"],
            )
            total, logs = voxel_rcnn_train_losses(
                cfg, preds, {"cls": cls, "reg": reg}, rpn_targets, rcnn_targets
            )
            if aux:  # fused VoxelRCNN3DDF aux seg/consistency objectives
                a_total, a_logs = _fused_aux_terms(
                    updates, batch, image_hw,
                    aux_seg_weight, aux_consistency_weight)
                total = total + a_total
                logs = dict(logs, **a_logs)
                logs["loss"] = total
            logs["cap_overflow"] = _overflow_log(updates)
            return total, (logs, updates, r_updates)

        (_, (logs, updates, r_updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(
            grads=grads,
            batch_stats={
                "rpn": updates["batch_stats"],
                "rcnn": r_updates["batch_stats"],
            },
        )
        return state, logs

    return train_step


def make_transfusion_train_step(model, cfg) -> Callable:
    """TransFusion-L train step (mmdet train_detector semantics)."""
    from df3d.models.detectors.transfusion import transfusion_loss
    from df3d.ops.voxelize import voxelize_batch as _vox

    def train_step(state, batch):
        res = _vox(
            batch["points"], batch["points_valid"], cfg.voxel_size,
            cfg.pc_range, cfg.grid_size, cfg.max_voxels,
            cfg.max_points_per_voxel,
        )

        def loss_fn(params):
            (preds, _), updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                res.features, res.coords, train=True,
                mutable=["batch_stats", "intermediates"],
            )
            total, logs = transfusion_loss(
                cfg, preds, batch["gt_boxes"], batch["gt_classes"],
                batch["gt_valid"],
            )
            logs["cap_overflow"] = _overflow_log(updates)
            return total, (logs, updates)

        (_, (logs, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(
            grads=grads, batch_stats=updates["batch_stats"]
        )
        return state, logs

    return train_step


def _collect_sown(tree, leaf_name):
    """Depth-first collect every sown value named `leaf_name` from a flax
    "intermediates" collection (values are tuples from sow's append
    reducer)."""
    found = []

    def walk(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if k == leaf_name:
                    found.extend(v if isinstance(v, tuple) else (v,))
                else:
                    walk(v)

    walk(tree)
    return found


def _fused_aux_terms(updates, batch, image_hw, seg_weight,
                     consistency_weight):
    """Aux seg + consistency losses from sown intermediates — shared by
    make_fused_train_step and the fused VoxelRCNN step (ref
    SemanticSeg/aux_seg_loss.py AuxImgSegmentLoss:20 +
    AuxConsistencyLoss:181)."""
    from df3d.models.fusion.aux_heads import fused_aux_losses

    inter = updates["intermediates"]
    seg = _collect_sown(inter, "aux_seg_logits")
    if not seg:
        raise ValueError(
            "aux=True needs a model built with "
            "FusedConfig.with_aux_seg=True (no aux_seg_logits were sown)")
    proj = batch["proj"]
    gt_boxes, gt_valid = batch["gt_boxes"], batch["gt_valid"]
    if proj.ndim == 4:  # multicam: fold cameras into batch
        b, nc = proj.shape[:2]
        proj = proj.reshape(b * nc, 3, 4)
        gt_boxes = jnp.repeat(gt_boxes, nc, axis=0)
        gt_valid = jnp.repeat(gt_valid, nc, axis=0)
    pairs = _collect_sown(inter, "aux_consistency")
    vf, ifeat, vmask = pairs[0] if pairs else (None, None, None)
    return fused_aux_losses(
        seg[0], gt_boxes, gt_valid, proj, image_hw,
        voxel_feats=vf, image_feats_at_voxels=ifeat, voxel_mask=vmask,
        seg_weight=seg_weight, consistency_weight=consistency_weight,
    )


def _overflow_log(updates):
    """Total of every `cap_overflow_*` sow (backbones_3d._sow_overflow +
    the dense-tail sparsify) -> scalar int32 for the step logs. Unused
    sibling sows are DCE'd by jit since only this scalar leaves loss_fn.
    0 when the model sows nothing (e.g. dense_tail with no strided plans
    capped)."""
    total = jnp.int32(0)

    def walk(node):
        nonlocal total
        if isinstance(node, dict):
            for k, v in node.items():
                if k.startswith("cap_overflow"):
                    for leaf in jax.tree_util.tree_leaves(v):
                        total = total + leaf.sum().astype(jnp.int32)
                else:
                    walk(v)

    walk(updates.get("intermediates", {}))
    return total


def make_fused_train_step(model, lidar_cfg, aux: bool = False,
                          image_hw=None, aux_seg_weight: float = 1.0,
                          aux_consistency_weight: float = 0.1) -> Callable:
    """Train step for the fused 3D-DF detectors (CenterPoint3DDF /
    TransFusion3DDF): batch additionally carries images (B, n_cam, H, W, 3)
    and proj (B, n_cam, 3, 4). The loss follows the host family.

    aux=True adds the fused aux objectives (ref SemanticSeg/aux_seg_loss.py
    AuxImgSegmentLoss:20 + AuxConsistencyLoss:181): image-FG focal seg loss
    on the model's AuxSegHead logits (requires FusedConfig.with_aux_seg)
    and the voxel/camera feature consistency term at the ACTR fusion point,
    both read from sown "intermediates". image_hw is the input image shape
    (needed to render the FG target from projected gt boxes)."""
    from df3d.models.detectors.centerpoint import (
        CenterPointConfig as _CPCfg, centerpoint_loss as _cp_loss,
    )
    from df3d.models.detectors.transfusion import (
        TransFusionConfig as _TFCfg, transfusion_loss as _tf_loss,
    )
    from df3d.models.fusion.aux_heads import fused_aux_losses

    if isinstance(lidar_cfg, _CPCfg):
        loss_fn_family = lambda preds, b: _cp_loss(
            lidar_cfg, preds, b["gt_boxes"], b["gt_classes"], b["gt_valid"])
    elif isinstance(lidar_cfg, _TFCfg):
        loss_fn_family = lambda preds, b: _tf_loss(
            lidar_cfg, preds, b["gt_boxes"], b["gt_classes"], b["gt_valid"])
    else:
        raise ValueError(f"unsupported fused host config {type(lidar_cfg)}")

    def train_step(state, batch):
        res = voxelize_batch(
            batch["points"], batch["points_valid"], lidar_cfg.voxel_size,
            lidar_cfg.pc_range, lidar_cfg.grid_size, lidar_cfg.max_voxels,
            lidar_cfg.max_points_per_voxel,
        )

        def loss_fn(params):
            mut = ["batch_stats", "intermediates"]
            (preds, _), updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                res.features, res.coords, batch["images"], batch["proj"],
                train=True, mutable=mut,
            )
            total, logs = loss_fn_family(preds, batch)
            if aux:
                a_total, a_logs = _fused_aux_terms(
                    updates, batch, image_hw,
                    aux_seg_weight, aux_consistency_weight)
                total = total + a_total
                logs = dict(logs, **a_logs, loss=total)
            logs["cap_overflow"] = _overflow_log(updates)
            return total, (logs, updates)

        (_, (logs, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(
            grads=grads, batch_stats=updates["batch_stats"]
        )
        return state, logs

    return train_step


def make_centerpoint_eval_step(model: CenterPoint, cfg: CenterPointConfig,
                               tta: str | None = None,
                               fused: bool = False) -> Callable:
    """Eval step; tta='double_flip' evaluates each sample as
    [id, flip_y, flip_x, flip_both] (batch x4), un-flips and averages the
    head maps before decoding — the det3d CenterPoint TTA path
    (CenterPoint/det3d/models/bbox_heads/center_head.py:327-423).

    fused=True drives CenterPoint3DDF: batch carries images/proj. TTA on a
    fused model rides the same lidar flips with the reflection COMPOSED
    into the projection matrices (tta.expand_proj_double_flip) and the
    images repeated — flipped points still project onto the same pixels
    (the reference tracks pcd_*_flip through img_metas the same way)."""
    assert tta in (None, "double_flip"), tta

    def eval_step(state: TrainState, batch):
        points, valid = batch["points"], batch["points_valid"]
        if tta == "double_flip":
            from df3d.models.tta import (
                expand_points_double_flip, merge_center_head_maps,
            )
            points = expand_points_double_flip(points)
            valid = jnp.repeat(valid, 4, axis=0)
        res = voxelize_batch(
            points, valid, cfg.voxel_size,
            cfg.pc_range, cfg.grid_size, cfg.max_voxels,
            cfg.max_points_per_voxel,
        )
        fwd = (res.features, res.coords)
        if fused:
            images, proj = batch["images"], batch["proj"]
            if tta == "double_flip":
                from df3d.models.tta import (
                    expand_images_double_flip, expand_proj_double_flip,
                )
                images = expand_images_double_flip(images)
                proj = expand_proj_double_flip(proj)
            fwd = fwd + (images, proj)
        preds, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            *fwd, train=False,
        )
        if tta == "double_flip":
            preds = merge_center_head_maps(preds)
        return centerpoint_predict(cfg, preds)

    return eval_step


def make_transfusion_eval_step(model, cfg, fused: bool = False) -> Callable:
    """TransFusion(-L / -3DDF) eval step -> dict boxes/scores/labels/valid
    (mmdet3d simple_test -> get_bboxes semantics)."""
    from df3d.models.detectors.transfusion import transfusion_predict

    def eval_step(state: TrainState, batch):
        res = voxelize_batch(
            batch["points"], batch["points_valid"], cfg.voxel_size,
            cfg.pc_range, cfg.grid_size, cfg.max_voxels,
            cfg.max_points_per_voxel,
        )
        fwd = (res.features, res.coords)
        if fused:
            fwd = fwd + (batch["images"], batch["proj"])
        preds, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            *fwd, train=False,
        )
        out = transfusion_predict(cfg, preds)
        if "valid" not in out:
            out["valid"] = jnp.ones(out["scores"].shape, bool)
        return out

    return eval_step


def make_voxelrcnn_eval_step(model, head, cfg, fused: bool = False) -> Callable:
    """Two-stage Voxel R-CNN eval step (pcdet eval_one_epoch inner loop):
    RPN -> proposals -> RCNN refine -> post_processing. Also returns the
    raw proposals (`rois`, `roi_mask`) so the eval loop can log recall
    records a la pcdet generate_recall_record
    (VoxelRCNN/pcdet/models/detectors/detector3d_template.py:287)."""
    from df3d.models.detectors.voxel_rcnn import (
        build_anchors, proposal_layer, voxel_rcnn_post_processing,
    )

    anchors = build_anchors(cfg)

    def eval_step(state: TrainState, batch):
        res = voxelize_batch(
            batch["points"], batch["points_valid"], cfg.voxel_size,
            cfg.pc_range, cfg.grid_size, cfg.max_voxels,
            cfg.max_points_per_voxel,
        )
        fwd = (res.features, res.coords)
        if fused:
            fwd = fwd + (batch["images"], batch["proj"])
        preds = model.apply(
            {"params": state.params["rpn"],
             "batch_stats": state.batch_stats["rpn"]},
            *fwd, train=False,
        )
        rois, roi_scores, roi_mask = proposal_layer(
            cfg, preds, anchors, train=False)
        cls, reg = head.apply(
            {"params": state.params["rcnn"],
             "batch_stats": state.batch_stats["rcnn"]},
            rois, roi_mask, preds["ms"], train=False,
        )
        out = voxel_rcnn_post_processing(
            cfg, rois, roi_scores, roi_mask, cls, reg)
        out["rois"] = rois
        out["roi_mask"] = roi_mask
        return out

    return eval_step


def recalibrate_batch_stats(run_mutable_fwd: Callable, batch_stats,
                            momentum: float = 0.99):
    """Exact batch-norm recalibration by momentum inversion.

    Every BN in df3d uses flax-convention momentum 0.99 (torch 0.01 —
    layers.py MaskedBatchNorm and all nn.BatchNorm calls), so after a few
    dozen train steps the running averages still sit ~0.99^k of the way
    back at their init values, and eval-mode outputs diverge badly from
    train-mode ones (short schedules, fixture tests, fine-tuning). The
    reference escapes this only by training for epochs; this utility
    recovers the EXACT batch statistics b of a calibration batch from ONE
    train-mode mutable pass, because the BN update is affine in b:

        s1 = m * s0 + (1 - m) * b   =>   b = (s1 - m * s0) / (1 - m)

    Train-mode activations do not depend on the running averages, so a
    single pass recovers every layer's true batch statistics at once.

    run_mutable_fwd: batch_stats_pytree -> updated batch_stats_pytree (a
    train-mode apply with mutable=["batch_stats"], e.g. wrapping
    model.apply over a representative batch). Returns recalibrated stats
    (leafs cast back to the input dtypes; variance floored at 0 against
    float cancellation).
    """
    s1 = run_mutable_fwd(batch_stats)

    flat0, _ = jax.tree_util.tree_flatten_with_path(batch_stats)
    flat1, treedef = jax.tree_util.tree_flatten_with_path(s1)
    out = []
    for (_, old), (path, new) in zip(flat0, flat1):
        b = (new - momentum * old) / (1.0 - momentum)
        if any("var" in str(getattr(k, "key", k)) for k in path):
            # variance must stay non-negative; inversion can go slightly
            # negative via float cancellation when new ~= m * old
            b = jnp.maximum(b, 0.0)
        out.append(b.astype(old.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)

#!/usr/bin/env python
"""df3d evaluation CLI — ALL families (counterpart of the reference's three
eval stacks: VoxelRCNN/tools/eval_utils/eval_utils.py:22-126 eval_one_epoch,
CenterPoint tools/dist_test.py, TransFusion tools/test.py):

  * centerpoint_nusc / centerpoint_3ddf_nusc    -> nuScenes mAP/NDS
  * transfusion_l_nusc / transfusion_3ddf_nusc  -> nuScenes mAP/NDS
  * voxel_rcnn_car_kitti / voxel_rcnn_3ddf_kitti -> KITTI 3d/bev/bbox AP +
    AOS + proposal/final recall records at 0.3/0.5/0.7 IoU
    (detector3d_template.py:287 generate_recall_record)

  python tools/test.py --preset centerpoint_nusc --data-root ... \
      --info-path infos_val.pkl --ckpt work_dirs/cp/ckpt [--watch] [--tta ..]

Fused presets decode real camera JPEGs through the runtime image pipeline
(df3d/data/images.py). --watch polls the checkpoint dir (repeat_eval_ckpt).
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse
import json
import time


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", required=True)
    p.add_argument("--data-root", default=None)
    p.add_argument("--info-path", default=None)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--max-points", type=int, default=260_000)
    p.add_argument("--image-shape", type=int, nargs=2, default=None)
    p.add_argument("--aux-loss", action="store_true",
                   help="checkpoint was trained with --aux-loss (fused "
                        "models: include aux_seg params in the template)")
    p.add_argument("--out", default=None)
    p.add_argument("--tta", choices=["double_flip"], default=None,
                   help="test-time augmentation (det3d double-flip)")
    p.add_argument("--set", nargs="*", default=[], dest="overrides")
    p.add_argument("--watch", action="store_true")
    p.add_argument("--max-waiting-mins", type=int, default=30)
    p.add_argument("--serving-profile", default="exact",
                   choices=("exact", "tpu_v5e"),
                   help="numerics profile (df3d/serving.py): 'exact' = "
                        "reference-exact f32+sort; 'tpu_v5e' = the benched "
                        "serving config (bf16 conv bodies >=32ch)")
    return p.parse_args()


def build_eval(args, preset):
    """-> (state_template, eval_step, lidar_cfg, family, fused_extra).

    Template construction shared with tools/train.py via
    df3d.models.build.build_detector (one source of truth for checkpoint
    compatibility: param tree, image branch, aux heads, image shape)."""
    from df3d.models.build import build_detector
    from df3d.train.schedules import adam_onecycle
    from df3d.train.trainer import (
        make_centerpoint_eval_step, make_transfusion_eval_step,
        make_voxelrcnn_eval_step,
    )

    tx = adam_onecycle(1e-3, 1)
    built = build_detector(
        preset, tx, image_shape=args.image_shape,
        # checkpoints trained with tools/train.py --aux-loss carry aux_seg
        # params; the restore template must match
        with_aux_seg=getattr(args, "aux_loss", False),
    )
    fused_extra = ((built.num_cams, built.image_shape) if built.fused
                   else None)
    if built.family == "voxelrcnn":
        step = make_voxelrcnn_eval_step(
            built.model, built.head, built.lidar_cfg, fused=built.fused)
    elif built.family == "centerpoint":
        step = make_centerpoint_eval_step(
            built.model, built.lidar_cfg, tta=args.tta, fused=built.fused)
    else:
        step = make_transfusion_eval_step(
            built.model, built.lidar_cfg, fused=built.fused)
    return built.state, step, built.lidar_cfg, built.family, fused_extra


def build_dataset(args, fused_extra):
    is_kitti = args.preset.endswith("_kitti")
    if is_kitti:
        from df3d.data.kitti import KittiDataset

        return KittiDataset(
            args.data_root, args.info_path, training=False,
            load_images=bool(fused_extra),
            image_shape=fused_extra[1] if fused_extra else (384, 1280),
        ), True
    from df3d.data.nuscenes import NuScenesDataset

    return NuScenesDataset(
        args.data_root, args.info_path,
        load_images=bool(fused_extra),
        image_shape=fused_extra[1] if fused_extra else (448, 800),
    ), False


def evaluate_once(args, preset, state_dir, ckpt_path=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from df3d.data.pipeline import PrefetchLoader, make_batch
    from df3d.train.checkpoint import restore_checkpoint, restore_latest

    state, eval_step, cfg, family, fused_extra = build_eval(args, preset)
    if ckpt_path is not None:  # post-train last-N eval picks specific steps
        state, step_no = restore_checkpoint(ckpt_path, state)
    else:
        state, step_no = restore_latest(state_dir, state)
    if state is None:
        raise SystemExit(f"no checkpoint in {state_dir}")
    eval_step = jax.jit(eval_step)

    dataset, is_kitti = build_dataset(args, fused_extra)

    def collate(samples):
        if fused_extra:
            from df3d.data.images import finalize_camera_sample

            samples = [
                finalize_camera_sample(s, fused_extra[1])
                if "image" in s and "images" not in s else s
                for s in samples
            ]
        batch = make_batch(
            samples, args.max_points, 500, cfg.num_point_features)
        if fused_extra:
            batch["images"] = np.stack([s["images"] for s in samples])
            batch["proj"] = np.stack([s["proj"] for s in samples])
            if fused_extra[0] == 1:  # single-cam models take (B, H, W, 3)
                batch["images"] = batch["images"][:, 0]
                batch["proj"] = batch["proj"][:, 0]
        return batch, samples

    loader = PrefetchLoader(
        dataset, args.batch_size, shuffle=False, drop_last=False,
        collate=collate,
    )

    if is_kitti:
        metrics = _eval_kitti_loop(
            args, cfg, state, eval_step, loader, dataset, family)
    else:
        metrics = _eval_nusc_loop(args, cfg, state, eval_step, loader)
    metrics["step"] = step_no
    print(json.dumps(
        {k: v for k, v in metrics.items()
         if isinstance(v, (int, float, str))} |
        {"preset": args.preset}, default=float))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(metrics, f, indent=2, default=float)
    return step_no


def _eval_nusc_loop(args, cfg, state, eval_step, loader):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from df3d.data.nuscenes import NUSC_CLASSES
    from df3d.data.nuscenes_eval import evaluate_nuscenes

    gt_frames, det_frames = [], []
    for batch, samples in loader:
        arrays = {k: jnp.asarray(v) for k, v in batch.items()}
        out = eval_step(state, arrays)
        out = jax.tree_util.tree_map(np.asarray, out)
        for i in range(out["boxes"].shape[0]):
            v = out["valid"][i]
            det_frames.append({
                "boxes": out["boxes"][i][v],
                "scores": out["scores"][i][v],
                "names": np.asarray(NUSC_CLASSES)[out["labels"][i][v]],
            })
            gv = batch["gt_valid"][i]
            gt_frames.append({
                "boxes": batch["gt_boxes"][i][gv],
                "names": np.asarray(NUSC_CLASSES)[batch["gt_classes"][i][gv]],
            })
    m = evaluate_nuscenes(gt_frames, det_frames, NUSC_CLASSES)
    return {"mAP": m["mAP"], "NDS": m["NDS"], "detail": m}


def _eval_kitti_loop(args, cfg, state, eval_step, loader, dataset, family):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from df3d.data.kitti import (
        camera_box_to_lidar, lidar_boxes_to_kitti_annos, recall_counts,
    )
    from df3d.data.kitti_eval import evaluate_kitti

    class_names = tuple(dataset.class_names)
    gt_annos, det_annos = [], []
    recall = {}
    for batch, samples in loader:
        arrays = {k: jnp.asarray(v) for k, v in batch.items()}
        out = eval_step(state, arrays)
        out = jax.tree_util.tree_map(np.asarray, out)
        for i, s in enumerate(samples):
            v = out["valid"][i]
            det = lidar_boxes_to_kitti_annos(
                out["boxes"][i][v][:, :7], out["scores"][i][v],
                out["labels"][i][v], s["calib"], s["image_shape"],
                class_names,
            )
            det_annos.append(det)

            # gt annos straight from the dataset's raw KITTI fields, plus
            # lidar-frame boxes for the 3d/bev overlap metrics
            raw = s.get("annos_raw", {})
            names = np.asarray(raw.get("name", np.zeros((0,), "<U32")))
            cam = (
                np.concatenate(
                    [raw["location"], raw["dimensions"],
                     raw["rotation_y"][..., None]], axis=1)
                if len(names) else np.zeros((0, 7), np.float32)
            )
            gt_annos.append({
                "name": names,
                "bbox": np.asarray(raw.get("bbox", np.zeros((0, 4)))),
                "occluded": np.asarray(
                    raw.get("occluded", np.zeros(len(names)))),
                "truncated": np.asarray(
                    raw.get("truncated", np.zeros(len(names)))),
                "alpha": np.asarray(raw.get("alpha", np.zeros(len(names)))),
                "boxes_lidar": camera_box_to_lidar(cam, s["calib"])
                if len(names) else np.zeros((0, 7), np.float32),
            })

            # recall records (pcdet generate_recall_record)
            gt_lidar = s.get("gt_boxes", np.zeros((0, 7), np.float32))
            stages = {"final": out["boxes"][i][v][:, :7]}
            if "rois" in out:
                stages["roi"] = out["rois"][i][out["roi_mask"][i]]
            for stage, boxes in stages.items():
                rc = recall_counts(boxes, gt_lidar)
                for k2, v2 in rc.items():
                    key = k2 if k2 == "gt" and stage == "final" else (
                        None if k2 == "gt" else f"{stage}_{k2}")
                    if key:
                        recall[key] = recall.get(key, 0) + v2

    res = evaluate_kitti(
        gt_annos, det_annos, classes=class_names,
        metrics=("3d", "bev", "bbox"), compute_aos=True,
    )
    flat = {}
    for cls, per in res.items():
        for metric, aps in per.items():
            for d, name in enumerate(("easy", "moderate", "hard")):
                flat[f"{cls}_{metric}_{name}"] = aps[d]
    ngt = max(recall.get("gt", 0), 1)
    for k, v in recall.items():
        if k != "gt":
            flat[k] = v / ngt
    flat["detail"] = res
    return flat


def main():
    args = parse_args()

    from df3d.config import apply_preset_overrides, get_preset
    from df3d.serving import apply_profile

    apply_profile(args.serving_profile)
    preset = get_preset(args.preset)
    if args.overrides:
        preset = apply_preset_overrides(preset, args.overrides)
    ckpt_dir = pathlib.Path(args.ckpt)
    last_step = -1
    waited = 0.0
    while True:
        try:
            step = evaluate_once(args, preset, ckpt_dir)
            if step == last_step and not args.watch:
                break
            last_step = step
        except SystemExit:
            pass
        if not args.watch:
            break
        time.sleep(60)
        waited += 1
        if waited > args.max_waiting_mins:
            break


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""df3d training CLI.

Counterpart of the three reference entry points (VoxelRCNN/tools/train.py,
CenterPoint/tools/train.py, TransFusion/tools/train.py) behind one unified
interface. Drives ALL preset families: CenterPoint / TransFusion-L /
Voxel R-CNN LiDAR-only AND the fused 3D-DF variants (dict presets with an
'actr' entry build CenterPoint3DDF / TransFusion3DDF / VoxelRCNN3DDF).

  python tools/train.py --preset centerpoint_nusc --data-root /data/nuscenes \
      --info-path infos_train.pkl --work-dir work_dirs/cp --epochs 20
  python tools/train.py --preset transfusion_3ddf_nusc --synthetic \
      --steps-per-epoch 2 --epochs 1            # fused smoke run

Multi-host: launch one process per host with jax.distributed env vars; the
batch shards over all devices automatically.
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", required=True)
    p.add_argument("--data-root", default=None)
    p.add_argument("--info-path", default=None)
    p.add_argument("--work-dir", default="work_dirs/default")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--max-points", type=int, default=260_000)
    p.add_argument("--max-gt", type=int, default=500)
    p.add_argument("--synthetic", action="store_true",
                   help="train on random data (smoke runs without datasets)")
    p.add_argument("--synthetic-points", type=int, default=20_000)
    p.add_argument("--image-shape", type=int, nargs=2, default=None,
                   help="fused presets: camera image (H, W)")
    p.add_argument("--steps-per-epoch", type=int, default=100)
    p.add_argument("--set", nargs="*", default=[], dest="overrides")
    p.add_argument("--cbgs", action="store_true",
                   help="class-balanced resampling (mmdet3d CBGSDataset); "
                        "duplicate set is redrawn every epoch")
    p.add_argument("--aux-loss", action="store_true",
                   help="fused presets: add the aux image-FG seg + "
                        "voxel/camera consistency losses (ref aux_seg_loss)")
    p.add_argument("--eval-after", type=int, default=0,
                   help="after training, evaluate the last N checkpoints "
                        "through tools/test.py (pcdet train.py:179-195 "
                        "post-train repeat_eval_ckpt workflow)")
    p.add_argument("--val-info-path", default=None,
                   help="info pkl for the post-train eval (defaults to "
                        "--info-path)")
    p.add_argument("--platform", default=None, choices=("cpu", "tpu"),
                   help="override the jax backend (e.g. cpu smoke runs "
                        "when no TPU is reachable)")
    return p.parse_args()


def make_synthetic_dataset(num_features, n=64, num_classes=10,
                           num_points=20_000, num_cams=0, image_shape=None):
    import numpy as np

    class Synth:
        class_names = tuple(str(i) for i in range(num_classes))

        def __len__(self):
            return n

        def __getitem__(self, i):
            rng = np.random.RandomState(i)
            pts = np.concatenate(
                [rng.uniform(-50, 50, (num_points, 2)),
                 rng.uniform(-4, 2, (num_points, 1)),
                 rng.uniform(0, 1, (num_points, num_features - 3))], axis=-1,
            ).astype(np.float32)
            m = rng.randint(1, 20)
            boxes = np.concatenate(
                [rng.uniform(-50, 50, (m, 2)), rng.uniform(-2, 0, (m, 1)),
                 rng.uniform(1, 5, (m, 3)), rng.uniform(-3, 3, (m, 1)),
                 rng.uniform(-2, 2, (m, 2))], axis=-1,
            ).astype(np.float32)
            out = {
                "points": pts, "gt_boxes": boxes,
                "gt_classes": rng.randint(0, num_classes, m).astype(np.int32),
            }
            if num_cams:
                h, w = image_shape
                out["images"] = rng.rand(num_cams, h, w, 3).astype(np.float32)
                # plausible pinhole-ish projections
                out["proj"] = np.tile(
                    np.array([[w, -w, 0, w * 2.0], [0, -h / 3, -w, h * 2.0],
                              [1, 0, 0, 0]], np.float32),
                    (num_cams, 1, 1),
                )
            return out

    return Synth()


def build_model_and_step(args, preset):
    """-> (state, train_step, lidar_cfg, extra_batch_keys).

    Model/template construction is shared with tools/test.py via
    df3d.models.build.build_detector so the two CLIs can never produce
    checkpoint-incompatible templates."""
    import jax

    from df3d.models.build import build_detector
    from df3d.train.schedules import adam_onecycle
    from df3d.train.trainer import (
        make_centerpoint_train_step, make_fused_train_step,
        make_transfusion_train_step, make_voxelrcnn_train_step,
    )

    total_steps = max(args.epochs * args.steps_per_epoch, 1)
    tx = adam_onecycle(args.lr, total_steps)
    aux = getattr(args, "aux_loss", False)
    built = build_detector(
        preset, tx, image_shape=args.image_shape, with_aux_seg=aux,
        example_points=min(args.max_points, 4096),
    )
    lidar_cfg = built.lidar_cfg

    def rng_wrapped(base, squeeze_cams=False):
        # uniform (state, batch) signature: fold the rng from the step count
        def step(state, batch):
            if squeeze_cams and batch["images"].ndim == 5:
                batch = dict(batch, images=batch["images"][:, 0],
                             proj=batch["proj"][:, 0])
            return base(
                state, batch,
                jax.random.fold_in(jax.random.PRNGKey(7), state.step))
        return step

    if built.family == "voxelrcnn":
        base = make_voxelrcnn_train_step(
            built.model, built.head, lidar_cfg, fused=built.fused,
            aux=aux and built.fused, image_hw=built.image_shape,
        )
        step = rng_wrapped(
            base, squeeze_cams=built.fused and built.num_cams == 1)
        extra = (built.num_cams, built.image_shape) if built.fused else None
        return built.state, step, lidar_cfg, extra

    if built.fused:
        step = make_fused_train_step(
            built.model, lidar_cfg, aux=aux, image_hw=built.image_shape)
        return built.state, step, lidar_cfg, (built.num_cams,
                                              built.image_shape)
    if built.family == "centerpoint":
        step = make_centerpoint_train_step(built.model, lidar_cfg)
    else:  # transfusion
        step = make_transfusion_train_step(built.model, lidar_cfg)
    return built.state, step, lidar_cfg, None


def main():
    args = parse_args()

    import jax

    if args.platform:
        # must precede any backend init (the axon sitecustomize registers a
        # remote TPU plugin; env vars alone don't stick — see CLAUDE.md)
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from df3d.config import apply_preset_overrides, get_preset
    from df3d.data.pipeline import PrefetchLoader, make_batch
    from df3d.parallel.mesh import batch_sharding, make_mesh, replicated
    from df3d.train.loop import Runner

    preset = get_preset(args.preset)
    if args.overrides:
        preset = apply_preset_overrides(preset, args.overrides)
    state, train_step, lidar_cfg, fused_extra = build_model_and_step(
        args, preset
    )

    if args.synthetic:
        dataset = make_synthetic_dataset(
            lidar_cfg.num_point_features, n=args.steps_per_epoch * args.batch_size,
            num_points=args.synthetic_points,
            num_cams=fused_extra[0] if fused_extra else 0,
            image_shape=fused_extra[1] if fused_extra else None,
        )
        max_points = args.synthetic_points
    elif args.preset.endswith("_kitti"):
        from df3d.data.kitti import KittiDataset

        dataset = KittiDataset(
            args.data_root, args.info_path,
            load_images=bool(fused_extra),
            image_shape=fused_extra[1] if fused_extra else (384, 1280),
        )
        max_points = args.max_points
    else:
        from df3d.data.nuscenes import NuScenesDataset

        dataset = NuScenesDataset(
            args.data_root, args.info_path,
            load_images=bool(fused_extra),
            image_shape=fused_extra[1] if fused_extra else (448, 800),
        )
        if args.cbgs:
            from df3d.data.nuscenes import CBGSWrapper

            dataset = CBGSWrapper(dataset)
        max_points = args.max_points

    # gt padding must not exceed the model's target-assignment capacity
    max_gt = min(args.max_gt, getattr(lidar_cfg, "max_objs", args.max_gt))

    def collate(samples):
        if fused_extra:
            from df3d.data.images import finalize_camera_sample

            # KITTI emits raw 'image' (paste-augmentable); finalize to the
            # static fused layout here, post-augmentation
            samples = [
                finalize_camera_sample(s, fused_extra[1])
                if "image" in s and "images" not in s else s
                for s in samples
            ]
        batch = make_batch(
            samples, max_points, max_gt, lidar_cfg.num_point_features
        )
        if fused_extra:
            import numpy as np

            batch["images"] = np.stack([s["images"] for s in samples])
            batch["proj"] = np.stack([s["proj"] for s in samples])
        return batch

    loader = PrefetchLoader(dataset, args.batch_size, collate=collate)

    mesh = make_mesh()
    data_sh = batch_sharding(mesh)
    repl = replicated(mesh)
    state = jax.device_put(state, repl)
    step = jax.jit(
        train_step, in_shardings=(repl, data_sh), out_shardings=(repl, repl),
    )

    def sharded_iter():
        for batch in loader:
            yield jax.tree_util.tree_map(
                lambda x: jax.device_put(jnp.asarray(x), data_sh), batch
            )

    runner = Runner(step, state, args.work_dir, args.epochs)
    runner.run(sharded_iter)

    if args.eval_after > 0 and not args.synthetic:
        evaluate_last_checkpoints(args, preset)


def evaluate_last_checkpoints(args, preset):
    """Post-train evaluation of the newest N checkpoints (the reference
    workflow: pcdet tools/train.py:179-195 launches repeat_eval_ckpt over
    the last num_epochs_to_eval checkpoints after training finishes).
    Writes work_dir/eval/step_N.json per checkpoint via the real eval CLI."""
    import importlib.util
    import json
    import pathlib

    from df3d.train.checkpoint import list_checkpoints

    spec = importlib.util.spec_from_file_location(
        "df3d_test_cli", pathlib.Path(__file__).resolve().parent / "test.py")
    test_cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(test_cli)

    ckpt_dir = pathlib.Path(args.work_dir) / "ckpt"
    eval_dir = pathlib.Path(args.work_dir) / "eval"
    eval_dir.mkdir(parents=True, exist_ok=True)
    ckpts = list_checkpoints(ckpt_dir)[-args.eval_after:]
    if not ckpts:
        print("eval-after: no checkpoints found", flush=True)
        return

    class _NS:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    for step, path in ckpts:
        out = eval_dir / f"step_{step}.json"
        eval_args = _NS(
            preset=args.preset, data_root=args.data_root,
            info_path=args.val_info_path or args.info_path,
            ckpt=str(ckpt_dir), batch_size=1, max_points=args.max_points,
            image_shape=args.image_shape, out=str(out), tta=None,
            overrides=args.overrides, watch=False, max_waiting_mins=0,
            # the restore template must match the trained param tree: a
            # --aux-loss run's checkpoints carry aux_seg leaves
            aux_loss=getattr(args, "aux_loss", False),
        )
        test_cli.evaluate_once(eval_args, preset, ckpt_dir, ckpt_path=path)
        try:
            metrics = json.loads(out.read_text())
            print(f"eval-after step {step}: "
                  + json.dumps(metrics)[:400], flush=True)
        except Exception:
            pass


if __name__ == "__main__":
    main()

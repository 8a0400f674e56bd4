#!/usr/bin/env python
"""df3d training CLI.

Counterpart of the three reference entry points (VoxelRCNN/tools/train.py,
CenterPoint/tools/train.py, TransFusion/tools/train.py) behind one unified
interface:

  python tools/train.py --preset centerpoint_nusc --data-root /data/nuscenes \
      --info-path infos_train.pkl --work-dir work_dirs/cp --epochs 20 \
      --batch-size 4 --set head.nms_thresh=0.2

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
    p.add_argument("--steps-per-epoch", type=int, default=100)
    p.add_argument("--set", nargs="*", default=[], dest="overrides")
    return p.parse_args()


def make_synthetic_dataset(num_features, n=64, num_classes=10):
    import numpy as np

    class Synth:
        class_names = tuple(str(i) for i in range(num_classes))

        def __len__(self):
            return n

        def __getitem__(self, i):
            rng = np.random.RandomState(i)
            pts = np.concatenate(
                [rng.uniform(-50, 50, (20000, 2)), rng.uniform(-4, 2, (20000, 1)),
                 rng.uniform(0, 1, (20000, num_features - 3))], axis=-1,
            ).astype(np.float32)
            m = rng.randint(1, 20)
            boxes = np.concatenate(
                [rng.uniform(-50, 50, (m, 2)), rng.uniform(-2, 0, (m, 1)),
                 rng.uniform(1, 5, (m, 3)), rng.uniform(-3, 3, (m, 1)),
                 rng.uniform(-2, 2, (m, 2))], axis=-1,
            ).astype(np.float32)
            return {
                "points": pts, "gt_boxes": boxes,
                "gt_classes": rng.randint(0, num_classes, m).astype(np.int32),
            }

    return Synth()


def main():
    args = parse_args()

    import jax

    from df3d.config import get_preset
    from df3d.data.pipeline import PrefetchLoader, make_batch
    from df3d.models.detectors.centerpoint import CenterPointConfig
    from df3d.parallel.mesh import batch_sharding, make_mesh, replicated
    from df3d.train.loop import Runner
    from df3d.train.schedules import adam_onecycle
    from df3d.train.trainer import (
        create_centerpoint_state, make_centerpoint_train_step,
    )

    cfg = get_preset(args.preset)
    if not isinstance(cfg, CenterPointConfig):
        raise SystemExit(
            f"train CLI currently drives CenterPoint presets; got {args.preset}"
        )

    if args.synthetic:
        dataset = make_synthetic_dataset(cfg.num_point_features)
    else:
        from df3d.data.nuscenes import NuScenesDataset

        dataset = NuScenesDataset(args.data_root, args.info_path)

    loader = PrefetchLoader(
        dataset, args.batch_size,
        collate=lambda s: make_batch(
            s, args.max_points, args.max_gt, cfg.num_point_features
        ),
    )

    total_steps = args.epochs * (len(dataset) // args.batch_size or 1)
    tx = adam_onecycle(args.lr, total_steps)

    import jax.numpy as jnp
    import numpy as np

    example = jnp.zeros((1, args.max_points, cfg.num_point_features))
    model, state = create_centerpoint_state(
        cfg, jax.random.PRNGKey(0), tx, example
    )

    mesh = make_mesh()
    data_sh = batch_sharding(mesh)
    repl = replicated(mesh)
    state = jax.device_put(state, repl)
    step = jax.jit(
        make_centerpoint_train_step(model, cfg),
        in_shardings=(repl, data_sh), out_shardings=(repl, repl),
    )

    def sharded_iter():
        for batch in loader:
            yield jax.tree_util.tree_map(
                lambda x: jax.device_put(jnp.asarray(x), data_sh), batch
            )

    runner = Runner(step, state, args.work_dir, args.epochs)
    runner.run(sharded_iter)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""df3d evaluation CLI (counterpart of the reference tools/test.py /
dist_test.py / eval_utils.eval_one_epoch).

  python tools/test.py --preset centerpoint_nusc --data-root ... \
      --info-path infos_val.pkl --ckpt work_dirs/cp/ckpt [--watch]

--watch polls the checkpoint dir for new checkpoints (repeat_eval_ckpt).
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse
import json
import pathlib
import time


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", required=True)
    p.add_argument("--data-root", default=None)
    p.add_argument("--info-path", default=None)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--max-points", type=int, default=260_000)
    p.add_argument("--out", default=None)
    p.add_argument("--tta", choices=["double_flip"], default=None,
                   help="test-time augmentation (det3d double-flip)")
    p.add_argument("--watch", action="store_true")
    p.add_argument("--max-waiting-mins", type=int, default=30)
    return p.parse_args()


def evaluate_once(args, cfg, state_dir):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from df3d.data.nuscenes import NUSC_CLASSES, NuScenesDataset
    from df3d.data.nuscenes_eval import evaluate_nuscenes
    from df3d.data.pipeline import PrefetchLoader, make_batch
    from df3d.train.checkpoint import restore_latest
    from df3d.train.schedules import adam_onecycle
    from df3d.train.trainer import (
        create_centerpoint_state, make_centerpoint_eval_step,
    )

    dataset = NuScenesDataset(args.data_root, args.info_path)
    model, state = create_centerpoint_state(
        cfg, jax.random.PRNGKey(0), adam_onecycle(1e-3, 1),
        jnp.zeros((1, args.max_points, cfg.num_point_features)),
    )
    state, step = restore_latest(state_dir, state)
    if state is None:
        raise SystemExit(f"no checkpoint in {state_dir}")
    eval_step = jax.jit(make_centerpoint_eval_step(model, cfg, tta=args.tta))

    loader = PrefetchLoader(
        dataset, args.batch_size, shuffle=False, drop_last=False,
        collate=lambda s: make_batch(
            s, args.max_points, 500, cfg.num_point_features
        ),
    )
    gt_frames, det_frames = [], []
    for bi, batch in enumerate(loader):
        out = eval_step(state, {k: jnp.asarray(v) for k, v in batch.items()})
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
    metrics = evaluate_nuscenes(gt_frames, det_frames, NUSC_CLASSES)
    print(json.dumps({"step": step, "mAP": metrics["mAP"], "NDS": metrics["NDS"]}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(metrics, f, indent=2, default=float)
    return step


def main():
    args = parse_args()

    from df3d.config import get_preset

    cfg = get_preset(args.preset)
    ckpt_dir = pathlib.Path(args.ckpt)
    last_step = -1
    waited = 0.0
    while True:
        try:
            step = evaluate_once(args, cfg, ckpt_dir)
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

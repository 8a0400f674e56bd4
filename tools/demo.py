#!/usr/bin/env python
"""Single-frame inference demo (counterpart of VoxelRCNN/tools/demo.py).

  python tools/demo.py --preset centerpoint_tiny_smoke --bin points.bin \
      [--ckpt work_dirs/cp/ckpt]

Reads a .bin float32 point cloud, runs the detector, prints the detections.
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", required=True)
    p.add_argument("--bin", required=True)
    p.add_argument("--num-features", type=int, default=None)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--score-thresh", type=float, default=0.3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from df3d.config import get_preset
    from df3d.train.schedules import adam_onecycle
    from df3d.train.trainer import (
        create_centerpoint_state, make_centerpoint_eval_step,
    )

    cfg = get_preset(args.preset)
    nf = args.num_features or cfg.num_point_features
    pts = np.fromfile(args.bin, dtype=np.float32).reshape(-1, nf)
    if nf < cfg.num_point_features:
        pts = np.concatenate(
            [pts, np.zeros((len(pts), cfg.num_point_features - nf), np.float32)],
            axis=1,
        )
    print(f"loaded {len(pts)} points from {args.bin}")

    model, state = create_centerpoint_state(
        cfg, jax.random.PRNGKey(0), adam_onecycle(1e-3, 1),
        jnp.asarray(pts[None, : 300_000]),
    )
    if args.ckpt:
        from df3d.train.checkpoint import restore_latest

        state, step = restore_latest(args.ckpt, state)
        print(f"restored checkpoint step {step}")

    batch = {
        "points": jnp.asarray(pts[None]),
        "points_valid": jnp.ones((1, len(pts)), bool),
    }
    out = make_centerpoint_eval_step(model, cfg)(state, batch)
    boxes = np.asarray(out["boxes"][0])
    scores = np.asarray(out["scores"][0])
    labels = np.asarray(out["labels"][0])
    keep = np.asarray(out["valid"][0]) & (scores >= args.score_thresh)
    print(f"{keep.sum()} detections (score >= {args.score_thresh}):")
    for b, s, l in zip(boxes[keep], scores[keep], labels[keep]):
        print(f"  cls={l} score={s:.3f} box={np.round(b, 2).tolist()}")


if __name__ == "__main__":
    main()

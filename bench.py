"""Headline benchmark: CenterPoint (0.075 m voxel, nuScenes scale) end-to-end
inference frames/sec on one TPU chip — voxelize + sparse backbone + RPN +
CenterHead + decode + rotated NMS, all on device.

Baseline: the reference's published CenterPoint 0.075-voxel inference speed,
11 FPS on a TITAN RTX at batch 1 (reference CenterPoint/configs/nusc/
README.md:24-30; BASELINE.md). vs_baseline = our_fps / 11.

Prints exactly ONE JSON line.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from df3d.models.detectors.centerpoint import (
        CenterPoint, CenterPointConfig, centerpoint_predict,
    )
    from df3d.ops.voxelize import voxelize_batch

    cfg = CenterPointConfig(
        max_voxels=120_000,
        stage_caps=(120_000, 90_000, 55_000, 30_000),
    )

    num_points = 260_000  # ~10-sweep nuScenes lidar
    rng = np.random.RandomState(0)
    pts = np.concatenate(
        [
            rng.uniform(-54, 54, (1, num_points, 2)),
            rng.uniform(-5, 3, (1, num_points, 1)),
            rng.uniform(0, 1, (1, num_points, 2)),
        ],
        axis=-1,
    ).astype(np.float32)
    points = jnp.asarray(pts)
    valid = jnp.ones(points.shape[:2], bool)

    def voxelize(points, valid):
        return voxelize_batch(
            points, valid, cfg.voxel_size, cfg.pc_range, cfg.grid_size,
            cfg.max_voxels, cfg.max_points_per_voxel,
        )

    res = jax.jit(voxelize)(points, valid)
    model = CenterPoint(cfg)
    variables = jax.jit(
        lambda f, c: model.init(jax.random.PRNGKey(0), f, c, train=False)
    )(res.features, res.coords)

    @jax.jit
    def infer(variables, points, valid):
        res = voxelize(points, valid)
        preds, _ = model.apply(variables, res.features, res.coords, train=False)
        return centerpoint_predict(cfg, preds)

    def force(out):
        # fetch a scalar to the host: block_until_ready alone does not
        # guarantee execution completed through the remote-TPU relay
        return float(out["scores"].sum())

    # compile + warmup
    force(infer(variables, points, valid))

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        force(infer(variables, points, valid))
    dt = time.perf_counter() - t0
    fps = iters / dt

    print(json.dumps({
        "metric": "centerpoint_0075voxel_infer_fps_bs1",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 11.0, 3),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # never leave the driver without a JSON line
        print(json.dumps({
            "metric": "centerpoint_0075voxel_infer_fps_bs1",
            "value": 0.0,
            "unit": "frames/sec",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:400],
        }))
        sys.exit(0)

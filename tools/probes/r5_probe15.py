"""Round-5 probe 15: fused TransFusion-3DDF TRAIN step on-chip (closes r3
probe 13, which could never run: axon_pjrt rejects host callbacks, fixed in
r4 by routing hungarian_match to the on-device auction assigner on axon).
Full-scale fused config (6 cams 448x800, R50+FPN frozen, realistic lidar),
bs1 — with the r5 symmetric gather backward on the LiDAR path.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

CAPS = (102_400, 73_728, 27_648, 10_240)


def main():
    import jax
    import jax.numpy as jnp

    from df3d.models.build import build_detector
    from df3d.train.schedules import adam_onecycle
    from df3d.train.trainer import make_fused_train_step

    cache_dir = str(pathlib.Path(__file__).resolve().parents[2] / ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from df3d.config import get_preset
    from df3d.utils.synth import make_raycast_frame

    preset = get_preset("transfusion_3ddf_nusc")
    preset["lidar"] = __import__("dataclasses").replace(
        preset["lidar"], max_voxels=CAPS[0], stage_caps=CAPS)

    rng = np.random.RandomState(0)
    pts = make_raycast_frame(rng, 260_000)
    m = 64
    batch = {
        "points": jnp.asarray(pts[None]),
        "points_valid": jnp.ones((1, len(pts)), bool),
        "images": jnp.asarray(
            rng.rand(1, 6, 448, 800, 3).astype(np.float32)),
        "proj": jnp.asarray(np.tile(np.array(
            [[1266.0, 0.0, 400.0, 0.2],
             [0.0, 1266.0, 224.0, 0.1],
             [0.0, 0.0, 1.0, 0.0]], np.float32), (1, 6, 1, 1))),
        "gt_boxes": jnp.asarray(np.concatenate(
            [rng.uniform(-50, 50, (1, m, 2)),
             rng.uniform(-2, 0, (1, m, 1)),
             rng.uniform(1, 5, (1, m, 3)),
             rng.uniform(-3, 3, (1, m, 1)),
             rng.uniform(-2, 2, (1, m, 2))], -1).astype(np.float32)),
        "gt_classes": jnp.asarray(
            rng.randint(0, 10, (1, m)).astype(np.int32)),
        "gt_valid": jnp.ones((1, m), bool),
    }

    t0 = time.perf_counter()
    built = build_detector(preset, adam_onecycle(1e-3, 100),
                           example_points=4096)
    print(f"build {time.perf_counter()-t0:.0f}s", flush=True)
    step = jax.jit(make_fused_train_step(built.model, built.lidar_cfg))
    t0 = time.perf_counter()
    state, logs = step(built.state, batch)
    loss0 = float(logs["loss"])
    print(f"compile+first {time.perf_counter()-t0:.0f}s loss {loss0:.3f}",
          flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        state, logs = step(state, batch)
        float(logs["loss"])
        best = min(best, time.perf_counter() - t0)
    print(f"fused TransFusion-3DDF train bs1: {best*1e3:.0f} ms/step",
          flush=True)


if __name__ == "__main__":
    main()

"""Reproduce probe-16's KeyError 'rcnn_cls' at tiny scale on CPU.

Probe 16 (r3) failed with KeyError 'rcnn_cls' for BOTH voxel_rcnn presets
before any timing ran. Nothing in df3d looks up that key, so the failure is
structural in the build_detector -> make_voxelrcnn_eval_step path the probe
exercises (full traceback was lost with /tmp). This repro runs the exact
same call sequence at fixture scale on CPU so the real traceback surfaces
in seconds instead of a 5-minute remote compile.
"""

import pathlib
import sys
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

TINY = [
    "pc_range=[0.0, -16.0, -2.4, 32.0, 16.0, 2.4]",
    "voxel_size=[0.5, 0.5, 0.2]",
    "grid_size=[24, 64, 64]",
    "max_voxels=2048",
    "stage_caps=[2048, 1024, 512, 256]",
    "train_pre_nms=128", "train_post_nms=32",
    "test_pre_nms=128", "test_post_nms=16",
    "final_max_boxes=16",
    "rcnn.grid_size=4",
    "rcnn.max_local=32",
    "rcnn.roi_per_image=16",
]


def main():
    import optax

    from df3d.config import apply_preset_overrides, get_preset
    from df3d.models.build import build_detector
    from df3d.train.trainer import make_voxelrcnn_eval_step

    rng = np.random.RandomState(0)
    pts = np.concatenate(
        [rng.uniform(0, 30, (1, 2000, 1)),
         rng.uniform(-14, 14, (1, 2000, 1)),
         rng.uniform(-2, 1, (1, 2000, 1)),
         rng.uniform(0, 1, (1, 2000, 1))], -1).astype(np.float32)
    points = jnp.asarray(pts)
    valid = jnp.ones(points.shape[:2], bool)
    images = jnp.asarray(rng.rand(1, 96, 320, 3).astype(np.float32))
    proj = jnp.asarray(np.array(
        [[150.0, -180.0, 0.0, 160.0],
         [45.0, 0.0, -180.0, 45.0],
         [1.0, 0.0, 0.0, 0.0]], np.float32))[None]

    tx = optax.adam(1e-4)
    for preset_name, over in [
        ("voxel_rcnn_car_kitti", TINY),
        ("voxel_rcnn_3ddf_kitti",
         ["lidar." + o for o in TINY] + ["image_shape=[96, 320]"]),
    ]:
        print(f"=== {preset_name} ===", flush=True)
        try:
            preset = apply_preset_overrides(get_preset(preset_name), over)
            built = build_detector(preset, tx, example_points=2000)
            step = jax.jit(make_voxelrcnn_eval_step(
                built.model, built.head, built.lidar_cfg, fused=built.fused))
            batch = {"points": points, "points_valid": valid}
            if built.fused:
                batch["images"] = images
                batch["proj"] = proj
            out = step(built.state, batch)
            print("OK  scores sum", float(out["scores"].sum()),
                  "boxes", out["boxes"].shape, flush=True)
        except Exception:
            traceback.print_exc()


if __name__ == "__main__":
    main()

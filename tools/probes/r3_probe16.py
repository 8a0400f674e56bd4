"""Round-3 probe 16: KITTI VoxelRCNN-3DDF e2e inference timing, full scale.

The last unmeasured fused family (CLAUDE.md r3 list): Voxel R-CNN +
MVX@1 + ACTRv2-hybrid@8 + IFAT at the KITTI operating point — 0.05 voxel
(40,1600,1408) grid, 16k voxels, one 384x1280 camera, DeepLabV3 branch
(reference voxel_rcnn_car_mm_mvx+actrv2_hybrid_ifat.yaml). Also times the
LiDAR-only Voxel R-CNN for the fusion overhead split.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

ITERS = 4
_f0 = jax.jit(lambda x: x + 1.0)
float(_f0(jnp.float32(1)))
RTT = 1e9
for _ in range(5):
    t0 = time.time()
    float(_f0(jnp.float32(1)))
    RTT = min(RTT, time.time() - t0)
print(f"RTT = {RTT*1000:.1f} ms", flush=True)


def timed(name, fn, *args, iters=ITERS):
    try:
        f = jax.jit(fn)
        t0 = time.time()
        s = float(f(*args))
        c = time.time() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            s = float(f(*args))
            best = min(best, time.time() - t0)
        per = (best - RTT) / iters * 1000.0
        print(f"{name:44s} {per:8.2f} ms/iter  (compile {c:.0f}s, "
              f"sink {s:.3g})", flush=True)
        return per
    except Exception as e:
        print(f"{name:44s} FAIL {str(e).splitlines()[0][:110]}", flush=True)
        return None


def perturb(s):
    return jnp.where(s > jnp.float32(1e30), 1, 0).astype(jnp.int32)


def main():
    import optax

    from df3d.config.presets import get_preset
    from df3d.models.build import build_detector
    from df3d.train.trainer import make_voxelrcnn_eval_step

    rng = np.random.RandomState(0)
    n_pts = 20_000  # typical KITTI FOV-cropped cloud
    pts = np.concatenate(
        [rng.uniform(0, 70, (1, n_pts, 1)),
         rng.uniform(-40, 40, (1, n_pts, 1)),
         rng.uniform(-3, 1, (1, n_pts, 1)),
         rng.uniform(0, 1, (1, n_pts, 1))], -1).astype(np.float32)
    points = jnp.asarray(pts)
    valid = jnp.ones(points.shape[:2], bool)
    images = jnp.asarray(rng.rand(1, 384, 1280, 3).astype(np.float32))
    # KITTI P2-like lidar->image projection
    proj = jnp.asarray(np.array(
        [[600.0, -720.0, 0.0, 640.0],
         [180.0, 0.0, -720.0, 180.0],
         [1.0, 0.0, 0.0, 0.0]], np.float32))[None]

    tx = optax.adam(1e-4)
    for preset_name, label in [
        ("voxel_rcnn_car_kitti", "VoxelRCNN lidar-only 2-stage eval"),
        ("voxel_rcnn_3ddf_kitti", "VoxelRCNN-3DDF fused 2-stage eval"),
    ]:
        built = build_detector(get_preset(preset_name), tx)
        step = make_voxelrcnn_eval_step(
            built.model, built.head, built.lidar_cfg, fused=built.fused)

        def chain(state, points, valid, step=step, fused=built.fused):
            def body(i, carry):
                p = points + perturb(carry).astype(points.dtype)
                batch = {"points": p, "points_valid": valid}
                if fused:
                    batch["images"] = images
                    batch["proj"] = proj
                out = step(state, batch)
                return jnp.float32(out["scores"].sum(dtype=jnp.float32))
            return lax.fori_loop(0, ITERS, body, jnp.float32(0))

        timed(label, chain, built.state, points, valid)


if __name__ == "__main__":
    main()

"""Round-3 probe 13: FUSED-model train-step timing at full scale
(VERDICT r2 weak #2 — fwd was probed in r2 [284 ms], bwd never).

TransFusion-3DDF, 6 cams 448x800 R50+FPN ACTRv2-hybrid, 0.075 voxel,
260k points, bs1: one optax train step (value_and_grad + update + BN
stats), timed as 2 chained steps on-device.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

import jax
import jax.numpy as jnp

_f0 = jax.jit(lambda x: x + 1.0)
float(_f0(jnp.float32(1)))
RTT = 1e9
for _ in range(5):
    t0 = time.time()
    float(_f0(jnp.float32(1)))
    RTT = min(RTT, time.time() - t0)
print(f"RTT = {RTT*1000:.1f} ms", flush=True)


def main():
    from df3d.models.detectors.fused import FusedConfig, TransFusion3DDF
    from df3d.models.detectors.transfusion import TransFusionConfig
    from df3d.models.fusion.actr import ACTRConfig
    from df3d.ops.voxelize import voxelize_batch
    from df3d.train.schedules import adam_onecycle
    from df3d.train.trainer import TrainState, make_fused_train_step

    from bench import REALISTIC_STAGE_CAPS

    rng = np.random.RandomState(0)
    # round 4: realistic fitted caps (matches the bench fused section); the
    # r3 attempt at saturated caps never ran — axon_pjrt cannot host-call,
    # and hungarian_match now auto-resolves to the in-graph auction there
    tcfg = TransFusionConfig(
        max_voxels=REALISTIC_STAGE_CAPS[0], stage_caps=REALISTIC_STAGE_CAPS)
    fcfg = FusedConfig(
        image_shape=(448, 800), image_branch="resnet_fpn", num_cams=6,
        actr=ACTRConfig(n_levels=3, model_name="ACTRv2", hybrid=True),
    )

    from df3d.utils.synth import make_raycast_frame

    num_points = 260_000
    pts = make_raycast_frame(np.random.RandomState(100), num_points)[None]
    images = jnp.asarray(rng.rand(1, 6, 448, 800, 3).astype(np.float32))
    proj = np.zeros((1, 6, 3, 4), np.float32)
    proj[:, :] = np.array([[1266.0, 0.0, 400.0, 0.2],
                           [0.0, 1266.0, 224.0, 0.1],
                           [0.0, 0.0, 1.0, 0.0]], np.float32)
    proj = jnp.asarray(proj)
    m = 64
    batch = {
        "points": jnp.asarray(pts),
        "points_valid": jnp.ones((1, num_points), bool),
        "images": images,
        "proj": proj,
        "gt_boxes": jnp.asarray(np.concatenate(
            [rng.uniform(-50, 50, (1, m, 2)),
             rng.uniform(-2, 0, (1, m, 1)),
             rng.uniform(1, 5, (1, m, 3)),
             rng.uniform(-3, 3, (1, m, 1)),
             rng.uniform(-2, 2, (1, m, 2))], -1).astype(np.float32)),
        "gt_classes": jnp.asarray(rng.randint(0, 10, (1, m)).astype(np.int32)),
        "gt_valid": jnp.ones((1, m), bool),
    }

    tx = adam_onecycle(1e-3, 100)
    t0 = time.time()
    ex_pts = jnp.asarray(pts[:, :4096])
    res = voxelize_batch(
        ex_pts, jnp.ones(ex_pts.shape[:2], bool), tcfg.voxel_size,
        tcfg.pc_range, tcfg.grid_size, tcfg.max_voxels,
        tcfg.max_points_per_voxel)
    model = TransFusion3DDF(tcfg, fcfg)
    variables = model.init(
        jax.random.PRNGKey(0), res.features, res.coords, images, proj,
        train=False)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        batch_stats=variables["batch_stats"])
    step = jax.jit(make_fused_train_step(model, tcfg))
    state, logs = step(state, batch)
    print(f"compile+first step: {time.time()-t0:.0f}s "
          f"loss={float(logs['loss']):.3f}", flush=True)

    best = 1e9
    for _ in range(3):
        t0 = time.time()
        s2, l2 = step(state, batch)
        s2, l2 = step(s2, batch)
        float(l2["loss"])
        best = min(best, time.time() - t0)
    print(f"fused TransFusion-3DDF train step bs1: "
          f"{(best - RTT) / 2 * 1000:.0f} ms", flush=True)


if __name__ == "__main__":
    main()

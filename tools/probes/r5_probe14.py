"""Round-5 probe 14: train-step A/B of the symmetric-plan gather backward
(ops.sparse.SUBM_BWD_GATHER): autodiff transposes every subm conv gather
into a 7-13 ns/row scatter-add (~13M rows at stage 1 alone per step); the
custom vjp computes dx with the SAME plan reversed (2 ns/row gather) and
dW by re-gather. CenterPoint bs1 train step at bench-saturated config
(the bench train section's exact shapes).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from df3d.models.detectors.centerpoint import CenterPointConfig
    from df3d.ops import sparse as sp
    from df3d.train.schedules import adam_onecycle
    from df3d.train.trainer import (
        create_centerpoint_state, make_centerpoint_train_step,
    )

    cache_dir = str(pathlib.Path(__file__).resolve().parents[2] / ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    num_points = 260_000
    sat_caps = (120_000, 90_000, 55_000, 30_000)
    cfg = CenterPointConfig(max_voxels=sat_caps[0], stage_caps=sat_caps)
    rng = np.random.RandomState(0)
    pts = np.concatenate(
        [rng.uniform(-54, 54, (1, num_points, 2)),
         rng.uniform(-5, 3, (1, num_points, 1)),
         rng.uniform(0, 1, (1, num_points, 2))], -1).astype(np.float32)
    rng2 = np.random.RandomState(1)
    m = 64
    batch = {
        "points": jnp.asarray(pts),
        "points_valid": jnp.ones((1, num_points), bool),
        "gt_boxes": jnp.asarray(np.concatenate(
            [rng2.uniform(-50, 50, (1, m, 2)),
             rng2.uniform(-2, 0, (1, m, 1)),
             rng2.uniform(1, 5, (1, m, 3)),
             rng2.uniform(-3, 3, (1, m, 1)),
             rng2.uniform(-2, 2, (1, m, 2))], -1).astype(np.float32)),
        "gt_classes": jnp.asarray(
            rng2.randint(0, 10, (1, m)).astype(np.int32)),
        "gt_valid": jnp.ones((1, m), bool),
    }

    for flag in (False, True):
        sp.set_subm_bwd_gather(flag)
        tag = "gather-bwd" if flag else "autodiff(scatter)"
        tx = adam_onecycle(1e-3, 100)
        model, state = create_centerpoint_state(
            cfg, jax.random.PRNGKey(0), tx, batch["points"][:1, :4096])
        step = jax.jit(make_centerpoint_train_step(model, cfg))
        t0c = time.perf_counter()
        state, logs = step(state, batch)
        loss0 = float(logs["loss"])
        t1c = time.perf_counter()
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            state, logs = step(state, batch)
            float(logs["loss"])
            best = min(best, time.perf_counter() - t0)
        print(f"train bs1 [{tag}]: {best*1e3:.0f} ms/step "
              f"(compile {t1c-t0c:.0f}s, loss0 {loss0:.3f})", flush=True)
    sp.set_subm_bwd_gather(True)


if __name__ == "__main__":
    main()

"""Train-step factory: the TPU-native replacement for the reference's three
trainers (pcdet train_utils.train_one_epoch, det3d torchie Trainer, mmcv
Runner — SURVEY §2.7). One functional step: voxelize (device) -> forward ->
loss -> grads -> optax update, all inside a single jit; data parallelism
comes from sharding the batch leading dim over the mesh.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax.training import train_state

from df3d.models.detectors.centerpoint import (
    CenterPoint, CenterPointConfig, centerpoint_loss, centerpoint_predict,
)
from df3d.ops.voxelize import voxelize_batch


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def create_centerpoint_state(
    cfg: CenterPointConfig, rng: jax.Array, tx, example_points
) -> tuple[CenterPoint, TrainState]:
    model = CenterPoint(cfg)
    res = voxelize_batch(
        example_points, jnp.ones(example_points.shape[:2], bool),
        cfg.voxel_size, cfg.pc_range, cfg.grid_size, cfg.max_voxels,
        cfg.max_points_per_voxel,
    )
    variables = model.init(rng, res.features, res.coords, train=False)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        batch_stats=variables["batch_stats"],
    )
    return model, state


def make_centerpoint_train_step(model: CenterPoint, cfg: CenterPointConfig) -> Callable:
    """batch dict: points (B, P, F), points_valid (B, P), gt_boxes (B, M, 9),
    gt_classes (B, M), gt_valid (B, M)."""

    def train_step(state: TrainState, batch):
        res = voxelize_batch(
            batch["points"], batch["points_valid"], cfg.voxel_size,
            cfg.pc_range, cfg.grid_size, cfg.max_voxels,
            cfg.max_points_per_voxel,
        )

        def loss_fn(params):
            (preds, _), updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                res.features, res.coords, train=True, mutable=["batch_stats"],
            )
            total, logs = centerpoint_loss(
                cfg, preds, batch["gt_boxes"], batch["gt_classes"],
                batch["gt_valid"],
            )
            return total, (logs, updates)

        (_, (logs, updates)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(
            grads=grads, batch_stats=updates["batch_stats"]
        )
        return state, logs

    return train_step


def make_centerpoint_eval_step(model: CenterPoint, cfg: CenterPointConfig) -> Callable:
    def eval_step(state: TrainState, batch):
        res = voxelize_batch(
            batch["points"], batch["points_valid"], cfg.voxel_size,
            cfg.pc_range, cfg.grid_size, cfg.max_voxels,
            cfg.max_points_per_voxel,
        )
        preds, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            res.features, res.coords, train=False,
        )
        return centerpoint_predict(cfg, preds)

    return eval_step

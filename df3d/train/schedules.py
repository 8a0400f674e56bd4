"""LR / momentum schedules.

`one_cycle` mirrors the fastai-style OneCycle used by all three reference
trainers (VoxelRCNN/tools/train_utils/optimization/learning_schedules_fastai.py
OneCycle, det3d lr_updater one_cycle hook): warmup from lr_max/div_factor to
lr_max over pct_start, then cosine anneal to ~0, with momentum annealed
opposite (0.95 -> 0.85 -> 0.95).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def _cos_anneal(start, end, pct):
    return end + (start - end) / 2.0 * (jnp.cos(jnp.pi * pct) + 1.0)


def one_cycle_lr(lr_max: float, total_steps: int, div_factor: float = 10.0,
                 pct_start: float = 0.4, final_div: float = 1e4):
    warm = int(total_steps * pct_start)

    def sched(step):
        step = jnp.minimum(step, total_steps)
        up = _cos_anneal(lr_max / div_factor, lr_max, step / jnp.maximum(warm, 1))
        down = _cos_anneal(
            lr_max, lr_max / final_div,
            (step - warm) / jnp.maximum(total_steps - warm, 1),
        )
        return jnp.where(step < warm, up, down)

    return sched


def one_cycle_momentum(total_steps: int, moms=(0.95, 0.85), pct_start: float = 0.4):
    warm = int(total_steps * pct_start)

    def sched(step):
        step = jnp.minimum(step, total_steps)
        down = _cos_anneal(moms[0], moms[1], step / jnp.maximum(warm, 1))
        up = _cos_anneal(
            moms[1], moms[0], (step - warm) / jnp.maximum(total_steps - warm, 1)
        )
        return jnp.where(step < warm, down, up)

    return sched


def adam_onecycle(lr_max: float, total_steps: int, weight_decay: float = 0.01,
                  grad_clip: float = 10.0, div_factor: float = 10.0,
                  pct_start: float = 0.4):
    """pcdet adam_onecycle equivalent: AdamW with OneCycle lr + momentum and
    global-norm grad clipping (train_utils.py:53 clip_grad_norm_)."""
    lr = one_cycle_lr(lr_max, total_steps, div_factor, pct_start)
    mom = one_cycle_momentum(total_steps, pct_start=pct_start)
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.inject_hyperparams(
            lambda learning_rate, b1: optax.adamw(
                learning_rate, b1=b1, weight_decay=weight_decay
            )
        )(learning_rate=lr, b1=mom),
    )

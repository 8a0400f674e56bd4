"""Training loop with hooks: the df3d runner.

One loop replaces the three reference trainers (SURVEY §2.7): pcdet
train_utils.train_one_epoch, det3d torchie Trainer (hook registry), mmcv
EpochBasedRunner. Hook points mirror torchie's (before/after epoch,
after_iter) with priorities; built-in hooks cover LR logging, wall-clock
timing, text/JSONL logging, periodic checkpointing with max-keep pruning,
and newest-checkpoint auto-resume.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import pathlib
import time
from typing import Any, Callable, Iterable

import jax
import numpy as np

from .checkpoint import restore_latest, save_checkpoint


@dataclasses.dataclass(order=True)
class Hook:
    priority: int
    name: str = dataclasses.field(compare=False)
    before_epoch: Callable | None = dataclasses.field(default=None, compare=False)
    after_iter: Callable | None = dataclasses.field(default=None, compare=False)
    after_epoch: Callable | None = dataclasses.field(default=None, compare=False)


class Runner:
    def __init__(
        self,
        train_step: Callable,
        state,
        work_dir: str,
        max_epochs: int,
        log_interval: int = 50,
        ckpt_interval_epochs: int = 1,
        max_ckpt_keep: int = 5,
        logger: logging.Logger | None = None,
    ):
        self.train_step = train_step
        self.state = state
        self.work_dir = pathlib.Path(work_dir)
        self.work_dir.mkdir(parents=True, exist_ok=True)
        self.max_epochs = max_epochs
        self.log_interval = log_interval
        self.ckpt_interval = ckpt_interval_epochs
        self.max_ckpt_keep = max_ckpt_keep
        self.epoch = 0
        self.global_step = 0
        self.hooks: list[Hook] = []
        self.logger = logger or self._make_logger()
        self._jsonl = open(self.work_dir / "train_log.jsonl", "a")
        from df3d.utils.tb_writer import ScalarWriter

        self._tb = ScalarWriter(self.work_dir / "tensorboard")

    def _make_logger(self):
        logger = logging.getLogger("df3d")
        if not logger.handlers:
            logger.setLevel(logging.INFO)
            fh = logging.FileHandler(self.work_dir / "log_train.txt")
            sh = logging.StreamHandler()
            fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
            fh.setFormatter(fmt)
            sh.setFormatter(fmt)
            logger.addHandler(fh)
            logger.addHandler(sh)
        return logger

    def register_hook(self, hook: Hook):
        self.hooks.append(hook)
        self.hooks.sort()

    def _fire(self, point: str):
        for h in self.hooks:
            fn = getattr(h, point)
            if fn is not None:
                fn(self)

    def resume(self):
        state, step = restore_latest(self.work_dir / "ckpt", self.state)
        if state is not None:
            self.state = state
            self.global_step = step
            self.logger.info(f"auto-resumed from step {step}")

    def profile_steps(self, start: int, num: int = 5):
        """Capture a jax profiler trace for steps [start, start+num) into
        work_dir/profile (replaces the reference's ad-hoc iteration timers,
        SURVEY §5.1)."""
        self._profile_window = (start, start + num)

    _profile_window = None

    def _maybe_profile(self):
        if self._profile_window is None:
            return
        lo, hi = self._profile_window
        if self.global_step == lo:
            jax.profiler.start_trace(str(self.work_dir / "profile"))
        elif self.global_step == hi:
            jax.profiler.stop_trace()
            self.logger.info(f"profiler trace written to {self.work_dir}/profile")
            self._profile_window = None

    def run(self, data_iter_fn: Callable[[], Iterable[dict]]):
        self.resume()
        t_data = t_step = 0.0
        for self.epoch in range(self.epoch, self.max_epochs):
            self._fire("before_epoch")
            it = iter(data_iter_fn())
            while True:
                t0 = time.perf_counter()
                try:
                    batch = next(it)
                except StopIteration:
                    break
                t1 = time.perf_counter()
                self._maybe_profile()
                self.state, logs = self.train_step(self.state, batch)
                if self.global_step % self.log_interval == 0:
                    logs = {
                        k: float(np.asarray(v)) for k, v in logs.items()
                    }
                    jax.block_until_ready(self.state.params)
                    t2 = time.perf_counter()
                    t_data, t_step = t1 - t0, t2 - t1
                    msg = " ".join(f"{k}={v:.4f}" for k, v in logs.items())
                    self.logger.info(
                        f"epoch {self.epoch} step {self.global_step} {msg} "
                        f"(data {t_data*1e3:.0f}ms step {t_step*1e3:.0f}ms)"
                    )
                    self._jsonl.write(json.dumps(
                        {"epoch": self.epoch, "step": self.global_step, **logs}
                    ) + "\n")
                    self._jsonl.flush()
                    for k, v in logs.items():
                        self._tb.add_scalar(f"train/{k}", v, self.global_step)
                    self._tb.flush()
                self.global_step += 1
                self._fire("after_iter")
            if (self.epoch + 1) % self.ckpt_interval == 0:
                save_checkpoint(
                    self.work_dir / "ckpt", self.state, self.global_step,
                    self.max_ckpt_keep,
                )
            self._fire("after_epoch")
        return self.state

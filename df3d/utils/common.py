"""Common utilities (pcdet common_utils equivalents: create_logger,
set_random_seed; dist helpers live in df3d.parallel)."""

from __future__ import annotations

import logging
import random

import numpy as np


def create_logger(log_file=None, rank: int = 0, name: str = "df3d"):
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO if rank == 0 else logging.WARNING)
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    if not logger.handlers:
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    if log_file is not None and not any(
        isinstance(h, logging.FileHandler) for h in logger.handlers
    ):
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def set_random_seed(seed: int):
    """Seed host RNGs; device randomness in df3d is explicit jax.random keys
    derived from the seed by callers."""
    random.seed(seed)
    np.random.seed(seed)
    return seed

"""Device-mesh helpers: the TPU-native replacement for the reference's NCCL
DDP wrappers (SURVEY §2.6 — pcdet DistributedDataParallel, det3d torchie
parallel, mmcv MMDDP all collapse into one data-parallel mesh axis).

Gradient averaging = XLA all-reduce inserted by pjit from shardings (no
explicit NCCL calls); SyncBN falls out of global-batch reductions under jit
(see layers.MaskedBatchNorm). Multi-host: jax.distributed.initialize() once
per process, then the same code runs over ICI+DCN.
"""

from __future__ import annotations

from typing import Iterable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the mesh; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place every leaf with its leading dim sharded over the data axis."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)

"""Dual-query bidirectional gates fusing the LiDAR-query / image-query
streams each fusion encoder layer.

Equivalents of VoxelRCNN/pcdet/models/model_utils/attentions.py:216-311
(BiGate1D, BiGate1D_2, BiGateSum1D, BiGateSum1D_2). All are 1x1 projections
to a scalar sigmoid gate; the `_2` variants gate on the SUM of the streams,
the `Sum` variants add the gated other-stream instead of multiplying.
"""

from __future__ import annotations

import jax
from flax import linen as nn


class BiGate1D(nn.Module):
    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array):
        ga = nn.sigmoid(nn.Dense(1, name="a_gate")(a))  # from a, applied to b
        gb = nn.sigmoid(nn.Dense(1, name="b_gate")(b))
        return a * gb, b * ga


class BiGate1D_2(nn.Module):
    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array):
        fused = a + b
        ga = nn.sigmoid(nn.Dense(1, name="a_gate")(fused))
        gb = nn.sigmoid(nn.Dense(1, name="b_gate")(fused))
        return a * ga, b * gb


class BiGateSum1D(nn.Module):
    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array):
        ga = nn.sigmoid(nn.Dense(1, name="a_gate")(a))
        gb = nn.sigmoid(nn.Dense(1, name="b_gate")(b))
        return a + b * ga, b + a * gb


class BiGateSum1D_2(nn.Module):
    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array):
        fused = a + b
        ga = nn.sigmoid(nn.Dense(1, name="a_gate")(fused))
        gb = nn.sigmoid(nn.Dense(1, name="b_gate")(fused))
        return a + b * ga, b + a * gb


GATES = {
    "BiGate1D": BiGate1D,
    "BiGate1D_2": BiGate1D_2,
    "BiGateSum1D": BiGateSum1D,
    "BiGateSum1D_2": BiGateSum1D_2,
}

"""DLA (deep layer aggregation) image backbone.

Alternate image branch listed in the TransFusion fork
(TransFusion/mmdet3d/models/backbones/DLA.py, ~500 LoC torch): DLA-34
topology — basic residual blocks arranged in trees with aggregation nodes.
Returns the stride-4/8/16/32 stage maps for an FPN.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool, residual=None):
        if residual is None:
            residual = x
        h = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn2")(h)
        if residual.shape != h.shape:
            residual = nn.Conv(self.planes, (1, 1),
                               strides=self.stride, use_bias=False,
                               name="project")(residual)
            residual = nn.BatchNorm(use_running_average=not train,
                                    name="project_bn")(residual)
        return nn.relu(h + residual)


class AggNode(nn.Module):
    planes: int

    @nn.compact
    def __call__(self, xs, train: bool):
        h = jnp.concatenate(xs, axis=-1)
        h = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn")(h)
        return nn.relu(h)


class Tree(nn.Module):
    levels: int
    planes: int
    stride: int = 2

    @nn.compact
    def __call__(self, x, train: bool):
        if self.levels == 1:
            a = BasicBlock(self.planes, self.stride, name="block1")(x, train)
            b = BasicBlock(self.planes, 1, name="block2")(a, train)
            return AggNode(self.planes, name="agg")([a, b], train)
        a = Tree(self.levels - 1, self.planes, self.stride, name="sub1")(x, train)
        b = Tree(self.levels - 1, self.planes, 1, name="sub2")(a, train)
        return AggNode(self.planes, name="agg")([a, b], train)


class DLA(nn.Module):
    """DLA-34-ish: base + 4 tree stages (strides 4, 8, 16, 32)."""

    channels: Sequence[int] = (16, 32, 64, 128, 256, 512)
    tree_levels: Sequence[int] = (1, 2, 2, 1)

    @nn.compact
    def __call__(self, images, train: bool = False):
        h = nn.Conv(self.channels[0], (7, 7), padding=3, use_bias=False,
                    name="base")(images)
        h = nn.BatchNorm(use_running_average=not train, name="base_bn")(h)
        h = nn.relu(h)
        h = BasicBlock(self.channels[1], 2, name="level1")(h, train)
        outs = []
        for i, lv in enumerate(self.tree_levels):
            h = Tree(lv, self.channels[2 + i], 2, name=f"stage{i}")(h, train)
            outs.append(h)
        return outs

"""BEV 2D conv necks.

Behavioral equivalents of det3d RPN (CenterPoint/det3d/models/necks/rpn.py),
pcdet BaseBEVBackbone (VoxelRCNN/pcdet/models/backbones_2d/
base_bev_backbone.py) and mmdet3d SECOND+SECONDFPN — all three are the same
shape: downsample conv stacks + transposed-conv upsample branches, concat.
One module covers them via config. Channel-last (B, H, W, C).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBNReLU2d, DeconvBNReLU2d


class BEVBackbone(nn.Module):
    layer_nums: Sequence[int]          # convs per stage (after the stride conv)
    layer_strides: Sequence[int]
    num_filters: Sequence[int]
    upsample_strides: Sequence[int]
    num_upsample_filters: Sequence[int]

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        ups = []
        up_start = len(self.layer_nums) - len(self.upsample_strides)
        for i, n in enumerate(self.layer_nums):
            x = ConvBNReLU2d(
                self.num_filters[i], 3, self.layer_strides[i], name=f"block{i}_in"
            )(x, train)
            for j in range(n):
                x = ConvBNReLU2d(self.num_filters[i], 3, 1, name=f"block{i}_conv{j}")(
                    x, train
                )
            k = i - up_start
            if k >= 0:
                stride = self.upsample_strides[k]
                if stride > 1:
                    up = DeconvBNReLU2d(
                        self.num_upsample_filters[k], stride, name=f"deblock{k}"
                    )(x, train)
                else:  # stride 1 (or <1 in pcdet: a strided conv) -> 1x1-ish conv
                    up = ConvBNReLU2d(
                        self.num_upsample_filters[k], max(int(round(1 / stride)), 1),
                        max(int(round(1 / stride)), 1), name=f"deblock{k}",
                    )(x, train)
                ups.append(up)
        return jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]

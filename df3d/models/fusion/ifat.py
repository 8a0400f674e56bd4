"""IFAT — image-side gated attention.

Equivalent of VoxelRCNN/pcdet/models/model_utils/attention.py BasicGate
(:89-167) and the multi-camera variants in the CenterPoint copy: splat
multi-scale voxel features onto the image plane at each image-feature
resolution, run a small conv stack to a 1-channel sigmoid spatial gate, and
multiply the image features by the gate before they feed ACTR.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .projection import splat_to_image


class IFATGate(nn.Module):
    """One gate per image scale. num_conv-1 conv+BN+ReLU then conv -> 1ch."""

    num_scales: int
    num_conv: int = 2

    @nn.compact
    def __call__(
        self,
        img_feats: Sequence[jax.Array],    # per scale (B, H_s, W_s, C_s)
        voxel_feats: Sequence[jax.Array],  # per scale (B, N_s, C_s)
        uv_norms: Sequence[jax.Array],     # per scale (B, N_s, 2)
        masks: Sequence[jax.Array],        # per scale (B, N_s)
        train: bool = False,
    ) -> list[jax.Array]:
        assert len(img_feats) == self.num_scales
        out = []
        for s in range(self.num_scales):
            h, w = img_feats[s].shape[1:3]
            splat = splat_to_image(uv_norms[s], voxel_feats[s], masks[s], (h, w))
            g = splat
            for i in range(self.num_conv - 1):
                g = nn.Conv(
                    splat.shape[-1], (3, 3), padding=1, name=f"s{s}_conv{i}"
                )(g)
                g = nn.BatchNorm(
                    use_running_average=not train, momentum=0.99, epsilon=1e-3,
                    name=f"s{s}_bn{i}",
                )(g)
                g = nn.relu(g)
            g = nn.Conv(1, (3, 3), padding=1, name=f"s{s}_out")(g)
            out.append(img_feats[s] * nn.sigmoid(g))
        return out

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


class IFATGateXYZ(nn.Module):
    """BasicGatev2-style: the splat carries voxel xyz alongside features
    (attention.py BasicGatev2/v3 add geometric channels)."""

    num_scales: int
    num_conv: int = 2

    @nn.compact
    def __call__(self, img_feats, voxel_feats, voxel_xyz, uv_norms, masks,
                 train: bool = False):
        feats_aug = [
            jnp.concatenate([f, x], axis=-1)
            for f, x in zip(voxel_feats, voxel_xyz)
        ]
        return IFATGate(self.num_scales, self.num_conv, name="gate")(
            img_feats, feats_aug, uv_norms, masks, train
        )


class IFATGateConditioned(nn.Module):
    """BasicGatev4/v5-style: the gate conv also sees the image features
    (concat) so the gate is conditioned on both modalities."""

    num_scales: int
    num_conv: int = 2

    @nn.compact
    def __call__(self, img_feats, voxel_feats, uv_norms, masks, train=False):
        out = []
        for s in range(self.num_scales):
            h, w = img_feats[s].shape[1:3]
            splat = splat_to_image(uv_norms[s], voxel_feats[s], masks[s], (h, w))
            g = jnp.concatenate([splat, img_feats[s]], axis=-1)
            for i in range(self.num_conv - 1):
                g = nn.Conv(splat.shape[-1], (3, 3), padding=1,
                            name=f"s{s}_conv{i}")(g)
                g = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.99, epsilon=1e-3,
                                 name=f"s{s}_bn{i}")(g)
                g = nn.relu(g)
            g = nn.Conv(1, (3, 3), padding=1, name=f"s{s}_out")(g)
            out.append(img_feats[s] * nn.sigmoid(g))
        return out


class IFATPatchGate(nn.Module):
    """Patch/Patchv2-style: the gate is computed at PxP patch granularity
    (avg-pooled splat -> conv -> sigmoid -> nearest upsample), giving a
    coarser, more stable spatial gate (attention.py Patch variants)."""

    num_scales: int
    patch: int = 4
    num_conv: int = 2

    @nn.compact
    def __call__(self, img_feats, voxel_feats, uv_norms, masks, train=False):
        out = []
        for s in range(self.num_scales):
            h, w = img_feats[s].shape[1:3]
            splat = splat_to_image(uv_norms[s], voxel_feats[s], masks[s], (h, w))
            p = self.patch
            ph, pw = h // p, w // p
            g = nn.avg_pool(splat, (p, p), strides=(p, p))
            for i in range(self.num_conv - 1):
                g = nn.Conv(splat.shape[-1], (3, 3), padding=1,
                            name=f"s{s}_conv{i}")(g)
                g = nn.relu(g)
            g = nn.Conv(1, (3, 3), padding=1, name=f"s{s}_out")(g)
            g = jnp.repeat(jnp.repeat(g, p, axis=1), p, axis=2)[:, :h, :w]
            out.append(img_feats[s] * nn.sigmoid(g))
        return out


class IFATMultiVoxelPatchGate(nn.Module):
    """Basicgate_patch_iv_multivoxel (attention.py:757-841): multi-scale
    voxel features all splat into each image scale, patch-pooled gate
    conditioned on the image features."""

    num_scales: int
    patch: int = 4
    num_conv: int = 2

    @nn.compact
    def __call__(self, img_feats, voxel_feats_list, uv_norms_list, masks_list,
                 train=False):
        """voxel_feats_list: per VOXEL scale lists of (B, N, C); each splats
        onto every image scale."""
        out = []
        for s in range(self.num_scales):
            h, w = img_feats[s].shape[1:3]
            splats = []
            for vf, uv, m in zip(voxel_feats_list, uv_norms_list, masks_list):
                sp = splat_to_image(uv, vf, m, (h, w))
                splats.append(nn.Dense(16, name=f"s{s}_v{len(splats)}")(sp))
            g = jnp.concatenate(splats + [img_feats[s]], axis=-1)
            p = self.patch
            g = nn.avg_pool(g, (p, p), strides=(p, p))
            for i in range(self.num_conv - 1):
                g = nn.Conv(32, (3, 3), padding=1, name=f"s{s}_conv{i}")(g)
                g = nn.relu(g)
            g = nn.Conv(1, (3, 3), padding=1, name=f"s{s}_out")(g)
            g = jnp.repeat(jnp.repeat(g, p, axis=1), p, axis=2)[:, :h, :w]
            out.append(img_feats[s] * nn.sigmoid(g))
        return out


IFAT_GATES = {
    "BasicGate": IFATGate,
    "BasicGateXYZ": IFATGateXYZ,
    "BasicGateConditioned": IFATGateConditioned,
    "PatchGate": IFATPatchGate,
    "MultiVoxelPatchGate": IFATMultiVoxelPatchGate,
}

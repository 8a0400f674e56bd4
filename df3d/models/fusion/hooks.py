"""Fusion hooks: graft the 3D-DF camera fusion into the sparse backbones.

Behavioral equivalents of the reference's per-stack integration points
(SURVEY §2.2):
  * MVX early fusion @ stride 1 + ACTR fusion @ stride 8 in
    VoxelBackBone8xFusion (spconv_backbone.py:692-929): per-voxel NEAREST
    image-feature gather (image query), IFAT gate on the camera features,
    ACTR enhancement summed back into the voxel stream (fuse_sum).
  * det3d VoxelWithPointProjection (voxel_with_point_projection.py:14-386)
    and mmdet3d ACTR fusion layer (point_fusion.py:315-643): same flow with
    6 cameras folded into the batch axis.

The hooks run INSIDE the backbone's @nn.compact call, so inline submodule
creation registers parameters under the backbone scope.

TPU-native differences: projection is on-device matrix math (no host
round-trip — fixes the reference's per-step CPU sync, SURVEY §3.1/3.3);
queries stay padded at max_ne with masks instead of dynamic n_max.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from df3d.ops.sparse import SparseTensor
from .actr import ACTR, ACTRConfig
from .ifat import IFATGate
from .projection import project_voxels_to_image, sample_image_features


def gather_image_query(i_feats, uv_norm, mask, method: str = "nearest"):
    """Per-voxel image features concatenated over scales (the image query).

    i_feats: list of (B, H, W, C); uv_norm (B, N, 2); -> (B, N, sum C)."""
    outs = []
    for f in i_feats:
        if method == "nearest":
            b, h, w, c = f.shape
            xi = jnp.clip((uv_norm[..., 0] * w).astype(jnp.int32), 0, w - 1)
            yi = jnp.clip((uv_norm[..., 1] * h).astype(jnp.int32), 0, h - 1)
            flat = yi * w + xi
            g = jax.vmap(lambda v, i: v[i])(f.reshape(b, h * w, c), flat)
            outs.append(g * mask[..., None])
        else:
            outs.append(sample_image_features(f, uv_norm, mask))
    return jnp.concatenate(outs, axis=-1)


@dataclasses.dataclass
class ACTRFusionSpec:
    """Config for an ACTR fusion point inside a backbone stage."""

    actr: ACTRConfig
    downsample: int            # voxel stride at the fusion stage
    use_ifat: bool = True
    fuse_sum: bool = True      # sum vs concat back into the voxel stream
    mvx_early: bool = False    # also do MVX sum fusion at stride 1


def make_actr_fusion_hook(spec: ACTRFusionSpec, voxel_size, pc_range,
                          image_shape):
    """Returns a fusion_hook(parent, stage_tensors, train, **fusion_kwargs).

    fusion_kwargs (from the batch):
      image_feats: list of (B, H_l, W_l, C_l) camera feature maps
      proj: (B, 3, 4) lidar->image matrices
      noise_rot/noise_scale/flip_x/flip_y: per-sample aug params (optional)
    """

    def hook(parent, stage_tensors, train, stage=None, image_feats=None,
             proj=None, noise_rot=None, noise_scale=None, flip_x=None,
             flip_y=None, **_):
        st: SparseTensor = stage_tensors[-1]
        if image_feats is None:
            return st

        if stage == "conv1" and spec.mvx_early:
            # MVX @ stride 1: nearest image feature summed into voxel feats
            uv, _, mask = project_voxels_to_image(
                st.coords, st.valid, proj, image_shape, voxel_size, pc_range,
                downsample=1, noise_rot=noise_rot, noise_scale=noise_scale,
                flip_x=flip_x, flip_y=flip_y,
            )
            iq = gather_image_query(image_feats, uv, mask)
            iq = nn.Dense(st.features.shape[-1], name="mvx_proj")(iq)
            return st.with_features(st.features + iq * mask[..., None])
        if stage == "conv1":
            return st

        # ACTR fusion @ the configured stride
        from df3d.core.calib import voxel_centers_from_coords

        uv, depth, mask = project_voxels_to_image(
            st.coords, st.valid, proj, image_shape, voxel_size, pc_range,
            downsample=spec.downsample, noise_rot=noise_rot,
            noise_scale=noise_scale, flip_x=flip_x, flip_y=flip_y,
        )
        i_query = gather_image_query(image_feats, uv, mask)

        feats_for_ifat = image_feats
        if spec.use_ifat:
            n_scales = len(image_feats)
            feats_for_ifat = IFATGate(n_scales, name="ifat")(
                image_feats, [st.features] * n_scales, [uv] * n_scales,
                [mask] * n_scales, train=train,
            )

        centers = voxel_centers_from_coords(
            st.coords, voxel_size, pc_range, spec.downsample
        )
        enh = ACTR(spec.actr, name="actr")(
            st.features, i_query, uv, centers, mask, feats_for_ifat,
            train=train,
        )
        enh = nn.Dense(st.features.shape[-1], name="actr_out_proj")(enh)
        # surface the fusion-point pair for the aux consistency loss
        # (aux_losses.aux_consistency_loss; ref AuxConsistencyLoss:181) —
        # collected only when the caller mutates "intermediates"
        parent.sow("intermediates", "aux_consistency",
                   (st.features, enh * mask[..., None], mask))
        if spec.fuse_sum:
            return st.with_features(st.features + enh * mask[..., None])
        return st.with_features(
            jnp.concatenate([st.features, enh * mask[..., None]], axis=-1)
        )

    return hook


def make_multicam_actr_fusion_hook(spec: ACTRFusionSpec, voxel_size, pc_range,
                                   image_shape, num_cams: int):
    """6-camera variant (det3d VoxelWithPointProjection / mmdet3d ACTR
    layer): cameras fold into the batch axis — queries become
    (B*num_cams, N, ...) with per-camera visibility masks, exactly the
    reference's (B*6, max_ne) batching (:330-342) but static."""

    def hook(parent, stage_tensors, train, stage=None, image_feats=None,
             proj=None, **_):
        st: SparseTensor = stage_tensors[-1]
        if image_feats is None:
            return st
        b, n, c = st.features.shape

        # proj (B, n_cam, 3, 4) -> uv (B, n_cam, N, 2), mask (B, n_cam, N)
        uv, depth, mask = project_voxels_to_image(
            st.coords, st.valid, proj, image_shape, voxel_size, pc_range,
            downsample=spec.downsample,
        )
        uv = uv.reshape(b * num_cams, n, 2)
        mask_f = mask.reshape(b * num_cams, n)
        # image feats come per camera: (B, n_cam, H, W, C) per level
        cam_feats = [
            f.reshape(b * num_cams, *f.shape[2:]) for f in image_feats
        ]
        i_query = gather_image_query(cam_feats, uv, mask_f)

        feats_for_ifat = cam_feats
        if spec.use_ifat:
            n_scales = len(cam_feats)
            q_feat_rep = jnp.repeat(st.features, num_cams, axis=0)
            feats_for_ifat = IFATGate(n_scales, name="ifat")(
                cam_feats, [q_feat_rep] * n_scales, [uv] * n_scales,
                [mask_f] * n_scales, train=train,
            )

        from df3d.core.calib import voxel_centers_from_coords

        centers = voxel_centers_from_coords(
            st.coords, voxel_size, pc_range, spec.downsample
        )
        centers_rep = jnp.repeat(centers, num_cams, axis=0)
        q_feat_rep = jnp.repeat(st.features, num_cams, axis=0)

        enh = ACTR(spec.actr, name="actr")(
            q_feat_rep, i_query, uv, centers_rep, mask_f, feats_for_ifat,
            train=train,
        )
        enh = nn.Dense(c, name="actr_out_proj")(enh)
        enh = (enh * mask_f[..., None]).reshape(b, num_cams, n, c)
        enh_sum = enh.sum(axis=1)
        parent.sow("intermediates", "aux_consistency",
                   (st.features, enh_sum,
                    mask.reshape(b, num_cams, n).any(axis=1)))
        # sum contributions across cameras (det3d sum-scatter :369-377)
        return st.with_features(st.features + enh_sum)

    return hook

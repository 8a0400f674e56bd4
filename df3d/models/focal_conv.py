"""Focal sparse convolution (FocalsConv), TPU-native.

Behavioral equivalent of the inherited FocalsConv surface
(VoxelRCNN/pcdet/models/backbones_3d/focal_sparse_conv/
focal_sparse_conv.py:9-225, det3d scn_focal.py — present in both forks,
not used by the 5 target configs, SURVEY §2.8): a submanifold conv
predicts a per-voxel importance ("cubic importance" in the paper); voxels
below the learned threshold are pruned from the output coordinate set and
important voxels keep/dilate their features.

Static-shape adaptation: pruning keeps a fixed `keep_ratio` of rows by
top-k importance (masked, never reshaped), instead of a dynamic count.
The training-time importance loss (BCE against voxel-contains-gt labels)
is `focal_conv_importance_loss`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from df3d.core.boxes import points_in_boxes
from df3d.ops.sparse import ConvPlan, SparseTensor, apply_sparse_conv
from df3d.models.layers import MaskedBatchNorm, _kaiming_taps


class FocalSparseConv(nn.Module):
    out_channels: int
    keep_ratio: float = 0.5

    @nn.compact
    def __call__(self, st: SparseTensor, plan: ConvPlan, train: bool):
        """Returns (SparseTensor with pruned coords, importance (B, N))."""
        k = plan.num_taps
        w = self.param(
            "kernel", _kaiming_taps, (k, st.features.shape[-1], self.out_channels)
        )
        feats = apply_sparse_conv(st.features, plan, w)
        feats = MaskedBatchNorm()(feats, st.valid, train)
        feats = nn.relu(feats)

        imp_logit = nn.Dense(1, name="importance")(feats)[..., 0]  # (B, N)
        imp = nn.sigmoid(imp_logit)
        feats = feats * imp[..., None]

        n = st.num_rows
        n_keep = max(int(n * self.keep_ratio), 1)
        score = jnp.where(st.valid, imp, -1.0)
        thresh = jax.lax.top_k(score, n_keep)[0][..., -1:]  # per-sample kth
        keep = st.valid & (score >= thresh)

        coords = jnp.where(keep[..., None], st.coords, -1)
        out = SparseTensor(
            jnp.where(keep[..., None], feats, 0.0), coords, st.spatial_shape
        )
        return out, imp_logit


def focal_conv_importance_loss(
    imp_logit, st: SparseTensor, gt_boxes, gt_valid, voxel_size, pc_range,
    downsample: int = 1,
):
    """BCE: important iff the voxel center lies inside a gt box."""
    from df3d.core.calib import voxel_centers_from_coords

    centers = voxel_centers_from_coords(
        st.coords, voxel_size, pc_range, downsample
    )

    def one(centers_s, boxes_s, bvalid_s, vvalid_s):
        inb = points_in_boxes(centers_s, boxes_s[:, :7])  # (N, M)
        return (inb & bvalid_s[None, :]).any(-1) & vvalid_s

    target = jax.vmap(one)(centers, gt_boxes, gt_valid, st.valid)
    t = target.astype(jnp.float32)
    bce = (
        jnp.maximum(imp_logit, 0) - imp_logit * t
        + jnp.log1p(jnp.exp(-jnp.abs(imp_logit)))
    )
    m = st.valid.astype(jnp.float32)
    return (bce * m).sum() / jnp.maximum(m.sum(), 1.0)

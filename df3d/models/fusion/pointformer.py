"""3D local self-attention over voxel queries ("LT" in the paper).

Equivalent of VoxelRCNN/pcdet/models/model_utils/pointformer.py:250-379
LocalTransformer: D-FPS sample centers, ball-query fixed-size neighborhoods,
positional MLP on relative xyz, a small pre-norm transformer encoder over
each neighborhood, then scatter enhanced features back onto the original
point set ('replace' via scatter-set, 'sum' via mean of contributions).

TPU shape: neighborhoods are a dense (B, npoint, nsample, C) tensor ->
batched dense attention on the MXU; FPS/ball-query come from
df3d.ops.pointops (static shapes + masks).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from df3d.ops.pointops import ball_query, furthest_point_sample


class PreNormEncoderLayer(nn.Module):
    """torch TransformerEncoderLayerPreNorm equivalent: LN->MHA->res,
    LN->FF->res."""

    d_model: int
    nhead: int = 4
    dim_feedforward: int | None = None

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        """x (..., T, C); mask (..., T) True = valid token."""
        dff = self.dim_feedforward or 2 * self.d_model
        h = nn.LayerNorm()(x)
        attn_mask = mask[..., None, None, :]  # (..., 1, 1, T) broadcast q dim
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model, name="mha"
        )(h, h, mask=attn_mask)
        x = x + h
        h = nn.LayerNorm()(x)
        h = nn.Dense(dff)(h)
        h = nn.relu(h)
        h = nn.Dense(self.d_model)(h)
        return x + h


class LocalTransformer(nn.Module):
    npoint: int = 2048
    radius: float = 2.0
    nsample: int = 32
    d_model: int = 64
    num_layers: int = 2
    nhead: int = 4
    feat_agg_method: str = "replace"  # 'replace' | 'sum'
    fps_chunks: int | None = None  # None = auto (~npoint/32); 1 = exact FPS
    exact_ball: bool = False  # True = reference-exact ball query (parity)

    @nn.compact
    def __call__(self, xyz: jax.Array, features: jax.Array, valid: jax.Array):
        """xyz (B, N, 3) metric voxel centers; features (B, N, C);
        valid (B, N). Returns updated features (B, N, C)."""
        b, n, c = features.shape

        # chunked FPS: sequential depth npoint -> ~32 (see pointops)
        fps_chunks = self.fps_chunks
        if fps_chunks is None:
            fps_chunks = math.gcd(self.npoint, max(1, self.npoint // 32))

        def sample_group(xyz_s, valid_s):
            centers_idx = furthest_point_sample(
                xyz_s, valid_s, self.npoint, chunks=fps_chunks)
            centers = xyz_s[centers_idx]
            idx, mask = ball_query(
                centers, xyz_s, valid_s, self.radius, self.nsample,
                exact=self.exact_ball)
            return centers_idx, centers, idx, mask

        centers_idx, centers, idx, mask = jax.vmap(sample_group)(xyz, valid)
        # gather neighborhoods
        g_xyz = jax.vmap(lambda x, i: x[i])(xyz, idx)        # (B, S, K, 3)
        g_feat = jax.vmap(lambda f, i: f[i])(features, idx)  # (B, S, K, C)
        g_xyz = g_xyz - centers[:, :, None, :]

        # positional MLP on relative xyz (pe: conv1x1 C/2 -> C)
        pe = nn.Dense(self.d_model // 2, name="pe0")(g_xyz)
        pe = nn.relu(pe)
        pe = nn.Dense(self.d_model, name="pe1")(pe)

        h = g_feat + pe
        grp_mask = mask  # ball_query already excludes invalid points
        for i in range(self.num_layers):
            h = PreNormEncoderLayer(
                self.d_model, self.nhead, name=f"enc{i}"
            )(h, grp_mask)
        h = jnp.where(grp_mask[..., None], h, 0.0)

        # scatter back to the N points
        flat_idx = jnp.where(grp_mask, idx, n).reshape(b, -1)  # n -> dropped
        flat_feat = h.reshape(b, -1, c)
        if self.feat_agg_method == "replace":
            def scat(feats0, fi, ff):
                return feats0.at[fi].set(ff, mode="drop")[:n]
            out = jax.vmap(scat)(
                jnp.concatenate([features, jnp.zeros((b, 1, c))], axis=1),
                flat_idx, flat_feat,
            )
        else:  # 'sum': features + mean of contributions
            def scat(fi, ff):
                acc = jnp.zeros((n + 1, c)).at[fi].add(ff, mode="drop")
                cnt = jnp.zeros((n + 1,)).at[fi].add(1.0, mode="drop")
                return acc[:n] / jnp.maximum(cnt[:n, None], 1.0)
            out = features + jax.vmap(scat)(flat_idx, flat_feat)
        return jnp.where(valid[..., None], out, 0.0)

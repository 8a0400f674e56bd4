"""Global / local-global / Linformer transformer variants over voxel queries.

Equivalents of the remaining pointformer.py surface
(VoxelRCNN/pcdet/models/model_utils/pointformer.py: GlobalTransformer:382,
LocalGlobalTransformer:443, LinformerEncoderLayer:114-247, BasicDownBlock:514):
  * GlobalTransformer — attention of all (valid) voxel queries over an
    FPS-sampled global token set;
  * Linformer layer — K/V projected along the token axis to a fixed rank,
    giving linear attention cost for long query sets;
  * LocalGlobalTransformer — local neighborhoods attend to global tokens.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from df3d.ops.pointops import furthest_point_sample
from .pointformer import PreNormEncoderLayer


class LinformerEncoderLayer(nn.Module):
    """Pre-norm encoder layer with rank-`proj_k` K/V token projection."""

    d_model: int
    proj_k: int = 128
    nhead: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        """x (B, T, C); mask (B, T)."""
        h = nn.LayerNorm()(x)
        kv = jnp.where(mask[..., None], h, 0.0)
        # token-axis projection: (B, T, C) -> (B, k, C)
        proj = self.param(
            "e_proj", nn.initializers.normal(0.02), (x.shape[1], self.proj_k)
        )
        kv = jnp.einsum("btc,tk->bkc", kv, proj)
        h = nn.MultiHeadDotProductAttention(self.nhead, name="mha")(h, kv)
        x = x + h
        h = nn.LayerNorm()(x)
        h = nn.Dense(2 * self.d_model)(h)
        h = nn.relu(h)
        h = nn.Dense(self.d_model)(h)
        return x + h


class GlobalTransformer(nn.Module):
    """Queries attend over an FPS-sampled global token set (pointformer
    GlobalTransformer)."""

    npoint: int = 512
    d_model: int = 64
    num_layers: int = 1
    nhead: int = 4

    @nn.compact
    def __call__(self, xyz, features, valid):
        """xyz (B, N, 3); features (B, N, C); valid (B, N) -> (B, N, C)."""
        def sample(xyz_s, valid_s):
            return furthest_point_sample(xyz_s, valid_s, self.npoint)

        idx = jax.vmap(sample)(xyz, valid)  # (B, S)
        g_feat = jnp.take_along_axis(
            features, idx[..., None], axis=1
        )  # (B, S, C)
        g_valid = jnp.take_along_axis(valid, idx, axis=1)
        g_feat = jnp.where(g_valid[..., None], g_feat, 0.0)

        h = features
        for i in range(self.num_layers):
            a = nn.LayerNorm()(h)
            a = nn.MultiHeadDotProductAttention(self.nhead, name=f"mha{i}")(
                a, g_feat, mask=g_valid[:, None, None, :]
            )
            h = h + a
            f = nn.LayerNorm()(h)
            f = nn.Dense(2 * self.d_model)(f)
            f = nn.relu(f)
            f = nn.Dense(self.d_model)(f)
            h = h + f
        return jnp.where(valid[..., None], h, 0.0)


class BasicDownBlock(nn.Module):
    """Downsampling transformer block (pointformer.py BasicDownBlock:514):
    LocalTransformer downsample (FPS centers + windowed attention, the
    max-pooled center token kept) -> optional local-global combine ->
    GlobalTransformer over the centers. Returns
    (new_xyz (B, S, 3), center feats (B, S, C_out), fps_idx (B, S))."""

    npoint: int = 1024
    radius: float = 2.0
    nsample: int = 16
    d_model: int = 64
    d_out: int = 64
    nhead: int = 4
    num_layers: int = 2
    use_decoder: bool = True

    @nn.compact
    def __call__(self, xyz, features, valid):
        from df3d.ops.pointops import ball_query

        def sample_group(xyz_s, valid_s):
            cidx = furthest_point_sample(xyz_s, valid_s, self.npoint)
            centers = xyz_s[cidx]
            idx, mask = ball_query(
                centers, xyz_s, valid_s, self.radius, self.nsample)
            return cidx, centers, idx, mask

        cidx, centers, idx, mask = jax.vmap(sample_group)(xyz, valid)
        g_xyz = jax.vmap(lambda x, i: x[i])(xyz, idx) - centers[:, :, None]
        g_feat = jax.vmap(lambda f, i: f[i])(features, idx)
        h = nn.Dense(self.d_model, name="in_proj")(g_feat)
        pe = nn.Dense(self.d_model // 2, name="pe0")(g_xyz)
        pe = nn.relu(pe)
        pe = nn.Dense(self.d_model, name="pe1")(pe)
        h = h + pe
        for i in range(self.num_layers):
            h = PreNormEncoderLayer(
                self.d_model, self.nhead, name=f"local{i}")(h, mask)
        h = jnp.where(mask[..., None], h, -1e9)
        local = h.max(axis=2)  # pooled center token (B, S, C)
        local = jnp.where(local <= -1e8, 0.0, local)
        c_valid = jnp.take_along_axis(valid, cidx, axis=1) & mask.any(-1)

        if self.use_decoder:
            combined = LocalGlobalTransformer(
                npoint_local=self.npoint, npoint_global=min(self.npoint, 256),
                radius=self.radius, nsample=self.nsample,
                d_model=self.d_model, nhead=self.nhead, name="combine",
            )(centers, local, c_valid)
            local = local + combined

        out = GlobalTransformer(
            npoint=min(self.npoint, 512), d_model=self.d_model,
            num_layers=self.num_layers, nhead=self.nhead, name="global",
        )(centers, local, c_valid)
        out = nn.Dense(self.d_out, name="out_proj")(out)
        return centers, jnp.where(c_valid[..., None], out, 0.0), cidx


class LocalGlobalTransformer(nn.Module):
    """Local neighborhoods cross-attend to a global FPS token set
    (pointformer LocalGlobalTransformer:443)."""

    npoint_local: int = 2048
    npoint_global: int = 256
    radius: float = 2.0
    nsample: int = 16
    d_model: int = 64
    nhead: int = 4

    @nn.compact
    def __call__(self, xyz, features, valid):
        from df3d.ops.pointops import ball_query

        def one(xyz_s, valid_s):
            cidx = furthest_point_sample(xyz_s, valid_s, self.npoint_local)
            gidx = furthest_point_sample(xyz_s, valid_s, self.npoint_global)
            nidx, nmask = ball_query(
                xyz_s[cidx], xyz_s, valid_s, self.radius, self.nsample
            )
            return cidx, gidx, nidx, nmask

        cidx, gidx, nidx, nmask = jax.vmap(one)(xyz, valid)
        local = jax.vmap(lambda f, i: f[i])(features, nidx)  # (B, S, K, C)
        local = jnp.where(nmask[..., None], local, 0.0).mean(axis=2)  # (B, S, C)
        glob = jnp.take_along_axis(features, gidx[..., None], axis=1)
        gv = jnp.take_along_axis(valid, gidx, axis=1)

        h = nn.MultiHeadDotProductAttention(self.nhead, name="cross")(
            nn.LayerNorm()(local), jnp.where(gv[..., None], glob, 0.0),
            mask=gv[:, None, None, :],
        )
        h = local + h
        # scatter back to center positions, others unchanged
        n = features.shape[1]

        def scat(feats, ci, hs):
            return feats.at[ci].set(hs)

        out = jax.vmap(scat)(features, cidx, h)
        return jnp.where(valid[..., None], out, 0.0)

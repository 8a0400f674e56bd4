"""Swin Transformer backbone (Swin-Tiny default).

Image branch for the TransFusion-L + 3D-DF (Swin-T) variant
(reference README.md:37, marked TBD upstream — no config/ckpt shipped, so
this follows the published Swin-T architecture): 4x4 patch embed, stages
(2, 2, 6, 2) at dims (96, 192, 384, 768), 7x7 (shifted) window attention
with relative position bias, patch-merging downsample. Returns the 4 stage
feature maps for an FPN.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


def _window_partition(x, w):
    b, h, ww, c = x.shape
    x = x.reshape(b, h // w, w, ww // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def _window_merge(win, w, h, ww, b):
    c = win.shape[-1]
    x = win.reshape(b, h // w, ww // w, w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, ww, c)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window: int = 7

    @nn.compact
    def __call__(self, x, mask=None):
        """x (nW, T, C) window tokens; mask (nW_types, T, T) additive."""
        t = self.window * self.window
        qkv = nn.Dense(self.dim * 3, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = self.dim // self.num_heads

        def heads(z):
            return z.reshape(*z.shape[:-1], self.num_heads, hd).swapaxes(-3, -2)

        q, k, v = heads(q), heads(k), heads(v)
        attn = (q @ k.swapaxes(-1, -2)) / np.sqrt(hd)

        # relative position bias
        rel = self.param(
            "rel_bias", nn.initializers.normal(0.02),
            ((2 * self.window - 1) ** 2, self.num_heads),
        )
        coords = np.stack(
            np.meshgrid(np.arange(self.window), np.arange(self.window),
                        indexing="ij"), -1,
        ).reshape(-1, 2)
        diff = coords[:, None] - coords[None, :] + self.window - 1
        idx = diff[..., 0] * (2 * self.window - 1) + diff[..., 1]
        attn = attn + rel[idx].transpose(2, 0, 1)[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(-1, nw, self.num_heads, t, t)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(-1, self.num_heads, t, t)
        attn = jax.nn.softmax(attn, -1)
        out = (attn @ v).swapaxes(-3, -2).reshape(*x.shape[:-1], self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        b, h0, w0, c = x.shape
        # effective window/shift for small maps + pad to window multiples
        win = min(self.window, h0, w0)
        shift = self.shift if 0 < self.shift < win else 0
        ph, pw = (-h0) % win, (-w0) % win
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        h, w = h0 + ph, w0 + pw

        shortcut = x
        y = nn.LayerNorm()(x)
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            img_mask = np.zeros((1, h, w, 1), np.float32)
            cnt = 0
            for hs in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
                for ws in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
                    img_mask[:, hs, ws] = cnt
                    cnt += 1
            mw = _window_partition(jnp.asarray(img_mask), win)[..., 0]
            mask = jnp.where(mw[:, None, :] == mw[:, :, None], 0.0, -1e9)
        else:
            mask = None
        winp = _window_partition(y, win)
        winp = WindowAttention(self.dim, self.num_heads, win, name="attn")(
            winp, mask
        )
        y = _window_merge(winp, win, h, w, b)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        x = shortcut + y

        z = nn.LayerNorm()(x)
        z = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp0")(z)
        z = nn.gelu(z)
        z = nn.Dense(self.dim, name="mlp1")(z)
        x = x + z
        return x[:, :h0, :w0]


class SwinTransformer(nn.Module):
    embed_dim: int = 96
    depths: tuple = (2, 2, 6, 2)
    num_heads: tuple = (3, 6, 12, 24)
    window: int = 7

    @nn.compact
    def __call__(self, images, train: bool = False):
        """images (B, H, W, 3), H/W multiples of 4*window*2^3 (pad first).
        Returns list of 4 stage maps at strides 4/8/16/32."""
        x = nn.Conv(self.embed_dim, (4, 4), strides=4, name="patch_embed")(images)
        x = nn.LayerNorm()(x)
        outs = []
        dim = self.embed_dim
        for si, depth in enumerate(self.depths):
            for bi in range(depth):
                x = SwinBlock(
                    dim, self.num_heads[si], self.window,
                    shift=0 if bi % 2 == 0 else self.window // 2,
                    name=f"stage{si}_block{bi}",
                )(x)
            outs.append(nn.LayerNorm(name=f"out_norm{si}")(x))
            if si < len(self.depths) - 1:  # patch merging (pad odd dims)
                b, h, w, c = x.shape
                if h % 2 or w % 2:
                    x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
                    b, h, w, c = x.shape
                x = x.reshape(b, h // 2, 2, w // 2, 2, c)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
                x = nn.LayerNorm(name=f"merge_norm{si}")(x)
                x = nn.Dense(2 * dim, use_bias=False, name=f"merge{si}")(x)
                dim *= 2
        return outs

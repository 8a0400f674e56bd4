"""Probe 4: 448-cell-block bitrank (64B rows — the fast gather shape);
bf16 triple-concat window convs (fixed closures); build-only cost."""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

ITERS = 8
N = 120_000
GRID = (40, 1440, 1440)
Z, Y, X = GRID
CELLS = Z * Y * X
BC = 448
W = 14

_DN_ROW = lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
)

rng = np.random.RandomState(0)

_f0 = jax.jit(lambda x: x + 1.0)
float(_f0(jnp.float32(1)))
RTT = 1e9
for _ in range(5):
    t0 = time.time()
    float(_f0(jnp.float32(1)))
    RTT = min(RTT, time.time() - t0)
print(f"RTT = {RTT*1000:.1f} ms", flush=True)


def timed(name, fn, *args):
    f = jax.jit(fn)
    t0 = time.time()
    s = float(f(*args))
    c = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        s = float(f(*args))
        best = min(best, time.time() - t0)
    print(f"{name:40s} {(best-RTT)/ITERS*1000:8.2f} ms/iter (compile {c:.0f}s,"
          f" sink {s:.3g})", flush=True)


def perturb(s):
    return jnp.where(s > jnp.float32(1e30), 1, 0).astype(jnp.int32)


def build448(keys, valid):
    nblk = (CELLS + BC - 1) // BC
    nwords = nblk * W
    blk = keys // BC
    inblk = keys - blk * BC
    wslot = jnp.where(valid, blk * W + (inblk >> 5), nwords)
    bit = jnp.where(valid, jnp.uint32(1) << (inblk & 31).astype(jnp.uint32),
                    jnp.uint32(0))
    words = (jnp.zeros((nwords + 1,), jnp.uint32)
             .at[wslot].add(bit, mode="drop")[:nwords])
    wc = lax.population_count(words).astype(jnp.int32)
    bsum = wc.reshape(nblk, W).sum(-1)
    pre = jnp.cumsum(bsum) - bsum
    return jnp.concatenate(
        [pre[:, None],
         lax.bitcast_convert_type(words, jnp.int32).reshape(nblk, W),
         jnp.zeros((nblk, 1), jnp.int32)], 1)  # (nblk, 16) 64B rows


def lookup448(packed, q, q_ok, miss):
    nblk = packed.shape[0]
    blk = q // BC
    b = jnp.where(q_ok, blk, nblk)
    row = lax.gather(packed, b[:, None], _DN_ROW, slice_sizes=(1, 16),
                     mode="clip")
    pre = row[:, 0]
    w = lax.bitcast_convert_type(row[:, 1:1 + W], jnp.uint32)
    j = q - blk * BC
    jw = j >> 5
    jb = (j & 31).astype(jnp.uint32)
    iw = jnp.arange(W, dtype=jnp.int32)
    partial = (jnp.uint32(1) << jb) - jnp.uint32(1)
    mask = jnp.where(iw[None] < jw[:, None], jnp.uint32(0xFFFFFFFF),
                     jnp.where(iw[None] == jw[:, None], partial[:, None],
                               jnp.uint32(0)))
    rank = pre + lax.population_count(w & mask).astype(jnp.int32).sum(-1)
    wsel = w[:, 0]
    for i in range(1, W):
        wsel = jnp.where(jw == i, w[:, i], wsel)
    hit = ((wsel >> jb) & jnp.uint32(1)).astype(bool)
    return jnp.where(q_ok & hit, rank, miss)


OFFS = np.stack(np.meshgrid(*[np.arange(-1, 2)] * 3, indexing="ij"),
                -1).reshape(-1, 3).astype(np.int32)
offs_j = jnp.asarray(OFFS)

raw = rng.randint(0, CELLS, size=200_000, dtype=np.int64)
keys_np = np.sort(np.unique(raw)[:N]).astype(np.int32)
coords_np = np.stack([keys_np // (Y * X), (keys_np // X) % Y, keys_np % X],
                     -1).astype(np.int32)
coords0 = jnp.asarray(coords_np)
valid0 = jnp.ones((N,), bool)


def p_build_only(coords_in):
    def body(i, carry):
        coords = coords_in + perturb(carry)
        keys = (coords[:, 0] * Y + coords[:, 1]) * X + coords[:, 2]
        packed = build448(keys, valid0)
        return jnp.float32(packed[::4096].sum())
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


def p_subm27(coords_in):
    def body(i, carry):
        coords = coords_in + perturb(carry)
        keys = (coords[:, 0] * Y + coords[:, 1]) * X + coords[:, 2]
        packed = build448(keys, valid0)
        nbr = coords[:, None, :] + offs_j[None]
        ok = ((nbr[..., 0] >= 0) & (nbr[..., 0] < Z)
              & (nbr[..., 1] >= 0) & (nbr[..., 1] < Y)
              & (nbr[..., 2] >= 0) & (nbr[..., 2] < X) & valid0[:, None])
        qkey = (nbr[..., 0] * Y + nbr[..., 1]) * X + nbr[..., 2]
        rows = lookup448(packed, qkey.reshape(-1), ok.reshape(-1), N)
        return jnp.float32(rows.sum())
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


def p_subm_sym(coords_in):
    ar = jnp.arange(N, dtype=jnp.int32)

    def body(i, carry):
        coords = coords_in + perturb(carry)
        keys = (coords[:, 0] * Y + coords[:, 1]) * X + coords[:, 2]
        packed = build448(keys, valid0)
        nbr = coords[:, None, :] + offs_j[None, :13]
        ok = ((nbr[..., 0] >= 0) & (nbr[..., 0] < Z)
              & (nbr[..., 1] >= 0) & (nbr[..., 1] < Y)
              & (nbr[..., 2] >= 0) & (nbr[..., 2] < X) & valid0[:, None])
        qkey = (nbr[..., 0] * Y + nbr[..., 1]) * X + nbr[..., 2]
        rows = lookup448(
            packed, qkey.reshape(-1), ok.reshape(-1), N).reshape(N, 13)
        ident = jnp.where(valid0, ar, N)
        inv = jax.vmap(
            lambda r: jnp.full((N + 1,), N, jnp.int32).at[r].set(
                ar, mode="drop")[:N]
        )(rows.T)
        full = jnp.concatenate([rows, ident[:, None], inv.T[:, ::-1]], 1)
        return jnp.float32(full.sum())
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


timed("bitrank448 build only", p_build_only, coords0)
timed("subm27 singles bitrank448", p_subm27, coords0)
timed("subm sym-half bitrank448", p_subm_sym, coords0)


# ---- bf16 window convs (closures over static shapes) ----
def make_conv_win(nin, nout, cin):
    wts = jnp.asarray(rng.randn(9, 3, cin, cin).astype(np.float32) * 0.03
                      ).astype(jnp.bfloat16)

    def p(feats_in, starts0, sel0):
        def body(i, carry):
            f = (feats_in + carry.astype(jnp.float32) * 1e-30
                 ).astype(jnp.bfloat16)
            padded = jnp.concatenate([f, jnp.zeros((3, cin), f.dtype)], 0)
            wide = jnp.concatenate(
                [padded[l:l + nin + 1] for l in range(3)], -1)
            g = lax.gather(wide, starts0.reshape(-1, 1), _DN_ROW,
                           slice_sizes=(1, 3 * cin), mode="clip"
                           ).reshape(nout, 9, 3, cin)
            s = sel0.reshape(nout, 9, 3)[..., None]
            taps = sum(jnp.where(s == l, g[..., l, :][..., None, :], 0)
                       for l in range(3))
            out = jnp.einsum("ngxc,gxcd->nd", taps, wts,
                             preferred_element_type=jnp.float32)
            return jnp.float32(out.sum())
        return lax.fori_loop(0, ITERS, body, jnp.float32(0))
    return p


def make_conv_single(nin, nout, cin, dt):
    wts = jnp.asarray(rng.randn(27, cin, cin).astype(np.float32) * 0.03
                      ).astype(dt)

    def p(feats_in, gidx):
        def body(i, carry):
            f = (feats_in + carry.astype(jnp.float32) * 1e-30).astype(dt)
            padded = jnp.concatenate([f, jnp.zeros((1, cin), f.dtype)], 0)
            g = lax.gather(padded, gidx.reshape(-1, 1), _DN_ROW,
                           slice_sizes=(1, cin), mode="clip"
                           ).reshape(27, nout, cin)
            out = jnp.einsum("knc,kcd->nd", g, wts,
                             preferred_element_type=jnp.float32)
            return jnp.float32(out.sum())
        return lax.fori_loop(0, ITERS, body, jnp.float32(0))
    return p


for nin, nout, cin, tag in ((120_000, 120_000, 16, "s1subm"),
                            (120_000, 90_000, 16, "down2"),
                            (90_000, 90_000, 32, "s2subm")):
    feats = jnp.asarray(rng.randn(nin, cin).astype(np.float32))
    starts = jnp.asarray(rng.randint(0, nin, size=(nout, 9)).astype(np.int32))
    sel = jnp.asarray(rng.randint(-1, 3, size=(nout, 27)).astype(np.int32))
    mb = (nin + 1) * 3 * cin * 2 / 1e6
    timed(f"conv win bf16 {tag} ({mb:.1f}MB)",
          make_conv_win(nin, nout, cin), feats, starts, sel)
    gidx = jnp.asarray(rng.randint(0, nin, size=(27, nout)).astype(np.int32))
    timed(f"conv single bf16 {tag}",
          make_conv_single(nin, nout, cin, jnp.bfloat16), feats, gidx)

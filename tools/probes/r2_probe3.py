"""Probe 3: 224-cell-block bitrank (32B-aligned (1,8) rows, 11.85MB under
the ~12MB gather cliff) for subm plans; bf16 triple-concat window convs."""

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
BC = 224  # cells per block
W = 7     # words per block

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


# rate check: (1,8) i32 aligned rows at 11.85MB
nrows8 = 11_850_000 // 32
tbl8 = jnp.asarray(rng.randint(0, 99, size=(nrows8, 8)).astype(np.int32))
idx8 = jnp.asarray(rng.randint(0, nrows8, size=1_620_000).astype(np.int32))


def p_rate8(table, idx0):
    def body(i, carry):
        idx = idx0 + perturb(carry)
        g = lax.gather(table, idx[:, None], _DN_ROW, slice_sizes=(1, 8),
                       mode="clip")
        return jnp.float32(g.sum())
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


timed("1.62M (1,8)i32 aligned, 11.85MB", p_rate8, tbl8, idx8)


def build_bitrank224(keys, valid, cells):
    nblk = (cells + BC - 1) // BC
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
         lax.bitcast_convert_type(words, jnp.int32).reshape(nblk, W)], 1)


def lookup224(packed, q, q_ok, miss):
    nblk = packed.shape[0]
    blk = q // BC
    b = jnp.where(q_ok, blk, nblk)
    row = lax.gather(packed, b[:, None], _DN_ROW, slice_sizes=(1, 8),
                     mode="clip")
    pre = row[:, 0]
    w = lax.bitcast_convert_type(row[:, 1:8], jnp.uint32)  # (Q,7)
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


def p_subm27_224(coords_in):
    def body(i, carry):
        coords = coords_in + perturb(carry)
        keys = (coords[:, 0] * Y + coords[:, 1]) * X + coords[:, 2]
        packed = build_bitrank224(keys, valid0, CELLS)
        nbr = coords[:, None, :] + offs_j[None]
        ok = ((nbr[..., 0] >= 0) & (nbr[..., 0] < Z)
              & (nbr[..., 1] >= 0) & (nbr[..., 1] < Y)
              & (nbr[..., 2] >= 0) & (nbr[..., 2] < X) & valid0[:, None])
        qkey = (nbr[..., 0] * Y + nbr[..., 1]) * X + nbr[..., 2]
        rows = lookup224(packed, qkey.reshape(-1), ok.reshape(-1), N)
        return jnp.float32(rows.sum())
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


timed("subm27 singles bitrank224", p_subm27_224, coords0)


def p_subm_sym_224(coords_in):
    ar = jnp.arange(N, dtype=jnp.int32)

    def body(i, carry):
        coords = coords_in + perturb(carry)
        keys = (coords[:, 0] * Y + coords[:, 1]) * X + coords[:, 2]
        packed = build_bitrank224(keys, valid0, CELLS)
        nbr = coords[:, None, :] + offs_j[None, :13]
        ok = ((nbr[..., 0] >= 0) & (nbr[..., 0] < Z)
              & (nbr[..., 1] >= 0) & (nbr[..., 1] < Y)
              & (nbr[..., 2] >= 0) & (nbr[..., 2] < X) & valid0[:, None])
        qkey = (nbr[..., 0] * Y + nbr[..., 1]) * X + nbr[..., 2]
        rows = lookup224(
            packed, qkey.reshape(-1), ok.reshape(-1), N).reshape(N, 13)
        ident = jnp.where(valid0, ar, N)
        inv = jax.vmap(
            lambda r: jnp.full((N + 1,), N, jnp.int32).at[r].set(
                ar, mode="drop")[:N]
        )(rows.T)
        full = jnp.concatenate([rows, ident[:, None], inv.T[:, ::-1]], 1)
        return jnp.float32(full.sum())
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


timed("subm sym-half bitrank224", p_subm_sym_224, coords0)


# ---- bf16 window convs via triple-concat operand ----
def p_conv_win_bf16(feats_in, starts0, sel0, nrows, cin):
    kx = 3
    wts = jnp.asarray(
        rng.randn(9, kx, cin, cin).astype(np.float32) * 0.03
    ).astype(jnp.bfloat16)

    def body(i, carry):
        f = (feats_in + carry.astype(jnp.float32) * 1e-30).astype(jnp.bfloat16)
        padded = jnp.concatenate([f, jnp.zeros((kx, cin), f.dtype)], 0)
        wide = jnp.concatenate(
            [padded[l:l + feats_in.shape[0] + 1] for l in range(kx)], -1)
        g = lax.gather(wide, starts0.reshape(-1, 1), _DN_ROW,
                       slice_sizes=(1, kx * cin), mode="clip"
                       ).reshape(-1, 9, kx, cin)
        s = sel0.reshape(-1, 9, kx)[..., None]
        taps = sum(jnp.where(s == l, g[..., l, :][..., None, :], 0)
                   for l in range(kx))  # (M,9,kx,cin)
        out = jnp.einsum("ngxc,gxcd->nd", taps, wts,
                         preferred_element_type=jnp.float32)
        return jnp.float32(out.sum())
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


for nin, nout, cin, tag in ((120_000, 120_000, 16, "s1 subm"),
                            (120_000, 90_000, 16, "down2"),
                            (90_000, 90_000, 32, "s2 subm")):
    feats = jnp.asarray(rng.randn(nin, cin).astype(np.float32))
    starts = jnp.asarray(rng.randint(0, nin, size=(nout, 9)).astype(np.int32))
    sel = jnp.asarray(rng.randint(-1, 3, size=(nout, 27)).astype(np.int32))
    mb = (nin + 1) * 3 * cin * 2 / 1e6
    timed(f"conv win bf16 {tag} ({mb:.1f}MB)", p_conv_win_bf16,
          feats, starts, sel, nin, cin)


# current-form bf16 singles for same shapes (baseline at bf16)
def p_conv_single_bf16(feats_in, gidx, cin):
    wts = jnp.asarray(
        rng.randn(27, cin, cin).astype(np.float32) * 0.03
    ).astype(jnp.bfloat16)

    def body(i, carry):
        f = (feats_in + carry.astype(jnp.float32) * 1e-30).astype(jnp.bfloat16)
        padded = jnp.concatenate([f, jnp.zeros((1, cin), f.dtype)], 0)
        g = lax.gather(padded, gidx.reshape(-1, 1), _DN_ROW,
                       slice_sizes=(1, cin), mode="clip"
                       ).reshape(27, -1, cin)
        out = jnp.einsum("knc,kcd->nd", g, wts,
                         preferred_element_type=jnp.float32)
        return jnp.float32(out.sum())
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


for nin, nout, cin, tag in ((120_000, 120_000, 16, "s1 subm"),):
    feats = jnp.asarray(rng.randn(nin, cin).astype(np.float32))
    gidx = jnp.asarray(
        rng.randint(0, nin, size=(27, nout)).astype(np.int32))
    timed(f"conv single bf16 {tag}", p_conv_single_bf16, feats, gidx, cin)

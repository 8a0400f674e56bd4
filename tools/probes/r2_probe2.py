"""Probe 2: gather-rate vs table size cliff; pair-concat bitrank windows
(single (1,10) row gathers); bf16 conv tables at late-stage shapes; sym-half
bitrank subm plan. Methodology as r2_bitrank_probe.py."""

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
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        s = float(f(*args))
        best = min(best, time.time() - t0)
    per = (best - RTT) / ITERS * 1000.0
    print(f"{name:38s} {per:8.2f} ms/iter   (compile {compile_s:.0f}s, "
          f"sink {s:.3g})", flush=True)
    return per


def perturb(s):
    return jnp.where(s > jnp.float32(1e30), 1, 0).astype(jnp.int32)


# ---- 1) gather rate vs table size: 1.62M random (1,16) f32 row gathers
def p_rate(table, idx0):
    def body(i, carry):
        idx = idx0 + perturb(carry)
        g = lax.gather(table, idx[:, None], _DN_ROW,
                       slice_sizes=(1, table.shape[1]), mode="clip")
        return jnp.float32(g.sum())
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


Q = 1_620_000
idx_np = rng.randint(0, 1 << 20, size=Q).astype(np.int32)
for mb in (2, 4, 8, 12, 16, 24, 32):
    rows = mb * (1 << 20) // 64
    table = jnp.asarray(rng.randn(rows, 16).astype(np.float32))
    idx = jnp.asarray(idx_np % rows)
    timed(f"1.62M (1,16)f32 gathers, {mb:3d}MB", p_rate, table, idx)

# int32 narrow rows at bitrank-like sizes
for mb, ncol in ((13, 5), (12, 9), (26, 10)):
    rows = mb * (1 << 20) // (4 * ncol)
    table = jnp.asarray(
        rng.randint(0, 1000, size=(rows, ncol)).astype(np.int32))
    idx = jnp.asarray(idx_np % rows)
    timed(f"1.62M (1,{ncol})i32 gathers, {mb:3d}MB", p_rate, table, idx)


# ---- 2) bf16 vs f32 conv gathers at late-stage shapes
def p_conv(feats, gidx, wts):
    n, cin = feats.shape
    k = 27

    def body(i, carry):
        f = feats + carry.astype(feats.dtype) * 1e-30
        padded = jnp.concatenate([f, jnp.zeros((1, cin), f.dtype)], 0)
        g = lax.gather(padded, gidx.reshape(-1, 1), _DN_ROW,
                       slice_sizes=(1, cin), mode="clip").reshape(k, -1, cin)
        out = jnp.einsum("knc,kcd->nd", g, wts,
                         preferred_element_type=jnp.float32)
        return jnp.float32(out.sum())
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


for nrows, ch in ((120_000, 16), (90_000, 32), (60_000, 64), (30_000, 128)):
    gidx = jnp.asarray(rng.randint(0, nrows, size=(27, nrows)).astype(np.int32))
    for dt in (np.float32, jnp.bfloat16):
        feats = jnp.asarray(rng.randn(nrows, ch).astype(np.float32)).astype(dt)
        wts = jnp.asarray(
            rng.randn(27, ch, ch).astype(np.float32) * 0.03).astype(dt)
        mb = nrows * ch * (4 if dt is np.float32 else 2) / 1e6
        timed(f"conv {nrows//1000}k x{ch} {np.dtype(dt).name[:8]:8s}"
              f" ({mb:.0f}MB)", p_conv, feats, gidx, wts)


# ---- 3) pair-concat bitrank: subm plan 27 taps via 9 (1,10) window gathers
def build_bitrank(keys, valid, cells):
    nblk = (cells + 127) // 128
    nwords = nblk * 4
    wslot = jnp.where(valid, keys >> 5, nwords)
    bit = jnp.where(valid, jnp.uint32(1) << (keys & 31).astype(jnp.uint32),
                    jnp.uint32(0))
    words = (jnp.zeros((nwords + 1,), jnp.uint32)
             .at[wslot].add(bit, mode="drop")[:nwords])
    wc = lax.population_count(words).astype(jnp.int32)
    blk = wc.reshape(nblk, 4).sum(-1)
    pre = jnp.cumsum(blk) - blk
    return jnp.concatenate(
        [pre[:, None],
         lax.bitcast_convert_type(words, jnp.int32).reshape(nblk, 4)], 1)


def finish(pre, w, q, q_ok, miss):
    j = q & 127
    jw = j >> 5
    jb = (j & 31).astype(jnp.uint32)
    iw = jnp.arange(4, dtype=jnp.int32)
    partial = (jnp.uint32(1) << jb) - jnp.uint32(1)
    mask = jnp.where(
        iw[None, :] < jw[:, None], jnp.uint32(0xFFFFFFFF),
        jnp.where(iw[None, :] == jw[:, None], partial[:, None],
                  jnp.uint32(0)))
    rank = pre + lax.population_count(w & mask).astype(jnp.int32).sum(-1)
    wsel = jnp.where(jw == 0, w[:, 0],
                     jnp.where(jw == 1, w[:, 1],
                               jnp.where(jw == 2, w[:, 2], w[:, 3])))
    hit = ((wsel >> jb) & jnp.uint32(1)).astype(bool)
    return jnp.where(q_ok & hit, rank, miss)


OFFS = np.stack(np.meshgrid(*[np.arange(-1, 2)] * 3, indexing="ij"),
                -1).reshape(-1, 3).astype(np.int32)

raw = rng.randint(0, CELLS, size=200_000, dtype=np.int64)
keys_np = np.sort(np.unique(raw)[:N]).astype(np.int32)
coords_np = np.stack([keys_np // (Y * X), (keys_np // X) % Y, keys_np % X],
                     -1).astype(np.int32)
coords0 = jnp.asarray(coords_np)
valid0 = jnp.ones((N,), bool)
zy_offs = jnp.asarray(OFFS[::3, :2])


def p_subm_pairwin(coords_in):
    def body(i, carry):
        coords = coords_in + perturb(carry)
        keys = (coords[:, 0] * Y + coords[:, 1]) * X + coords[:, 2]
        packed = build_bitrank(keys, valid0, CELLS)
        nblk = packed.shape[0]
        packed2 = jnp.concatenate(
            [packed, jnp.concatenate([packed[1:], packed[:1]], 0)], 1
        )  # (nblk, 10): blocks b and b+1
        zz = coords[:, None, 0] + zy_offs[None, :, 0]
        yy = coords[:, None, 1] + zy_offs[None, :, 1]
        gok = (zz >= 0) & (zz < Z) & (yy >= 0) & (yy < Y) & valid0[:, None]
        qc = (zz * Y + yy) * X + coords[:, None, 2]  # (N, 9)
        xs = coords[:, None, 2] + jnp.arange(-1, 2, dtype=jnp.int32)[None]
        xok = (xs >= 0) & (xs < X)
        ok3 = gok[..., None] & xok[:, None, :]  # (N,9,3)
        base = jnp.maximum((qc - 1) >> 7, 0)
        bidx = jnp.where(gok, base, nblk).reshape(-1)
        rows2 = lax.gather(packed2, bidx[:, None], _DN_ROW,
                           slice_sizes=(1, 10), mode="clip"
                           ).reshape(N, 9, 2, 5)
        q3 = qc[..., None] + jnp.arange(-1, 2, dtype=jnp.int32)
        sel = jnp.clip((q3 >> 7) - base[..., None], 0, 1)
        row = jnp.take_along_axis(rows2, sel[..., None], axis=2)
        pre = row[..., 0].reshape(-1)
        w = lax.bitcast_convert_type(
            row[..., 1:5].reshape(-1, 4), jnp.uint32)
        rows = finish(pre, w, q3.reshape(-1), ok3.reshape(-1), N)
        return jnp.float32(rows.sum())
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


timed("subm plan pair-window bitrank", p_subm_pairwin, coords0)


def p_subm_sym_bitrank(coords_in):
    """13 half-tap single lookups + inversion scatter for the mirror."""
    ar = jnp.arange(N, dtype=jnp.int32)
    offs = jnp.asarray(OFFS)

    def body(i, carry):
        coords = coords_in + perturb(carry)
        keys = (coords[:, 0] * Y + coords[:, 1]) * X + coords[:, 2]
        packed = build_bitrank(keys, valid0, CELLS)
        nblk = packed.shape[0]
        nbr = coords[:, None, :] + offs[None, :13]
        ok = ((nbr[..., 0] >= 0) & (nbr[..., 0] < Z)
              & (nbr[..., 1] >= 0) & (nbr[..., 1] < Y)
              & (nbr[..., 2] >= 0) & (nbr[..., 2] < X) & valid0[:, None])
        qkey = (nbr[..., 0] * Y + nbr[..., 1]) * X + nbr[..., 2]
        b = jnp.where(ok.reshape(-1), qkey.reshape(-1) >> 7, nblk)
        row = lax.gather(packed, b[:, None], _DN_ROW, slice_sizes=(1, 5),
                         mode="clip")
        rows = finish(row[:, 0],
                      lax.bitcast_convert_type(row[:, 1:5], jnp.uint32),
                      qkey.reshape(-1), ok.reshape(-1), N).reshape(N, 13)
        ident = jnp.where(valid0, ar, N)
        inv = jax.vmap(
            lambda r: jnp.full((N + 1,), N, jnp.int32).at[r].set(
                ar, mode="drop")[:N]
        )(rows.T)
        mirrored = inv.T[:, ::-1]
        full = jnp.concatenate([rows, ident[:, None], mirrored], 1)
        return jnp.float32(full.sum())
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


timed("subm plan sym-half bitrank", p_subm_sym_bitrank, coords0)

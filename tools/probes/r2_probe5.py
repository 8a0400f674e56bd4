"""Probe 5: word-major (lane-efficient) bitrank ALU. (Q,14)-shaped mask
tensors waste 114/128 vector lanes; restructure to (Q,)-shaped unrolled
steps. Also: raw (1,16)i32 rate at 11.84MB, offset_dims=(0,) gathers."""

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
_DN_ROW_T = lax.GatherDimensionNumbers(
    offset_dims=(0,), collapsed_slice_dims=(0,), start_index_map=(0,)
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
    print(f"{name:42s} {(best-RTT)/ITERS*1000:8.2f} ms/iter (compile {c:.0f}s,"
          f" sink {s:.3g})", flush=True)


def perturb(s):
    return jnp.where(s > jnp.float32(1e30), 1, 0).astype(jnp.int32)


# raw rates
nrows16 = 11_840_000 // 64
tbl16 = jnp.asarray(rng.randint(0, 99, size=(nrows16, 16)).astype(np.int32))
idxr = jnp.asarray(rng.randint(0, nrows16, size=1_620_000).astype(np.int32))


def make_rate(dn):
    def p_rate(table, idx0):
        def body(i, carry):
            idx = idx0 + perturb(carry)
            g = lax.gather(table, idx[:, None], dn,
                           slice_sizes=(1, table.shape[1]), mode="clip")
            return jnp.float32(g.sum())
        return lax.fori_loop(0, ITERS, body, jnp.float32(0))
    return p_rate


timed("1.62M (1,16)i32 @11.84MB out(Q,16)", make_rate(_DN_ROW), tbl16, idxr)
timed("1.62M (1,16)i32 @11.84MB out(16,Q)", make_rate(_DN_ROW_T), tbl16, idxr)


def make_subm(bc, out_t):
    """bc: cells per block (128 -> 5-col rows pad to 8; 448 -> 16-col)."""
    w_ = bc // 32
    ncol = 16 if bc == 448 else 8

    def build(keys, valid):
        nblk = (CELLS + bc - 1) // bc
        nwords = nblk * w_
        blk = keys // bc
        inblk = keys - blk * bc
        wslot = jnp.where(valid, blk * w_ + (inblk >> 5), nwords)
        bit = jnp.where(valid,
                        jnp.uint32(1) << (inblk & 31).astype(jnp.uint32),
                        jnp.uint32(0))
        words = (jnp.zeros((nwords + 1,), jnp.uint32)
                 .at[wslot].add(bit, mode="drop")[:nwords])
        wc = lax.population_count(words).astype(jnp.int32)
        bsum = wc.reshape(nblk, w_).sum(-1)
        pre = jnp.cumsum(bsum) - bsum
        return jnp.concatenate(
            [pre[:, None],
             lax.bitcast_convert_type(words, jnp.int32).reshape(nblk, w_),
             jnp.zeros((nblk, ncol - 1 - w_), jnp.int32)], 1)

    def lookup(packed, q, q_ok, miss):
        nblk = packed.shape[0]
        blk = q // bc
        b = jnp.where(q_ok, blk, nblk)
        if out_t:
            row = lax.gather(packed, b[:, None], _DN_ROW_T,
                             slice_sizes=(1, ncol), mode="clip")  # (ncol, Q)
        else:
            row = lax.gather(packed, b[:, None], _DN_ROW,
                             slice_sizes=(1, ncol), mode="clip").T
        pre = row[0]
        j = q - blk * bc
        jw = j >> 5
        jb = (j & 31).astype(jnp.uint32)
        partial = (jnp.uint32(1) << jb) - jnp.uint32(1)
        rank = pre
        hit_word = jnp.uint32(0)
        for i in range(w_):
            wi = lax.bitcast_convert_type(row[1 + i], jnp.uint32)  # (Q,)
            mask = jnp.where(jw > i, jnp.uint32(0xFFFFFFFF),
                             jnp.where(jw == i, partial, jnp.uint32(0)))
            rank = rank + lax.population_count(
                wi & mask).astype(jnp.int32)
            hit_word = jnp.where(jw == i, wi, hit_word)
        hit = ((hit_word >> jb) & jnp.uint32(1)).astype(bool)
        return jnp.where(q_ok & hit, rank, miss)

    return build, lookup


OFFS = np.stack(np.meshgrid(*[np.arange(-1, 2)] * 3, indexing="ij"),
                -1).reshape(-1, 3).astype(np.int32)
offs_j = jnp.asarray(OFFS)

raw = rng.randint(0, CELLS, size=200_000, dtype=np.int64)
keys_np = np.sort(np.unique(raw)[:N]).astype(np.int32)
coords_np = np.stack([keys_np // (Y * X), (keys_np // X) % Y, keys_np % X],
                     -1).astype(np.int32)
coords0 = jnp.asarray(coords_np)
valid0 = jnp.ones((N,), bool)


def make_p(bc, out_t):
    build, lookup = make_subm(bc, out_t)

    def p(coords_in):
        def body(i, carry):
            coords = coords_in + perturb(carry)
            keys = (coords[:, 0] * Y + coords[:, 1]) * X + coords[:, 2]
            packed = build(keys, valid0)
            nbr = coords[:, None, :] + offs_j[None]
            ok = ((nbr[..., 0] >= 0) & (nbr[..., 0] < Z)
                  & (nbr[..., 1] >= 0) & (nbr[..., 1] < Y)
                  & (nbr[..., 2] >= 0) & (nbr[..., 2] < X)
                  & valid0[:, None])
            qkey = (nbr[..., 0] * Y + nbr[..., 1]) * X + nbr[..., 2]
            rows = lookup(packed, qkey.reshape(-1), ok.reshape(-1), N)
            return jnp.float32(rows.sum())
        return lax.fori_loop(0, ITERS, body, jnp.float32(0))
    return p


timed("subm27 448 word-major outT", make_p(448, True), coords0)
timed("subm27 448 word-major outQ16+T", make_p(448, False), coords0)
timed("subm27 128(pad8) word-major outT", make_p(128, True), coords0)

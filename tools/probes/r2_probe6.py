"""Probe 6: isolate the subm-plan ALU cost. Suspects: integer div by 448;
the 14-word popcount chain. Variant: 512-cell blocks (pure shifts), split
words (nblk,16)/pre (nblk,) tables."""

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
    c = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        s = float(f(*args))
        best = min(best, time.time() - t0)
    print(f"{name:44s} {(best-RTT)/ITERS*1000:8.2f} ms/iter (compile {c:.0f}s,"
          f" sink {s:.3g})", flush=True)


def perturb(s):
    return jnp.where(s > jnp.float32(1e30), 1, 0).astype(jnp.int32)


q_np = rng.randint(0, CELLS, size=3_240_000).astype(np.int32)
q0 = jnp.asarray(q_np)


def p_div448(qq):
    def body(i, carry):
        q = qq + perturb(carry)
        blk = q // 448
        j = q - blk * 448
        return jnp.float32(blk.sum() + j.sum())
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


timed("3.24M int div 448", p_div448, q0)


def p_popchain(qq):
    """14-word popcount/select chain on (Q,) vectors, no gathers."""
    def body(i, carry):
        q = qq + perturb(carry)
        jw = (q >> 5) & 15
        jb = (q & 31).astype(jnp.uint32)
        partial = (jnp.uint32(1) << jb) - jnp.uint32(1)
        rank = q * 0
        hit_word = jnp.uint32(0)
        for k in range(14):
            wi = (q + k).astype(jnp.uint32)
            mask = jnp.where(jw > k, jnp.uint32(0xFFFFFFFF),
                             jnp.where(jw == k, partial, jnp.uint32(0)))
            rank = rank + lax.population_count(wi & mask).astype(jnp.int32)
            hit_word = jnp.where(jw == k, wi, hit_word)
        hit = ((hit_word >> jb) & jnp.uint32(1)).astype(bool)
        return jnp.float32(jnp.where(hit, rank, 0).sum())
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


timed("3.24M 14-word popcount chain (no gather)", p_popchain, q0)


# 512-cell blocks: split tables, all-shift indexing
def build512(keys, valid):
    nblk = (CELLS + 511) // 512
    nwords = nblk * 16
    wslot = jnp.where(valid, keys >> 5, nwords)
    bit = jnp.where(valid, jnp.uint32(1) << (keys & 31).astype(jnp.uint32),
                    jnp.uint32(0))
    words = (jnp.zeros((nwords + 1,), jnp.uint32)
             .at[wslot].add(bit, mode="drop")[:nwords])
    wc = lax.population_count(words).astype(jnp.int32)
    bsum = wc.reshape(nblk, 16).sum(-1)
    pre = jnp.cumsum(bsum) - bsum
    return (lax.bitcast_convert_type(words, jnp.int32).reshape(nblk, 16),
            pre)


def lookup512(wtbl, pre, q, q_ok, miss):
    nblk = wtbl.shape[0]
    blk = q >> 9
    b = jnp.where(q_ok, blk, nblk)
    row = lax.gather(wtbl, b[:, None], _DN_ROW, slice_sizes=(1, 16),
                     mode="clip").T  # (16, Q)
    pr = jnp.concatenate([pre, jnp.zeros((1,), jnp.int32)])[b]
    jw = (q >> 5) & 15
    jb = (q & 31).astype(jnp.uint32)
    partial = (jnp.uint32(1) << jb) - jnp.uint32(1)
    rank = pr
    hit_word = jnp.uint32(0)
    for i in range(16):
        wi = lax.bitcast_convert_type(row[i], jnp.uint32)
        mask = jnp.where(jw > i, jnp.uint32(0xFFFFFFFF),
                         jnp.where(jw == i, partial, jnp.uint32(0)))
        rank = rank + lax.population_count(wi & mask).astype(jnp.int32)
        hit_word = jnp.where(jw == i, wi, hit_word)
    hit = ((hit_word >> jb) & jnp.uint32(1)).astype(bool)
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


def p_subm512(coords_in):
    def body(i, carry):
        coords = coords_in + perturb(carry)
        keys = (coords[:, 0] * Y + coords[:, 1]) * X + coords[:, 2]
        wtbl, pre = build512(keys, valid0)
        nbr = coords[:, None, :] + offs_j[None]
        ok = ((nbr[..., 0] >= 0) & (nbr[..., 0] < Z)
              & (nbr[..., 1] >= 0) & (nbr[..., 1] < Y)
              & (nbr[..., 2] >= 0) & (nbr[..., 2] < X) & valid0[:, None])
        qkey = (nbr[..., 0] * Y + nbr[..., 1]) * X + nbr[..., 2]
        rows = lookup512(wtbl, pre, qkey.reshape(-1), ok.reshape(-1), N)
        return jnp.float32(rows.sum())
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


timed("subm27 512-split all-shift", p_subm512, coords0)

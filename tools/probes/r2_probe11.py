"""Probe 11: 448-block table, (16,Q)-output gather (+/- barrier), finish
consuming contiguous (Q,) slices. Hypothesis: earlier 448 failures were
fusion re-materializing the gather per consumed column."""
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
BC, W = 448, 14
NBLK = (CELLS + BC - 1) // BC
_DN_T = lax.GatherDimensionNumbers(
    offset_dims=(0,), collapsed_slice_dims=(0,), start_index_map=(0,))
rng = np.random.RandomState(0)
_f0 = jax.jit(lambda x: x + 1.0)
float(_f0(jnp.float32(1)))
RTT = 1e9
for _ in range(5):
    t0 = time.time(); float(_f0(jnp.float32(1))); RTT = min(RTT, time.time()-t0)
print(f"RTT = {RTT*1000:.1f} ms", flush=True)

def timed(name, fn, *args):
    f = jax.jit(fn)
    t0 = time.time(); s = float(f(*args)); c = time.time()-t0
    best = 1e9
    for _ in range(3):
        t0 = time.time(); s = float(f(*args)); best = min(best, time.time()-t0)
    print(f"{name:46s} {(best-RTT)/ITERS*1000:8.2f} ms/iter (compile {c:.0f}s,"
          f" sink {s:.3g})", flush=True)

def perturb(s):
    return jnp.where(s > jnp.float32(1e30), 1, 0).astype(jnp.int32)

def build448(keys, valid):
    nwords = NBLK * W
    blk = keys // BC
    inblk = keys - blk * BC
    wslot = jnp.where(valid, blk * W + (inblk >> 5), nwords)
    bit = jnp.where(valid, jnp.uint32(1) << (inblk & 31).astype(jnp.uint32),
                    jnp.uint32(0))
    words = (jnp.zeros((nwords + 1,), jnp.uint32)
             .at[wslot].add(bit, mode="drop")[:nwords])
    wc = lax.population_count(words).astype(jnp.int32)
    bsum = wc.reshape(NBLK, W).sum(-1)
    pre = jnp.cumsum(bsum) - bsum
    return jnp.concatenate(
        [pre[:, None],
         lax.bitcast_convert_type(words, jnp.int32).reshape(NBLK, W),
         jnp.zeros((NBLK, 1), jnp.int32)], 1)

def lookup448T(packed, q, q_ok, miss, barrier):
    blk = q // BC
    b = jnp.where(q_ok, blk, NBLK)
    row = lax.gather(packed, b[:, None], _DN_T, slice_sizes=(1, 16),
                     mode="clip")  # (16, Q)
    if barrier:
        row = lax.optimization_barrier(row)
    j = q - blk * BC
    jw = j >> 5
    jb = (j & 31).astype(jnp.uint32)
    partial = (jnp.uint32(1) << jb) - jnp.uint32(1)
    rank = row[0]
    hw = jnp.uint32(0)
    for i in range(W):
        wi = lax.bitcast_convert_type(row[1 + i], jnp.uint32)
        mask = jnp.where(jw > i, jnp.uint32(0xFFFFFFFF),
                         jnp.where(jw == i, partial, jnp.uint32(0)))
        rank = rank + lax.population_count(wi & mask).astype(jnp.int32)
        hw = jnp.where(jw == i, wi, hw)
    hit = ((hw >> jb) & jnp.uint32(1)).astype(bool)
    return jnp.where(q_ok & hit, rank, miss)

raw = rng.randint(0, CELLS, size=200_000, dtype=np.int64)
keys_np = np.sort(np.unique(raw)[:N]).astype(np.int32)
coords_np = np.stack([keys_np // (Y*X), (keys_np // X) % Y, keys_np % X],
                     -1).astype(np.int32)
coords0 = jnp.asarray(coords_np)
valid0 = jnp.ones((N,), bool)
OFFS = [(dz, dy, dx) for dz in (-1, 0, 1) for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)]

def make_subm(barrier):
    def p(coords_in):
        def body(i, carry):
            coords = coords_in + perturb(carry)
            keys = (coords[:, 0] * Y + coords[:, 1]) * X + coords[:, 2]
            packed = build448(keys, valid0)
            cz, cy, cx = coords[:, 0], coords[:, 1], coords[:, 2]
            qs, oks = [], []
            for dz, dy, dx in OFFS:
                ok_t = valid0
                if dz: ok_t = ok_t & (cz + dz >= 0) & (cz + dz < Z)
                if dy: ok_t = ok_t & (cy + dy >= 0) & (cy + dy < Y)
                if dx: ok_t = ok_t & (cx + dx >= 0) & (cx + dx < X)
                qs.append(keys + ((dz * Y + dy) * X + dx))
                oks.append(ok_t)
            q = jnp.stack(qs).reshape(-1)
            ok = jnp.stack(oks).reshape(-1)
            rows = lookup448T(packed, q, ok, N, barrier)
            return jnp.float32(rows.sum())
        return lax.fori_loop(0, ITERS, body, jnp.float32(0))
    return p

timed("subm27 448 outT barrier", make_subm(True), coords0)
timed("subm27 448 outT no-barrier", make_subm(False), coords0)

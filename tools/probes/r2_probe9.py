"""Probe 9: word-granular prefix design — 2 narrow gathers per query,
no wide-row consumption. Plus diagnostics: (1,)i32 gather rate, transpose."""
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
NWORDS = (CELLS + 31) // 32
_DN1 = lax.GatherDimensionNumbers(
    offset_dims=(), collapsed_slice_dims=(0,), start_index_map=(0,))
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

# diag 1: (1,) i32 gathers from 10.4MB
flat = jnp.asarray(rng.randint(0, 99, size=(NWORDS + 1,)).astype(np.int32))
idx0 = jnp.asarray(rng.randint(0, NWORDS, size=3_240_000).astype(np.int32))

def p_rate1(tbl, ii):
    def body(i, carry):
        idx = ii + perturb(carry)
        g = tbl[idx]
        return jnp.float32(g.sum())
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))

timed("3.24M (1,)i32 gathers @10.4MB", p_rate1, flat, idx0)

# diag 2: transpose (3.24M,16) -> (16, 3.24M)
big = jnp.asarray(rng.randint(0, 9, size=(3_240_000, 16)).astype(np.int32))
def p_transpose(bb):
    def body(i, carry):
        t = (bb + perturb(carry)).T
        return jnp.float32(t.sum())
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))
timed("transpose (3.24M,16)->T", p_transpose, big)

# full subm27 with pre32 design
OFFS = np.stack(np.meshgrid(*[np.arange(-1, 2)]*3, indexing="ij"),
                -1).reshape(-1, 3).astype(np.int32)
offs_j = jnp.asarray(OFFS)
raw = rng.randint(0, CELLS, size=200_000, dtype=np.int64)
keys_np = np.sort(np.unique(raw)[:N]).astype(np.int32)
coords_np = np.stack([keys_np // (Y*X), (keys_np // X) % Y, keys_np % X],
                     -1).astype(np.int32)
coords0 = jnp.asarray(coords_np)
valid0 = jnp.ones((N,), bool)

def build_pre32(keys, valid):
    wslot = jnp.where(valid, keys >> 5, NWORDS)
    bit = jnp.where(valid, jnp.uint32(1) << (keys & 31).astype(jnp.uint32),
                    jnp.uint32(0))
    words = (jnp.zeros((NWORDS + 1,), jnp.uint32)
             .at[wslot].add(bit, mode="drop")[:NWORDS])
    wc = lax.population_count(words).astype(jnp.int32)
    pre = jnp.cumsum(wc) - wc  # exclusive, word-granular
    return words, pre

def p_subm27_pre32(coords_in):
    def body(i, carry):
        coords = coords_in + perturb(carry)
        keys = (coords[:, 0] * Y + coords[:, 1]) * X + coords[:, 2]
        words, pre = build_pre32(keys, valid0)
        wordsp = jnp.concatenate([words, jnp.zeros((1,), jnp.uint32)])
        prep = jnp.concatenate([pre, jnp.zeros((1,), jnp.int32)])
        nbr = coords[:, None, :] + offs_j[None]
        ok = ((nbr[..., 0] >= 0) & (nbr[..., 0] < Z)
              & (nbr[..., 1] >= 0) & (nbr[..., 1] < Y)
              & (nbr[..., 2] >= 0) & (nbr[..., 2] < X) & valid0[:, None])
        qkey = (nbr[..., 0] * Y + nbr[..., 1]) * X + nbr[..., 2]
        q = qkey.reshape(-1)
        okf = ok.reshape(-1)
        wslot = jnp.where(okf, q >> 5, NWORDS)
        w = wordsp[wslot]
        p = prep[wslot]
        jb = (q & 31).astype(jnp.uint32)
        partial = (jnp.uint32(1) << jb) - jnp.uint32(1)
        rank = p + lax.population_count(w & partial).astype(jnp.int32)
        hit = ((w >> jb) & jnp.uint32(1)).astype(bool)
        rows = jnp.where(okf & hit, rank, N)
        return jnp.float32(rows.sum())
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))

timed("subm27 pre32 2-gather", p_subm27_pre32, coords0)

def p_subm27_pre32_interleaved(coords_in):
    """(nwords,2) [word, pre] interleaved: ONE 8B-row gather @20.7MB."""
    dn2 = lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
    def body(i, carry):
        coords = coords_in + perturb(carry)
        keys = (coords[:, 0] * Y + coords[:, 1]) * X + coords[:, 2]
        words, pre = build_pre32(keys, valid0)
        tbl = jnp.stack(
            [lax.bitcast_convert_type(words, jnp.int32), pre], -1)
        nbr = coords[:, None, :] + offs_j[None]
        ok = ((nbr[..., 0] >= 0) & (nbr[..., 0] < Z)
              & (nbr[..., 1] >= 0) & (nbr[..., 1] < Y)
              & (nbr[..., 2] >= 0) & (nbr[..., 2] < X) & valid0[:, None])
        qkey = (nbr[..., 0] * Y + nbr[..., 1]) * X + nbr[..., 2]
        q = qkey.reshape(-1)
        okf = ok.reshape(-1)
        wslot = jnp.where(okf, q >> 5, NWORDS)
        row = lax.gather(tbl, wslot[:, None], dn2, slice_sizes=(1, 2),
                         mode="clip")
        w = lax.bitcast_convert_type(row[:, 0], jnp.uint32)
        p = row[:, 1]
        jb = (q & 31).astype(jnp.uint32)
        partial = (jnp.uint32(1) << jb) - jnp.uint32(1)
        rank = p + lax.population_count(w & partial).astype(jnp.int32)
        hit = ((w >> jb) & jnp.uint32(1)).astype(bool)
        rows = jnp.where(okf & hit, rank, N)
        return jnp.float32(rows.sum())
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))

timed("subm27 pre32 interleaved 1-gather", p_subm27_pre32_interleaved,
      coords0)

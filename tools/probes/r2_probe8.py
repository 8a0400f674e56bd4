"""Probe 8: optimization_barrier between gather and popcount finish."""
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
    offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
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

nblk = (CELLS + 511) // 512
wtbl = jnp.asarray(rng.randint(0, 9, size=(nblk + 1, 16)).astype(np.int32))
raw = rng.randint(0, CELLS, size=200_000, dtype=np.int64)
keys_np = np.sort(np.unique(raw)[:N]).astype(np.int32)
coords_np = np.stack([keys_np // (Y*X), (keys_np // X) % Y, keys_np % X],
                     -1).astype(np.int32)
coords0 = jnp.asarray(coords_np)
valid0 = jnp.ones((N,), bool)
OFFS = np.stack(np.meshgrid(*[np.arange(-1, 2)]*3, indexing="ij"),
                -1).reshape(-1, 3).astype(np.int32)
offs_j = jnp.asarray(OFFS)

def build512(keys, valid):
    nw = nblk * 16
    wslot = jnp.where(valid, keys >> 5, nw)
    bit = jnp.where(valid, jnp.uint32(1) << (keys & 31).astype(jnp.uint32),
                    jnp.uint32(0))
    words = (jnp.zeros((nw + 1,), jnp.uint32)
             .at[wslot].add(bit, mode="drop")[:nw])
    wc = lax.population_count(words).astype(jnp.int32)
    bsum = wc.reshape(nblk, 16).sum(-1)
    pre = jnp.cumsum(bsum) - bsum
    return (lax.bitcast_convert_type(words, jnp.int32).reshape(nblk, 16), pre)

def p_subm512_barrier(coords_in):
    def body(i, carry):
        coords = coords_in + perturb(carry)
        keys = (coords[:, 0] * Y + coords[:, 1]) * X + coords[:, 2]
        wt, pre = build512(keys, valid0)
        nbr = coords[:, None, :] + offs_j[None]
        ok = ((nbr[..., 0] >= 0) & (nbr[..., 0] < Z)
              & (nbr[..., 1] >= 0) & (nbr[..., 1] < Y)
              & (nbr[..., 2] >= 0) & (nbr[..., 2] < X) & valid0[:, None])
        qkey = (nbr[..., 0] * Y + nbr[..., 1]) * X + nbr[..., 2]
        q = qkey.reshape(-1)
        blk = q >> 9
        b = jnp.where(ok.reshape(-1), blk, nblk)
        row = lax.gather(wt, b[:, None], _DN_ROW, slice_sizes=(1, 16),
                         mode="clip")
        pr = jnp.concatenate([pre, jnp.zeros((1,), jnp.int32)])[b]
        row, pr = lax.optimization_barrier((row, pr))
        row = row.T
        jw = (q >> 5) & 15
        jb = (q & 31).astype(jnp.uint32)
        partial = (jnp.uint32(1) << jb) - jnp.uint32(1)
        rank = pr
        hw = jnp.uint32(0)
        for k in range(16):
            wi = lax.bitcast_convert_type(row[k], jnp.uint32)
            mask = jnp.where(jw > k, jnp.uint32(0xFFFFFFFF),
                             jnp.where(jw == k, partial, jnp.uint32(0)))
            rank = rank + lax.population_count(wi & mask).astype(jnp.int32)
            hw = jnp.where(jw == k, wi, hw)
        hit = ((hw >> jb) & jnp.uint32(1)).astype(bool)
        rows = jnp.where(ok.reshape(-1) & hit, rank, N)
        return jnp.float32(rows.sum())
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))

timed("subm27 512-split + barrier", p_subm512_barrier, coords0)

def p_down_barrier(coords_in, max_out=90_000):
    oz, oy, ox = (Z+2-3)//2+1, (Y+2-3)//2+1, (X+2-3)//2+1
    cells_out = oz*oy*ox
    nblk_o = (cells_out + 511) // 512
    cand_offs = jnp.asarray(np.stack(np.meshgrid(*[np.arange(2)]*3,
                    indexing="ij"), -1).reshape(-1, 3).astype(np.int32))
    imax = jnp.iinfo(jnp.int32).max
    def body(i, carry):
        coords = coords_in + perturb(carry)
        top = coords + 1
        o0 = top // 2
        cand = o0[:, None, :] - cand_offs[None]
        resid = top[:, None, :] - cand*2
        ok = ((resid >= 0).all(-1) & (resid < 3).all(-1) & (cand >= 0).all(-1)
              & (cand[..., 0] < oz) & (cand[..., 1] < oy) & (cand[..., 2] < ox)
              & valid0[:, None])
        cand_key = (cand[..., 0]*oy + cand[..., 1])*ox + cand[..., 2]
        cand_key = jnp.where(ok, cand_key, imax).reshape(-1)
        live0 = cand_key != imax
        nw = nblk_o * 16
        wslot = jnp.where(live0, cand_key >> 5, nw)
        bit = jnp.where(live0, jnp.uint32(1) << (cand_key & 31).astype(jnp.uint32),
                        jnp.uint32(0))
        # duplicate candidates would double-count bits -> use byte occ
        occ = jnp.zeros((nw*32 + 1,), bool).at[
            jnp.where(live0, cand_key, nw*32)].set(True, mode="drop")[:-1]
        bitvals = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None]
        words = (occ.reshape(-1, 32).astype(jnp.uint32) * bitvals).sum(
            -1, dtype=jnp.uint32)
        wc = lax.population_count(words).astype(jnp.int32)
        bsum = wc.reshape(nblk_o, 16).sum(-1)
        pre = jnp.cumsum(bsum) - bsum
        wt = lax.bitcast_convert_type(words, jnp.int32).reshape(nblk_o, 16)
        q = jnp.minimum(cand_key, cells_out - 1)
        blk = q >> 9
        b = jnp.where(live0, blk, nblk_o)
        row = lax.gather(jnp.concatenate([wt, jnp.zeros((1,16),jnp.int32)],0),
                         b[:, None], _DN_ROW, slice_sizes=(1, 16), mode="clip")
        pr = jnp.concatenate([pre, jnp.zeros((1,), jnp.int32)])[b]
        row, pr = lax.optimization_barrier((row, pr))
        row = row.T
        jw = (q >> 5) & 15
        jb = (q & 31).astype(jnp.uint32)
        partial = (jnp.uint32(1) << jb) - jnp.uint32(1)
        rank = pr
        for k in range(16):
            wi = lax.bitcast_convert_type(row[k], jnp.uint32)
            mask = jnp.where(jw > k, jnp.uint32(0xFFFFFFFF),
                             jnp.where(jw == k, partial, jnp.uint32(0)))
            rank = rank + lax.population_count(wi & mask).astype(jnp.int32)
        live = live0 & (rank < max_out)
        slot = jnp.where(live, rank, max_out)
        out_key = jnp.full((max_out+1,), imax, jnp.int32).at[slot].set(
            cand_key, mode="drop")[:max_out]
        tap = ((resid[...,0]*3 + resid[...,1])*3 + resid[...,2]).reshape(-1)
        flat_pos = jnp.where(live, slot*27 + jnp.clip(tap, 0, 26), max_out*27)
        rows_src = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.int32)[:, None], (N, 8)).reshape(-1)
        gidx = jnp.full((max_out*27+1,), N, jnp.int32).at[flat_pos].set(
            rows_src, mode="drop")[:-1]
        return jnp.float32(gidx.sum()) + jnp.float32(out_key.sum())
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))

timed("downplan 512-split + barrier", p_down_barrier, coords0)

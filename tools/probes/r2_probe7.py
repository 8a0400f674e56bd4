"""Probe 7: why is the fused subm graph 10x slower than its parts?
Isolate: gather with precomputed clustered indices; gather with in-graph
index computation; +/- optimization_barrier; build-in-loop vs build-out."""

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
    print(f"{name:46s} {(best-RTT)/ITERS*1000:8.2f} ms/iter (compile {c:.0f}s,"
          f" sink {s:.3g})", flush=True)


def perturb(s):
    return jnp.where(s > jnp.float32(1e30), 1, 0).astype(jnp.int32)


nblk = (CELLS + 511) // 512
wtbl = jnp.asarray(rng.randint(0, 9, size=(nblk + 1, 16)).astype(np.int32))

raw = rng.randint(0, CELLS, size=200_000, dtype=np.int64)
keys_np = np.sort(np.unique(raw)[:N]).astype(np.int32)
coords_np = np.stack([keys_np // (Y * X), (keys_np // X) % Y, keys_np % X],
                     -1).astype(np.int32)
coords0 = jnp.asarray(coords_np)
valid0 = jnp.ones((N,), bool)
OFFS = np.stack(np.meshgrid(*[np.arange(-1, 2)] * 3, indexing="ij"),
                -1).reshape(-1, 3).astype(np.int32)
offs_j = jnp.asarray(OFFS)

# clustered real blocks precomputed
nbr0 = coords_np[:, None, :] + OFFS[None]
q0_np = ((nbr0[..., 0] * Y + nbr0[..., 1]) * X + nbr0[..., 2]).reshape(-1)
b0_np = np.clip(q0_np >> 9, 0, nblk).astype(np.int32)
b0 = jnp.asarray(b0_np)


def p_gather_pre(b_in):
    def body(i, carry):
        b = b_in + perturb(carry)
        g = lax.gather(wtbl, b[:, None], _DN_ROW, slice_sizes=(1, 16),
                       mode="clip")
        return jnp.float32(g.sum())
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


timed("3.24M gather, precomputed clustered idx", p_gather_pre, b0)


def p_gather_ingraph(coords_in):
    def body(i, carry):
        coords = coords_in + perturb(carry)
        nbr = coords[:, None, :] + offs_j[None]
        ok = ((nbr[..., 0] >= 0) & (nbr[..., 0] < Z)
              & (nbr[..., 1] >= 0) & (nbr[..., 1] < Y)
              & (nbr[..., 2] >= 0) & (nbr[..., 2] < X) & valid0[:, None])
        qkey = (nbr[..., 0] * Y + nbr[..., 1]) * X + nbr[..., 2]
        b = jnp.where(ok, qkey >> 9, nblk).reshape(-1)
        g = lax.gather(wtbl, b[:, None], _DN_ROW, slice_sizes=(1, 16),
                       mode="clip")
        return jnp.float32(g.sum())
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


timed("3.24M gather, in-graph idx chain", p_gather_ingraph, coords0)


def p_gather_ingraph_barrier(coords_in):
    def body(i, carry):
        coords = coords_in + perturb(carry)
        nbr = coords[:, None, :] + offs_j[None]
        ok = ((nbr[..., 0] >= 0) & (nbr[..., 0] < Z)
              & (nbr[..., 1] >= 0) & (nbr[..., 1] < Y)
              & (nbr[..., 2] >= 0) & (nbr[..., 2] < X) & valid0[:, None])
        qkey = (nbr[..., 0] * Y + nbr[..., 1]) * X + nbr[..., 2]
        b = jnp.where(ok, qkey >> 9, nblk).reshape(-1)
        b = lax.optimization_barrier(b)
        g = lax.gather(wtbl, b[:, None], _DN_ROW, slice_sizes=(1, 16),
                       mode="clip")
        return jnp.float32(g.sum())
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


timed("3.24M gather, in-graph idx + barrier", p_gather_ingraph_barrier,
      coords0)


def p_gather_pre_finish(b_in, q_in):
    """precomputed idx gather + the full popcount finish (fused consumer)."""
    def body(i, carry):
        b = b_in + perturb(carry)
        q = q_in + perturb(carry)
        row = lax.gather(wtbl, b[:, None], _DN_ROW, slice_sizes=(1, 16),
                         mode="clip").T
        jw = (q >> 5) & 15
        jb = (q & 31).astype(jnp.uint32)
        partial = (jnp.uint32(1) << jb) - jnp.uint32(1)
        rank = q * 0
        hit_word = jnp.uint32(0)
        for k in range(16):
            wi = lax.bitcast_convert_type(row[k], jnp.uint32)
            mask = jnp.where(jw > k, jnp.uint32(0xFFFFFFFF),
                             jnp.where(jw == k, partial, jnp.uint32(0)))
            rank = rank + lax.population_count(wi & mask).astype(jnp.int32)
            hit_word = jnp.where(jw == k, wi, hit_word)
        hit = ((hit_word >> jb) & jnp.uint32(1)).astype(bool)
        return jnp.float32(jnp.where(hit, rank, 0).sum())
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


q0j = jnp.asarray(np.maximum(q0_np, 0).astype(np.int32))
timed("3.24M gather+finish, precomputed idx", p_gather_pre_finish, b0, q0j)

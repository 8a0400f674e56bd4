"""Probe 12: bisect production build_subm_plan vs probe11 inline impl in the
SAME harness (scalar carry, full-output sum)."""
import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

ITERS = 8
N = 120_000
GRID = (40, 1440, 1440)
Z, Y, X = GRID
CELLS = Z * Y * X
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

raw = rng.randint(0, CELLS, size=200_000, dtype=np.int64)
keys_np = np.sort(np.unique(raw)[:N]).astype(np.int32)
coords_np = np.stack([keys_np // (Y*X), (keys_np // X) % Y, keys_np % X],
                     -1).astype(np.int32)
coords0 = jnp.asarray(coords_np)

from df3d.ops.sparse import SparseTensor, build_subm_plan

def p_production(coords_in):
    feats = jnp.zeros((1, N, 16))
    def body(i, carry):
        coords = coords_in + perturb(carry)
        st = SparseTensor(feats, coords[None], GRID, rows_sorted=True)
        p = build_subm_plan(st, 3)
        return jnp.float32(p.gather_idx.sum())
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))

timed("production build_subm_plan fullsum", p_production, coords0)

def p_production_dce(coords_in):
    feats = jnp.zeros((1, N, 16))
    def body(i, carry):
        coords = coords_in + perturb(carry)
        st = SparseTensor(feats, coords[None], GRID, rows_sorted=True)
        p = build_subm_plan(st, 3)
        return jnp.float32(p.gather_idx[0, 0, 0])
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))

timed("production build_subm_plan [0,0,0]", p_production_dce, coords0)

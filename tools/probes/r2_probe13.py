"""Probe 13: locate prod-vs-inline gap. Variants of the subm build:
A) production as-is  B) +barrier before 2D assembly  C) flat-only."""
import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from df3d.ops import keytable

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
valid0 = jnp.ones((N,), bool)
OFFS = [(dz, dy, dx) for dz in (-1, 0, 1) for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)]
CENTER = 13
ar = jnp.arange(N, dtype=jnp.int32)

def subm_core(coords, assemble):
    keys0 = (coords[:, 0] * Y + coords[:, 1]) * X + coords[:, 2]
    keys = jnp.where(valid0, keys0, jnp.iinfo(jnp.int32).max)
    packed = keytable.pack_keys(keys, valid0, CELLS)
    cz, cy, cx = coords[:, 0], coords[:, 1], coords[:, 2]
    qs, oks = [], []
    for t, (dz, dy, dx) in enumerate(OFFS):
        if t == CENTER:
            continue
        ok_t = valid0
        if dz: ok_t = ok_t & (cz + dz >= 0) & (cz + dz < Z)
        if dy: ok_t = ok_t & (cy + dy >= 0) & (cy + dy < Y)
        if dx: ok_t = ok_t & (cx + dx >= 0) & (cx + dx < X)
        qs.append(keys + ((dz * Y + dy) * X + dx))
        oks.append(ok_t)
    q = jnp.stack(qs).reshape(-1)
    ok = jnp.stack(oks).reshape(-1)
    rows = keytable.lookup(packed, q, ok, N)
    if assemble == "flat":
        return rows
    if assemble == "barrier":
        rows = lax.optimization_barrier(rows)
    rows = rows.reshape(26, N)
    ident = jnp.where(valid0, ar, N)[None]
    return jnp.concatenate([rows[:CENTER], ident, rows[CENTER:]], 0)

def make(assemble):
    def p(coords_in):
        def body(i, carry):
            coords = coords_in + perturb(carry)
            out = subm_core(coords, assemble)
            return jnp.float32(out.sum())
        return lax.fori_loop(0, ITERS, body, jnp.float32(0))
    return p

timed("prod-equivalent (2d assembly)", make("2d"), coords0)
timed("prod + barrier before assembly", make("barrier"), coords0)
timed("prod flat (no assembly)", make("flat"), coords0)

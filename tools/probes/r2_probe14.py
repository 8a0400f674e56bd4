"""Probe 14: down-plan (k3 s2) component breakdown at st1->st2 scale."""
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
OZ, OY, OX = 20, 720, 720
CELLS_OUT = OZ * OY * OX
MAX_OUT = 90_000
IMAX = jnp.iinfo(jnp.int32).max
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
    print(f"{name:40s} {(best-RTT)/ITERS*1000:8.2f} ms/iter (compile {c:.0f}s,"
          f" sink {s:.3g})", flush=True)

def perturb(s):
    return jnp.where(s > jnp.float32(1e30), 1, 0).astype(jnp.int32)

raw = rng.randint(0, Z*Y*X, size=200_000, dtype=np.int64)
keys_np = np.sort(np.unique(raw)[:N]).astype(np.int32)
coords_np = np.stack([keys_np // (Y*X), (keys_np // X) % Y, keys_np % X],
                     -1).astype(np.int32)
coords0 = jnp.asarray(coords_np)
valid0 = jnp.ones((N,), bool)
CAND = [(az, ay, ax) for az in range(2) for ay in range(2) for ax in range(2)]

def stage(coords, upto):
    tz = coords[:, 0] + 1
    ty = coords[:, 1] + 1
    tx = coords[:, 2] + 1
    o0z, o0y, o0x = tz >> 1, ty >> 1, tx >> 1
    ckeys, taps = [], []
    for az, ay, ax in CAND:
        co_z, co_y, co_x = o0z - az, o0y - ay, o0x - ax
        rz, ry, rx = tz - co_z*2, ty - co_y*2, tx - co_x*2
        okc = (valid0 & (rz < 3) & (ry < 3) & (rx < 3)
               & (co_z >= 0) & (co_y >= 0) & (co_x >= 0)
               & (co_z < OZ) & (co_y < OY) & (co_x < OX))
        ckeys.append(jnp.where(okc, (co_z*OY + co_y)*OX + co_x, IMAX))
        taps.append((rz*3 + ry)*3 + rx)
    cand_key = jnp.stack(ckeys).reshape(-1)
    tap = jnp.stack(taps).reshape(-1)
    if upto == "cand":
        return cand_key.sum() + tap.sum()
    live0 = cand_key != IMAX
    occ = jnp.zeros((CELLS_OUT,), bool).at[
        jnp.where(live0, cand_key, CELLS_OUT)].set(True, mode="drop")
    if upto == "occ":
        return jnp.float32(occ[::4096].sum()) + cand_key.sum()
    packed = keytable.pack_occupancy(occ, CELLS_OUT)
    if upto == "pack":
        return jnp.float32(packed[::512].sum()) + cand_key.sum()
    rank = keytable.lookup(
        packed, jnp.minimum(cand_key, CELLS_OUT - 1), live0, MAX_OUT)
    if upto == "rank":
        return jnp.float32(rank.sum())
    live = live0 & (rank < MAX_OUT)
    slot = jnp.where(live, rank, MAX_OUT)
    out_key = jnp.full((MAX_OUT + 1,), IMAX, jnp.int32).at[slot].set(
        cand_key, mode="drop")[:MAX_OUT]
    if upto == "outkey":
        return jnp.float32(out_key.sum()) + jnp.float32(rank.sum())
    flat_pos = jnp.where(live, jnp.clip(tap, 0, 26)*MAX_OUT + slot,
                         MAX_OUT*27)
    rows_src = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32)[None], (8, N)).reshape(-1)
    gidx = jnp.full((MAX_OUT*27 + 1,), N, jnp.int32).at[flat_pos].set(
        rows_src, mode="drop")[:-1]
    return jnp.float32(gidx.sum()) + jnp.float32(out_key.sum())

def make(upto):
    def p(coords_in):
        def body(i, carry):
            coords = coords_in + perturb(carry)
            return jnp.float32(stage(coords, upto))
        return lax.fori_loop(0, ITERS, body, jnp.float32(0))
    return p

for upto in ("cand", "occ", "pack", "rank", "outkey", "full"):
    timed(f"down upto={upto}", make(upto), coords0)

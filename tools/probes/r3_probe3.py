"""Round-3 probe 3: down-plan internals breakdown + voxelize cost cuts.

Down plan st1->2 is 22 ms; this probe times CUMULATIVE stages of the dense
branch (candidate gen -> occupancy+pack -> rank lookup -> gidx scatter ->
decode+x3) to find the whale. Voxelize (10.5 ms) variants: drop the
point_voxel_id scatter (unused at inference), scatter the KEY instead of
(P, 3) coords (3-minor-dim poison), pad the sort-gather rows to 64B.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

import df3d.ops.sparse as sp
from df3d.ops import keytable

ITERS = 8
N = 120_000
GRID = (41, 1440, 1440)
Z, Y, X = GRID
CELLS = Z * Y * X
MAX_OUT = 90_000
IMAX = jnp.iinfo(jnp.int32).max

rng = np.random.RandomState(0)
raw = np.unique(rng.randint(0, CELLS, size=300_000).astype(np.int64))
keys_np = np.sort(raw[:N]).astype(np.int32)
coords_np = np.stack(
    [keys_np // (Y * X), (keys_np // X) % Y, keys_np % X], -1
).astype(np.int32)
coords0 = jnp.asarray(coords_np[None])

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
    per = (best - RTT) / ITERS * 1000.0
    print(f"{name:44s} {per:8.2f} ms/iter  (compile {c:.0f}s, sink {s:.3g})",
          flush=True)
    return per


def perturb(s):
    return jnp.where(s > jnp.float32(1e30), 1, 0).astype(jnp.int32)


# --------------------------- down-plan dense branch, cut at `stage`
OZ, OY, OX = (Z + 2 - 3) // 2 + 1, (Y + 2 - 3) // 2 + 1, (X + 2 - 3) // 2 + 1
CELLS_OUT = OZ * OY * OX
CAND = [(a, b, c) for a in range(2) for b in range(2) for c in range(2)]


def down_stage(coords, keys, valid, stage):
    tz, ty, tx = coords[:, 0] + 1, coords[:, 1] + 1, coords[:, 2] + 1
    o0z, o0y, o0x = tz // 2, ty // 2, tx // 2
    ckeys, taps = [], []
    for az, ay, ax in CAND:
        co_z, co_y, co_x = o0z - az, o0y - ay, o0x - ax
        rz, ry, rx = tz - co_z * 2, ty - co_y * 2, tx - co_x * 2
        ok_c = (
            valid & (rz < 3) & (ry < 3) & (rx < 3)
            & (co_z >= 0) & (co_y >= 0) & (co_x >= 0)
            & (co_z < OZ) & (co_y < OY) & (co_x < OX)
        )
        ckeys.append(jnp.where(ok_c, (co_z * OY + co_y) * OX + co_x, IMAX))
        taps.append((rz * 3 + ry) * 3 + rx)
    cand_key = jnp.stack(ckeys).reshape(-1)
    tap = jnp.stack(taps).reshape(-1)
    if stage == 1:
        return jnp.float32(cand_key.sum()) + jnp.float32(tap.sum())

    live0 = cand_key != IMAX
    ez, ey, ex = OZ + 1, OY + 1, OX + 1
    ecells = ez * ey * ex
    r0z, r0y, r0x = tz - o0z * 2, ty - o0y * 2, tx - o0x * 2
    par = (r0z * 2 + r0y) * 2 + r0x
    ekey = (o0z * ey + o0y) * ex + o0x
    pidx = jnp.where(valid, par * ecells + ekey, 8 * ecells)
    h = jnp.zeros((8 * ecells,), bool).at[pidx].set(
        True, mode="drop").reshape(8, ez, ey, ex)
    occ4 = jnp.zeros((OZ, OY, OX), bool)
    for az, ay, ax in CAND:
        sl = h[:, az:az + OZ, ay:ay + OY, ax:ax + OX]
        for p in range(8):
            pz, py, px = p // 4, (p // 2) % 2, p % 2
            if pz + az * 2 >= 3 or py + ay * 2 >= 3 or px + ax * 2 >= 3:
                continue
            occ4 = occ4 | sl[p]
    packed = keytable.pack_occupancy(occ4.reshape(-1), CELLS_OUT)
    if stage == 2:
        return jnp.float32(packed.sum())

    rank = keytable.lookup(
        packed, jnp.minimum(cand_key, CELLS_OUT - 1), live0, MAX_OUT)
    if stage == 3:
        return jnp.float32(rank.sum())

    live = live0 & (rank < MAX_OUT)
    slot = jnp.where(live, rank, MAX_OUT)
    flat_pos = jnp.where(
        live, jnp.clip(tap, 0, 26) * MAX_OUT + slot, MAX_OUT * 27)
    rows_src = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32)[None], (8, N)).reshape(-1)
    gidx = jnp.full((MAX_OUT * 27 + 1,), N, jnp.int32).at[flat_pos].set(
        rows_src, mode="drop")[:-1]
    if stage == 4:
        return jnp.float32(gidx.sum())

    first_r = jnp.full((MAX_OUT,), N, jnp.int32)
    first_k = jnp.zeros((MAX_OUT,), jnp.int32)
    segs = []
    for t in range(27):
        seg = jax.lax.dynamic_slice_in_dim(gidx, t * MAX_OUT, MAX_OUT)
        segs.append(seg)
        found = (seg < N) & (first_r == N)
        first_r = jnp.where(found, seg, first_r)
        first_k = jnp.where(found, t, first_k)
    x3 = sp._x3_from_tap_rows(segs, N)
    return jnp.float32(gidx.sum()) + jnp.float32(first_r.sum()) + jnp.float32(
        first_k.sum()) + jnp.float32(x3.sum())


def p_down(coords_in, stage):
    def body(i, carry):
        c = coords_in[0] + perturb(carry)
        keys = (c[:, 0] * Y + c[:, 1]) * X + c[:, 2]
        return down_stage(c, keys, jnp.ones((N,), bool), stage)
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


# ---------------------------------------------------------- voxelize cuts
from df3d.ops.voxelize import voxelize  # noqa: E402

P = 260_000
VS = (0.075, 0.075, 0.2)
PCR = (-54, -54, -5, 54, 54, 3)
VGRID = (40, 1440, 1440)
pts_np = np.concatenate(
    [rng.uniform(-54, 54, (P, 2)), rng.uniform(-5, 3, (P, 1)),
     rng.uniform(0, 1, (P, 2))], -1).astype(np.float32)
pts0 = jnp.asarray(pts_np)


def p_vox_full(pts_in):
    def body(i, carry):
        p = pts_in + carry * jnp.float32(1e-38)
        r = voxelize(p, jnp.ones((P,), bool), VS, PCR, VGRID, 120_000, 10)
        return (r.features.sum() + jnp.float32(r.coords.sum())
                + jnp.float32(r.point_voxel_id.sum()))
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


def vox_variant(pts, want_pid, key_coords, pad16):
    zg, yg, xg = VGRID
    coords = jnp.floor(
        (pts[:, :3] - jnp.asarray(PCR[:3])) / jnp.asarray(VS)
    ).astype(jnp.int32)[:, ::-1]
    in_range = ((coords >= 0).all(-1) & (coords[:, 0] < zg)
                & (coords[:, 1] < yg) & (coords[:, 2] < xg))
    key = jnp.where(in_range, (coords[:, 0] * yg + coords[:, 1]) * xg
                    + coords[:, 2], IMAX)
    order = jnp.argsort(key, stable=True)
    skey = key[order]
    first = jnp.concatenate([jnp.array([True]), skey[1:] != skey[:-1]])
    first &= skey != IMAX
    vid = jnp.cumsum(first.astype(jnp.int32)) - 1
    vid = jnp.where(skey == IMAX, 120_000, vid)
    idx = jnp.arange(P)
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(first, idx, -1))
    rank = idx - seg_start
    keep = (rank < 10) & (vid < 120_000)
    f = pts.shape[1]
    if pad16:
        aug = jnp.concatenate(
            [pts, jnp.ones((P, 1), pts.dtype),
             jnp.zeros((P, 16 - f - 1), pts.dtype)], axis=1)
    else:
        aug = jnp.concatenate([pts, jnp.ones((P, 1), pts.dtype)], axis=1)
    aug = aug[order]
    seg_id = jnp.minimum(vid, 120_000)
    sums = jax.ops.segment_sum(
        jnp.where(keep[:, None], aug, 0.0), seg_id,
        num_segments=120_001, indices_are_sorted=True)[:120_000]
    counts = sums[:, f].astype(jnp.int32)
    feats = sums[:, :f] / jnp.maximum(counts, 1)[:, None]
    if key_coords:
        okey = jnp.full((120_001,), IMAX, jnp.int32).at[seg_id].set(
            skey, mode="drop", indices_are_sorted=True)[:120_000]
        ov = okey != IMAX
        k_ = jnp.where(ov, okey, 0)
        cx = k_ % xg
        cy = (k_ // xg) % yg
        cz = k_ // (xg * yg)
        out_coords = jnp.where(
            ov[:, None], jnp.stack([cz, cy, cx], -1), -1)
    else:
        out_coords = jnp.full((120_000, 3), -1, jnp.int32).at[seg_id].set(
            coords[order], mode="drop", indices_are_sorted=True)
    s = feats.sum() + jnp.float32(out_coords.sum())
    if want_pid:
        pv = jnp.where(keep, vid, -1)
        pid = jnp.zeros((P,), jnp.int32).at[order].set(
            pv, unique_indices=True)
        s = s + jnp.float32(pid.sum())
    return s


def p_vox(pts_in, want_pid, key_coords, pad16):
    def body(i, carry):
        p = pts_in + carry * jnp.float32(1e-38)
        return vox_variant(p, want_pid, key_coords, pad16)
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


def main():
    for stage in (1, 2, 3, 4, 5):
        timed(f"down-plan cut@{stage}",
              lambda c, s=stage: p_down(c, s), coords0)
    timed("voxelize full (current)", lambda p: p_vox_full(p), pts0)
    timed("vox inline pid+coords (sanity)",
          lambda p: p_vox(p, True, False, False), pts0)
    timed("vox no-pid", lambda p: p_vox(p, False, False, False), pts0)
    timed("vox no-pid keycoords",
          lambda p: p_vox(p, False, True, False), pts0)
    timed("vox no-pid keycoords pad16",
          lambda p: p_vox(p, False, True, True), pts0)


if __name__ == "__main__":
    main()

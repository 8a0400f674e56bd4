"""Round-3 probe 18: scatter-free down-plan v2 + bf16 conv rows + fixes.

Motivated by probe 14 (Mosaic compiler crashes on any multi-vreg gather ->
pallas conv dead on this toolchain) and probe 17 (fitted caps -19 ms,
bf16 tail a wash): the remaining levers are the ~47 ms of down-plan builds
(the gidx scatter is ~8-13 ms of it) and the conv gather row bytes.

  A) jnp.nonzero(size=) compaction of the down2 output occupancy grid
     (re-run of lost probe 11A).
  B) down-plan v2 at down2 scale: parity-plane occupancy (unchanged) +
     nonzero compaction for out_keys + ONE flat 27-tap output-side
     keytable.lookup into the PRE-PACKED input table (reused from the
     stage's subm plan — the round-2 probed output-side form paid a fresh
     table build and per-tap lookup calls, which break pipelining).
     vs the current build_conv_plan (scatter form), same coords.
     On-chip equality check of gidx/out_coords between the two.
  C) bf16 sparse conv bodies at st2 (32ch: 128B->64B rows) and st3 (64ch:
     256B->128B) via ops.sparse.set_compute_dtype (re-run of lost 11B),
     including a bf16 round-trip cast cost measurement.
  D) pallas v2 conv at real st1 scale: document the Mosaic remote-compile
     crash (expected FAIL, probe 14).

`timed` here wraps fn in a fresh lambda: jax.jit caches on function
identity, so re-jitting the same function object after flipping a module
global silently reuses the old trace (this invalidated probe 15's b/c/d).

Run: python tools/probes/r3_probe18.py [--cpu]  (--cpu = tiny smoke)
"""

import dataclasses
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

CPU = "--cpu" in sys.argv

import numpy as np
import jax

if CPU:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax import lax

from df3d.ops import keytable
from df3d.ops import sparse as sp

ITERS = 4 if not CPU else 2
_f0 = jax.jit(lambda x: x + 1.0)
float(_f0(jnp.float32(1)))
RTT = 1e9
for _ in range(5):
    t0 = time.time()
    float(_f0(jnp.float32(1)))
    RTT = min(RTT, time.time() - t0)
print(f"RTT = {RTT*1000:.1f} ms", flush=True)


def timed(name, fn, *args, iters=ITERS):
    try:
        f = jax.jit(lambda *a: fn(*a))  # fresh identity -> fresh trace
        t0 = time.time()
        s = float(f(*args))
        c = time.time() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            s = float(f(*args))
            best = min(best, time.time() - t0)
        per = (best - RTT) / iters * 1000.0
        print(f"{name:52s} {per:8.2f} ms/iter  (compile {c:.0f}s, "
              f"sink {s:.4g})", flush=True)
        return per
    except Exception as e:
        print(f"{name:52s} FAIL {str(e).splitlines()[0][:90]}", flush=True)
        return None


def perturb(s):
    return jnp.where(s > jnp.float32(1e30), 1, 0).astype(jnp.int32)


# --------------------------------------------------------------------------
# down-plan v2: occupancy (parity planes, same as build_conv_plan) +
# compaction + one flat output-side lookup into the prepacked input table
# --------------------------------------------------------------------------


def down_plan_v2(coords, packed_in, valid, spatial, max_out,
                 ksize=(3, 3, 3), stride=(2, 2, 2), padding=(1, 1, 1)):
    """One-sample strided plan, scatter-free gidx. coords (N, 3) key-sorted
    (row == input-table rank); packed_in = keytable.pack_keys of the input
    keys. Returns (gidx flat (K*max_out,), out_coords (max_out, 3),
    true_occ)."""
    z, y, x = spatial
    oz = (z + 2 * padding[0] - ksize[0]) // stride[0] + 1
    oy = (y + 2 * padding[1] - ksize[1]) // stride[1] + 1
    ox = (x + 2 * padding[2] - ksize[2]) // stride[2] + 1
    n = coords.shape[0]
    k_count = ksize[0] * ksize[1] * ksize[2]
    cells_out = oz * oy * ox
    ncand = tuple(-(-k // s) for k, s in zip(ksize, stride))
    cand_list = [
        (az, ay, ax)
        for az in range(ncand[0]) for ay in range(ncand[1])
        for ax in range(ncand[2])
    ]

    # ---- output occupancy: identical parity-plane trick to build_conv_plan
    tz = coords[:, 0] + padding[0]
    ty = coords[:, 1] + padding[1]
    tx = coords[:, 2] + padding[2]
    o0z, o0y, o0x = tz // stride[0], ty // stride[1], tx // stride[2]
    ez = oz + ncand[0] - 1
    ey = oy + ncand[1] - 1
    ex = ox + ncand[2] - 1
    ecells = ez * ey * ex
    nplanes = stride[0] * stride[1] * stride[2]
    r0z = tz - o0z * stride[0]
    r0y = ty - o0y * stride[1]
    r0x = tx - o0x * stride[2]
    par = (r0z * stride[1] + r0y) * stride[2] + r0x
    ekey = (o0z * ey + o0y) * ex + o0x
    pidx = jnp.where(valid, par * ecells + ekey, nplanes * ecells)
    h = jnp.zeros((nplanes * ecells,), bool).at[pidx].set(
        True, mode="drop"
    ).reshape(nplanes, ez, ey, ex)
    occ4 = jnp.zeros((oz, oy, ox), bool)
    for az, ay, ax in cand_list:
        sl = h[:, az:az + oz, ay:ay + oy, ax:ax + ox]
        for p in range(nplanes):
            pz = p // (stride[1] * stride[2])
            py = (p // stride[2]) % stride[1]
            px = p % stride[2]
            if (pz + az * stride[0] >= ksize[0]
                    or py + ay * stride[1] >= ksize[1]
                    or px + ax * stride[2] >= ksize[2]):
                continue
            occ4 = occ4 | sl[p]

    # ---- out keys by static-size compaction (ascending cell order ==
    # rank order: out_rows_sorted invariant preserved)
    (okeys,) = jnp.nonzero(occ4.reshape(-1), size=max_out,
                           fill_value=cells_out)
    okeys = okeys.astype(jnp.int32)
    ovalid = okeys < cells_out
    k_ = jnp.where(ovalid, okeys, 0)
    cx = k_ % ox
    cy = (k_ // ox) % oy
    cz = k_ // (ox * oy)
    out_coords = jnp.where(
        ovalid[:, None], jnp.stack([cz, cy, cx], -1).astype(jnp.int32), -1
    )

    # ---- gidx: ONE flat (K*max_out,) lookup into the prepacked input
    # table (per-tap lookup calls break pipelining — r3 probe 2b)
    qs, oks = [], []
    for dz in range(ksize[0]):
        for dy in range(ksize[1]):
            for dx in range(ksize[2]):
                sz_ = cz * stride[0] - padding[0] + dz
                sy_ = cy * stride[1] - padding[1] + dy
                sx_ = cx * stride[2] - padding[2] + dx
                ok_t = (
                    ovalid
                    & (sz_ >= 0) & (sz_ < z) & (sy_ >= 0) & (sy_ < y)
                    & (sx_ >= 0) & (sx_ < x)
                )
                qs.append(
                    jnp.where(ok_t, (sz_ * y + sy_) * x + sx_, 0))
                oks.append(ok_t)
    q = jnp.stack(qs).reshape(-1)
    ok = jnp.stack(oks).reshape(-1)
    gidx = keytable.lookup(packed_in, q, ok, n)  # rank == row (sorted)
    true_occ = occ4.sum(dtype=jnp.int32)
    return gidx, out_coords, true_occ


def main():
    from df3d.ops.voxelize import voxelize_batch
    from df3d.utils.synth import make_raycast_frame

    if CPU:
        n1_cap, n2_cap = 2048, 1024
        grid = (10, 160, 160)
        vsize, rng_ = (0.4, 0.4, 0.8), (-32, 32)
    else:
        n1_cap, n2_cap = 102_400, 73_728
        grid = (40, 1440, 1440)
        vsize, rng_ = (0.075, 0.075, 0.2), (-54, 54)

    frame = make_raycast_frame(np.random.RandomState(100), 260_000)
    points = jnp.asarray(frame[None])
    valid_p = jnp.ones(points.shape[:2], bool)
    pc_range = (rng_[0], rng_[0], -5.0, rng_[1], rng_[1], 3.0)
    res = jax.jit(lambda p, v: voxelize_batch(
        p, v, vsize, pc_range, grid, n1_cap, 10))(points, valid_p)
    coords1 = res.coords[0]
    valid1 = coords1[:, 0] >= 0
    print(f"stage-1 rows: {int(valid1.sum())}/{n1_cap}", flush=True)

    z, y, x = grid
    keys1 = jnp.where(valid1, (coords1[:, 0] * y + coords1[:, 1]) * x
                      + coords1[:, 2], 0).astype(jnp.int32)
    cells1 = z * y * x

    st = sp.SparseTensor(
        jnp.zeros((1, n1_cap, 16), jnp.float32), res.coords, grid,
        rows_sorted=True)

    # ---- A: compaction cost alone at down2-output scale
    oz, oy, ox = (z + 1) // 2, y // 2, x // 2

    def compact_only(c):
        def body(i, carry):
            cc = c + perturb(carry)
            occ = jnp.zeros((oz * oy * ox,), bool).at[
                jnp.where(valid1, ((cc[:, 0] // 2) * oy + cc[:, 1] // 2)
                          * ox + cc[:, 2] // 2, 0)
            ].set(True, mode="drop")
            (idx,) = jnp.nonzero(occ, size=n2_cap, fill_value=oz * oy * ox)
            return jnp.float32(idx.sum(dtype=jnp.int32))
        return lax.fori_loop(0, ITERS, body, jnp.float32(0))

    timed(f"A nonzero(size={n2_cap}) of {oz*oy*ox/1e6:.1f}M occ "
          "(incl. N scatter)", compact_only, coords1)

    # ---- B: current scatter-form build vs v2, plan build only
    def cur_build(c):
        def body(i, carry):
            cc = c + perturb(carry)
            plan = sp.build_conv_plan(
                dataclasses.replace(st, coords=cc[None]), 3, 2, 1, max_out=n2_cap)
            return jnp.float32(
                plan.gather_idx.sum(dtype=jnp.int32)
                + plan.out_coords.sum(dtype=jnp.int32))
        return lax.fori_loop(0, ITERS, body, jnp.float32(0))

    def v2_build(c):
        def body(i, carry):
            cc = c + perturb(carry)
            keys = jnp.where(valid1, (cc[:, 0] * y + cc[:, 1]) * x
                             + cc[:, 2], 0).astype(jnp.int32)
            packed = lax.optimization_barrier(
                keytable.pack_keys(keys, valid1, cells1))
            gidx, oc, _ = down_plan_v2(
                cc, packed, valid1, grid, n2_cap)
            return jnp.float32(gidx.sum(dtype=jnp.int32)
                               + oc.sum(dtype=jnp.int32))
        return lax.fori_loop(0, ITERS, body, jnp.float32(0))

    def v2_build_prepacked(c, packed):
        # the table is shared with the stage's subm plan in-model: charge
        # the pack to the subm plan and measure v2 without it
        def body(i, carry):
            cc = c + perturb(carry)
            gidx, oc, _ = down_plan_v2(
                cc, packed, valid1, grid, n2_cap)
            return jnp.float32(gidx.sum(dtype=jnp.int32)
                               + oc.sum(dtype=jnp.int32))
        return lax.fori_loop(0, ITERS, body, jnp.float32(0))

    packed1 = jax.jit(lambda k, v: keytable.pack_keys(k, v, cells1))(
        keys1, valid1)
    timed("B current build_conv_plan (scatter form)", cur_build, coords1)
    timed("B v2 build incl. pack", v2_build, coords1)
    timed("B v2 build, prepacked table", v2_build_prepacked, coords1,
          packed1)

    # equality check (single shot, no chain)
    plan_ref = jax.jit(lambda c: sp.build_conv_plan(
        dataclasses.replace(st, coords=c[None]), 3, 2, 1, max_out=n2_cap))(coords1)
    g2, oc2, to2 = jax.jit(lambda c, p: down_plan_v2(
        c, p, valid1, grid, n2_cap))(coords1, packed1)
    eq_g = float(jnp.mean((plan_ref.gather_idx[0] == g2).astype(jnp.float32)))
    eq_c = float(jnp.mean(
        (plan_ref.out_coords[0] == oc2).astype(jnp.float32)))
    eq_t = int(plan_ref.true_occ[0]) == int(to2)
    print(f"B equality: gidx {eq_g:.6f}  out_coords {eq_c:.6f}  "
          f"true_occ {eq_t}", flush=True)

    # ---- C: bf16 conv bodies (st2/st3 scale subm conv chains)
    st3_n = 27_648 if not CPU else 512
    for n_s, c_s, tag in ((n2_cap, 32, "st2"), (st3_n, 64, "st3")):
        keys_s = jnp.sort(jnp.unique(
            jnp.asarray(np.random.RandomState(7).randint(
                0, cells1, n_s * 2, dtype=np.int64) % cells1),
            size=n_s, fill_value=cells1 - 1)).astype(jnp.int32)
        co_s = jnp.stack([keys_s // (y * x), (keys_s // x) % y,
                          keys_s % x], -1).astype(jnp.int32)
        st_s = sp.SparseTensor(
            jnp.asarray(np.random.RandomState(8).randn(
                1, n_s, c_s).astype(np.float32)),
            co_s[None], grid, rows_sorted=True)
        plan_s = jax.jit(lambda s: sp.build_subm_plan(s, 3)
                         )(st_s)
        w_s = jnp.asarray(np.random.RandomState(9).randn(
            27, c_s, c_s).astype(np.float32) * 0.05)

        def conv_chain(f, dtype):
            def body(i, carry):
                ff = f + (carry * jnp.float32(1e-38)).astype(f.dtype)
                sp.set_compute_dtype(dtype)
                try:
                    out = sp.apply_sparse_conv(ff, plan_s, w_s)
                    out = sp.apply_sparse_conv(out, plan_s, w_s)
                finally:
                    sp.set_compute_dtype(None)
                return jnp.float32(out.sum(dtype=jnp.float32))
            return lax.fori_loop(0, ITERS, body, jnp.float32(0))

        timed(f"C {tag} 2x subm conv f32 ({n_s}x{c_s})",
              lambda f: conv_chain(f, None), st_s.features)
        timed(f"C {tag} 2x subm conv bf16",
              lambda f: conv_chain(f, jnp.bfloat16), st_s.features)

    # ---- D: pallas v2 at real scale (expected Mosaic remote-compile crash)
    if not CPU:
        from df3d.ops.pallas.sparse_conv_kernel import (
            apply_sparse_conv_pallas_v2,
        )
        f1 = jnp.zeros((1, n1_cap, 16), jnp.float32)
        i1 = jnp.zeros((1, 27, n1_cap + 1), jnp.int32)
        w1 = jnp.zeros((27, 16, 16), jnp.float32)
        timed("D pallas v2 conv st1 scale (expect Mosaic crash)",
              lambda f: apply_sparse_conv_pallas_v2(f, i1, w1).sum(), f1)


if __name__ == "__main__":
    main()

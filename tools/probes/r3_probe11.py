"""Round-3 probe 11: follow-ups to the dense-tail probe (r3_probe10 —
dense subm conv: st2 46.6 ms, st3 7.98, st4 1.11; st1 dense down OOMs):

  A) static-size compaction (jnp.nonzero size=) of a 10.9M occupancy grid
     -> 90k slots: if ~2-3 ms, down-plan out_coords can come from the
     parity-plane grid directly (kills the 13 ms gidx scatter dependence).
  B) sparse subm conv body with bf16 features at st2/st3/st4 channel
     widths: f32 rows are 128/256/512B; bf16 halves them (64B = the
     probed 2 ns sweet spot at st2).
  C) dense stage-4 pipeline piece by piece: densify st3 output (55k rows
     -> (11,360,360,64)), dense strided down4 (64->128, pad (0,1,1)),
     dense subm block conv at st4, dense extra_conv (3,1,1)/(2,1,1)/p0,
     masked BN at st4 scale.
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
from df3d.ops.sparse import SparseTensor, build_subm_plan, apply_sparse_conv

_f0 = jax.jit(lambda x: x + 1.0)
float(_f0(jnp.float32(1)))
RTT = 1e9
for _ in range(5):
    t0 = time.time()
    float(_f0(jnp.float32(1)))
    RTT = min(RTT, time.time() - t0)
print(f"RTT = {RTT*1000:.1f} ms", flush=True)

ITERS = 8
DN = lax.conv_dimension_numbers(
    (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NZYXC", "ZYXIO", "NZYXC"))


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
    print(f"{name}: {per:7.2f} ms   (compile {c:.0f}s, sink {s:.3g})",
          flush=True)
    return per


def main():
    rng = np.random.RandomState(0)

    # A) static-size nonzero over the st1->2 output grid
    cells2 = 21 * 720 * 720
    occ = np.zeros(cells2, bool)
    occ[np.unique(rng.randint(0, cells2, 95_000))[:90_000]] = True
    occ_j = jnp.asarray(occ)

    def compact(o, s0):
        def body(i, carry):
            o2, s = carry
            op = o2 ^ (s > 1e30)
            idx = jnp.nonzero(op, size=90_000, fill_value=cells2)[0]
            return (o2, idx.sum(dtype=jnp.float32))
        return lax.fori_loop(0, ITERS, body, (o, s0))[1]

    timed("A nonzero 10.9M -> 90k", compact, occ_j, jnp.float32(0))

    # A2) the same via cumsum + predicated scatter (manual form)
    def compact2(o, s0):
        def body(i, carry):
            o2, s = carry
            op = o2 ^ (s > 1e30)
            rank = jnp.cumsum(op.astype(jnp.int32)) - 1
            slot = jnp.where(op, jnp.minimum(rank, 90_000 - 1), 90_000)
            out = jnp.full((90_001,), cells2, jnp.int32).at[slot].set(
                jnp.arange(cells2, dtype=jnp.int32), mode="drop",
                indices_are_sorted=True, unique_indices=False)
            return (o2, out[:-1].sum(dtype=jnp.float32))
        return lax.fori_loop(0, ITERS, body, (o, s0))[1]

    timed("A2 cumsum+scatter 10.9M -> 90k", compact2, occ_j, jnp.float32(0))

    # B) sparse subm conv bodies, f32 vs bf16 features, at st2/3/4 scales
    for (grid, n, c) in (((21, 720, 720), 90_000, 32),
                         ((11, 360, 360), 55_000, 64),
                         ((6, 180, 180), 30_000, 128)):
        cells = grid[0] * grid[1] * grid[2]
        keys = np.sort(np.unique(rng.randint(0, cells, int(n * 2.2))))[:n]
        coords = np.stack([keys // (grid[1] * grid[2]),
                           (keys // grid[2]) % grid[1],
                           keys % grid[2]], -1).astype(np.int32)[None]
        st = SparseTensor(
            jnp.asarray(rng.randn(1, n, c).astype(np.float32)),
            jnp.asarray(coords), grid, rows_sorted=True)
        w = jnp.asarray(rng.randn(27, c, c).astype(np.float32) * 0.05)
        plan = build_subm_plan(st, 3, with_x3=False)
        plan = jax.tree_util.tree_map(jax.block_until_ready, plan)

        def conv_chain(f0, w_, p, dtype):
            wd = w_.astype(dtype)

            def body(i, carry):
                f, s = carry
                fp = (f + jnp.where(s > 1e30, 1.0, 0.0).astype(f.dtype))
                y = apply_sparse_conv(fp.astype(dtype), p, wd)
                y = y.astype(f.dtype)
                return (y, y.sum(dtype=jnp.float32))
            return lax.fori_loop(
                0, ITERS, body, (f0, jnp.float32(0)))[1]

        timed(f"B subm sparse {n//1000}k x{c} f32",
              lambda f, w_: conv_chain(f, w_, plan, jnp.float32),
              st.features, w)
        timed(f"B subm sparse {n//1000}k x{c} bf16",
              lambda f, w_: conv_chain(f, w_, plan, jnp.bfloat16),
              st.features, w)

    # C) dense stage-4 pieces
    n3, c3, c4 = 55_000, 64, 128
    grid3 = (11, 360, 360)
    cells3 = grid3[0] * grid3[1] * grid3[2]
    keys3 = jnp.asarray(
        np.sort(np.unique(rng.randint(0, cells3, 120_000)))[:n3].astype(
            np.int32))
    feats3 = jnp.asarray(rng.randn(1, n3, c3).astype(np.float32)).astype(
        jnp.bfloat16)

    def densify3(f, k):
        def body(i, carry):
            fx, s = carry
            fp = fx + jnp.where(s > 1e30, 1.0, 0.0).astype(fx.dtype)
            d = jnp.zeros((cells3, c3), jnp.bfloat16).at[k].set(fp[0])
            return (fx, d.sum(dtype=jnp.float32))
        return lax.fori_loop(0, ITERS, body, (f, jnp.float32(0)))[1]

    timed("C densify 55k -> 1.4M x64 bf16", densify3, feats3, keys3)

    x3d = jnp.asarray(
        rng.randn(1, 11, 360, 360, c3).astype(np.float32)).astype(
            jnp.bfloat16)
    wd4 = jnp.asarray(
        rng.randn(3, 3, 3, c3, c4).astype(np.float32) * 0.05).astype(
            jnp.bfloat16)

    def down4(x, w):
        def body(i, carry):
            x2, s = carry
            xp = x2 + jnp.where(s > 1e30, 1.0, 0.0).astype(x2.dtype)
            y = lax.conv_general_dilated(
                xp, w, (2, 2, 2), ((0, 0), (1, 1), (1, 1)),
                dimension_numbers=DN,
                preferred_element_type=jnp.float32).astype(x2.dtype)
            return (x2, y.sum(dtype=jnp.float32))
        return lax.fori_loop(0, ITERS, body, (x, jnp.float32(0)))[1]

    timed("C dense down4 (11,360,360,64)->s2 x128", down4, x3d, wd4)

    # C: mask dilation for down4 (reduce_window any-pool)
    mask3 = jnp.asarray((rng.rand(1, 11, 360, 360) < 0.04))

    def dil(m, s0):
        def body(i, carry):
            m2, s = carry
            mp = m2 ^ (s > 1e30)
            o = lax.reduce_window(
                mp, False, lax.bitwise_or, (1, 3, 3, 3), (1, 2, 2, 2),
                ((0, 0), (0, 0), (1, 1), (1, 1)))
            return (m2, o.sum(dtype=jnp.float32))
        return lax.fori_loop(0, ITERS, body, (m, s0))[1]

    timed("C mask dilation down4", dil, mask3, jnp.float32(0))

    x4d = jnp.asarray(
        rng.randn(1, 5, 180, 180, c4).astype(np.float32)).astype(
            jnp.bfloat16)
    w44 = jnp.asarray(
        rng.randn(3, 3, 3, c4, c4).astype(np.float32) * 0.05).astype(
            jnp.bfloat16)

    def subm4(x, w):
        def body(i, carry):
            x2, s = carry
            xp = x2 + jnp.where(s > 1e30, 1.0, 0.0).astype(x2.dtype)
            y = lax.conv_general_dilated(
                xp, w, (1, 1, 1), "SAME", dimension_numbers=DN,
                preferred_element_type=jnp.float32).astype(x2.dtype)
            return (y, y.sum(dtype=jnp.float32))
        return lax.fori_loop(0, ITERS, body, (x, jnp.float32(0)))[1]

    timed("C dense subm st4 (5,180,180,128)", subm4, x4d, w44)

    we = jnp.asarray(
        rng.randn(3, 1, 1, c4, c4).astype(np.float32) * 0.05).astype(
            jnp.bfloat16)

    def extra(x, w):
        def body(i, carry):
            x2, s = carry
            xp = x2 + jnp.where(s > 1e30, 1.0, 0.0).astype(x2.dtype)
            y = lax.conv_general_dilated(
                xp, w, (2, 1, 1), ((0, 0), (0, 0), (0, 0)),
                dimension_numbers=DN,
                preferred_element_type=jnp.float32).astype(x2.dtype)
            return (x2, y.sum(dtype=jnp.float32))
        return lax.fori_loop(0, ITERS, body, (x, jnp.float32(0)))[1]

    timed("C dense extra_conv st4", extra, x4d, we)

    mask4 = jnp.asarray((rng.rand(1, 5, 180, 180) < 0.2).astype(np.float32)
                        ).astype(jnp.bfloat16)

    def mbn4(x0, m):
        def body(i, carry):
            x, s = carry
            xp = x + jnp.where(s > 1e30, 1.0, 0.0).astype(x.dtype)
            cnt = jnp.maximum(m.sum(dtype=jnp.float32), 1.0)
            xm = xp * m[..., None]
            mean = xm.sum((0, 1, 2, 3), dtype=jnp.float32) / cnt
            var = (jnp.square(xm.astype(jnp.float32)).sum((0, 1, 2, 3))
                   / cnt - jnp.square(mean))
            y = (xp.astype(jnp.float32) - mean) * lax.rsqrt(var + 1e-5)
            y = jnp.maximum(y, 0.0).astype(x.dtype) * m[..., None]
            return (y, y.sum(dtype=jnp.float32))
        return lax.fori_loop(0, ITERS, body, (x0, jnp.float32(0)))[1]

    timed("C masked BN+ReLU st4", mbn4, x4d, mask4)


if __name__ == "__main__":
    main()

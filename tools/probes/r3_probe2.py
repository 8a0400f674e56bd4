"""Round-3 probe 2: IN-MODEL breakdown of the x3 triple machinery vs the
round-2 flat paths (the e2e fwd went 182 -> 194 ms after the x3 landing;
find which component regressed).

A/B per component at bench shapes (120k st1), via sparse.set_x3_enabled:
  * subm plan build st1 (lookup3 9-group vs 27 single lookups)
  * 2x SparseBasicBlock-equivalent conv chain st1 (triple vs flat body)
  * down plan st1->2 (with/without the x3 segs derivation)
  * down conv st1->2 (90k x 16->32)
  * st3 conv (55k x 64, pair path vs flat)
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

ITERS = 8
N = 120_000
GRID = (41, 1440, 1440)
CELLS = GRID[0] * GRID[1] * GRID[2]

import df3d.ops.sparse as sp  # noqa: E402

rng = np.random.RandomState(0)
raw = np.unique(rng.randint(0, CELLS, size=300_000).astype(np.int64))
keys_np = np.sort(raw[:N]).astype(np.int32)
Z, Y, X = GRID
coords_np = np.stack(
    [keys_np // (Y * X), (keys_np // X) % Y, keys_np % X], -1
).astype(np.int32)
coords0 = jnp.asarray(coords_np[None])
valid0 = jnp.ones((1, N), bool)

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
    print(f"{name:40s} {per:8.2f} ms/iter  (compile {c:.0f}s, sink {s:.3g})",
          flush=True)
    return per


def perturb(s):
    return jnp.where(s > jnp.float32(1e30), 1, 0).astype(jnp.int32)


def st_of(coords, c=16):
    return sp.SparseTensor(
        jnp.zeros((1, coords.shape[1], c)), coords, GRID, rows_sorted=True)


def p_subm_plan(coords_in):
    def body(i, carry):
        c = coords_in + perturb(carry)
        plan = sp.build_subm_plan(st_of(c), 3)
        s = jnp.float32(plan.gather_idx.sum())
        if plan.x3 is not None:
            s = s + jnp.float32(plan.x3.sum())
        return s
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


def p_down_plan(coords_in):
    def body(i, carry):
        c = coords_in + perturb(carry)
        plan = sp.build_conv_plan(st_of(c), 3, 2, 1, max_out=90_000)
        s = jnp.float32(plan.gather_idx.sum())
        if plan.x3 is not None:
            s = s + jnp.float32(plan.x3.sum())
        return s
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


def conv_chain(feats_in, plan, w1, w2):
    """2 chained subm convs (residual-block shape) x ITERS."""
    def body(i, carry):
        f = (feats_in + carry * jnp.float32(1e-30))
        h = sp.apply_sparse_conv(f, plan, w1)
        h = sp.apply_sparse_conv(h, plan, w2)
        return h.sum()
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


def main():
    st = st_of(coords0)
    feats16 = jnp.asarray(rng.randn(1, N, 16).astype(np.float32))
    w16 = jnp.asarray(rng.randn(27, 16, 16).astype(np.float32) * 0.05)

    for flag in (True, False):
        sp.set_x3_enabled(flag)
        tag = "x3 " if flag else "r2 "
        # fresh lambdas per flag: jax.jit shares trace caches by function
        # identity, so re-jitting the same module-level fn after flipping
        # the flag would silently reuse the previous trace
        timed(tag + "subm plan st1", lambda c: p_subm_plan(c), coords0)
        timed(tag + "down plan st1->2", lambda c: p_down_plan(c), coords0)
        plan = jax.jit(lambda c: sp.build_subm_plan(st_of(c), 3))(coords0)
        timed(tag + "2x subm conv st1 (16ch)", conv_chain,
              feats16, plan, w16, w16)
        down = jax.jit(
            lambda c: sp.build_conv_plan(st_of(c), 3, 2, 1, max_out=90_000)
        )(coords0)
        w1632 = jnp.asarray(rng.randn(27, 16, 32).astype(np.float32) * 0.05)
        w3232 = jnp.asarray(rng.randn(27, 32, 32).astype(np.float32) * 0.05)

        def down_conv(f, p, w):
            def body(i, carry):
                ff = f + carry * jnp.float32(1e-30)
                return sp.apply_sparse_conv(ff, p, w).sum()
            return lax.fori_loop(0, ITERS, body, jnp.float32(0))
        timed(tag + "down conv 120k->90k 16->32", down_conv,
              feats16, down, w1632)

        # st3-like pair path: 55k x 64ch
        keys3 = np.sort(raw[:55_000]).astype(np.int32)
        c3 = np.stack([keys3 // (Y * X), (keys3 // X) % Y, keys3 % X],
                      -1).astype(np.int32)
        st3 = sp.SparseTensor(
            jnp.zeros((1, 55_000, 64)), jnp.asarray(c3[None]), GRID,
            rows_sorted=True)
        plan3 = jax.jit(
            lambda c: sp.build_subm_plan(
                sp.SparseTensor(st3.features, c, GRID, rows_sorted=True), 3)
        )(st3.coords)
        feats64 = jnp.asarray(
            rng.randn(1, 55_000, 64).astype(np.float32))
        w64 = jnp.asarray(rng.randn(27, 64, 64).astype(np.float32) * 0.02)
        timed(tag + "subm conv st3 (55k x 64ch)", down_conv,
              feats64, plan3, w64)
    sp.set_x3_enabled(True)


if __name__ == "__main__":
    main()

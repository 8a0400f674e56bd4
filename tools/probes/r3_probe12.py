"""Round-3 probe 12: COMPOSED backbone timing for the dense-tail variants.

Pieces (probe 11) said the dense stage-4 tail wins in bf16; this measures
the real SpMiddleResNetFHD at bench shapes:
  a) sparse end-to-end (dense_tail=False)    — r2 baseline
  b) dense_tail st4, f32 dense compute       — the committed default
  c) dense_tail st4, bf16 dense compute
  d) dense_from=3 (st3+st4 dense), bf16      — kills down3+subm3 plans
  e) dense_from=3, f32                       — control
plus standalone densify at the st2-output scale (the dense_from=3 entry
cost: 90k rows -> (21,720,720)x32).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

import df3d.ops.dense3d as d3
import df3d.ops.sparse as sp

ITERS = 4
GRID = (41, 1440, 1440)
Z, Y, X = GRID
CELLS = Z * Y * X

rng = np.random.RandomState(0)
raw = np.unique(rng.randint(0, CELLS, size=400_000).astype(np.int64))

_f0 = jax.jit(lambda x: x + 1.0)
float(_f0(jnp.float32(1)))
RTT = 1e9
for _ in range(5):
    t0 = time.time()
    float(_f0(jnp.float32(1)))
    RTT = min(RTT, time.time() - t0)
print(f"RTT = {RTT*1000:.1f} ms", flush=True)


def timed(name, fn, *args, iters=ITERS):
    f = jax.jit(fn)
    t0 = time.time()
    s = float(f(*args))
    c = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        s = float(f(*args))
        best = min(best, time.time() - t0)
    per = (best - RTT) / iters * 1000.0
    print(f"{name:46s} {per:8.2f} ms/iter  (compile {c:.0f}s, sink {s:.3g})",
          flush=True)
    return per


def perturb(s):
    return jnp.where(s > jnp.float32(1e30), 1, 0).astype(jnp.int32)


def coords_of(n):
    keys = np.sort(raw[:n]).astype(np.int32)
    return jnp.asarray(np.stack(
        [keys // (Y * X), (keys // X) % Y, keys % X], -1
    ).astype(np.int32)[None])


def main():
    from df3d.models.backbones_3d import SpMiddleResNetFHD

    n1 = 120_000
    c1 = coords_of(n1)
    featsv = jnp.asarray(rng.randn(1, n1, 5).astype(np.float32))
    caps = (120_000, 90_000, 55_000, 30_000)

    # standalone densify at st2-output scale
    g2 = (21, 720, 720)
    cells2 = g2[0] * g2[1] * g2[2]
    k2 = np.sort(np.unique(rng.randint(0, cells2, 200_000)))[:90_000]
    co2 = jnp.asarray(np.stack(
        [k2 // (g2[1] * g2[2]), (k2 // g2[2]) % g2[1], k2 % g2[2]], -1
    ).astype(np.int32)[None])
    f2 = jnp.asarray(rng.randn(1, 90_000, 32).astype(np.float32))

    def dens(f, c, dtype):
        def body(i, carry):
            cc = c + perturb(carry)
            dt = d3.densify(
                sp.SparseTensor(f, cc, g2, rows_sorted=True), dtype)
            return jnp.float32(dt.features.sum(dtype=jnp.float32))
        return lax.fori_loop(0, ITERS, body, jnp.float32(0))

    timed("densify 90k -> (21,720,720)x32 f32",
          lambda f, c: dens(f, c, jnp.float32), f2, co2)
    timed("densify 90k -> (21,720,720)x32 bf16",
          lambda f, c: dens(f, c, jnp.bfloat16), f2, co2)

    variants = [
        ("a sparse (dense_tail off)", dict(dense_tail=False), None),
        ("b dense st4 f32", dict(dense_tail=True), None),
        ("c dense st4 bf16", dict(dense_tail=True), jnp.bfloat16),
        ("d dense st3+4 bf16",
         dict(dense_tail=True, dense_from=3), jnp.bfloat16),
        ("e dense st3+4 f32", dict(dense_tail=True, dense_from=3), None),
    ]
    for name, kw, cdt in variants:
        d3.set_compute_dtype(cdt)
        bb = SpMiddleResNetFHD(5, caps, **kw)
        vs = jax.jit(lambda f, c: bb.init(
            jax.random.PRNGKey(0),
            sp.SparseTensor(f, c, GRID, rows_sorted=True), False)
        )(featsv, c1)

        def fwd(vs, f, c):
            def body(i, carry):
                cc = c + perturb(carry)
                bev, _ = bb.apply(
                    vs, sp.SparseTensor(f, cc, GRID, rows_sorted=True),
                    False)
                return jnp.float32(bev.sum(dtype=jnp.float32))
            return lax.fori_loop(0, ITERS, body, jnp.float32(0))

        timed(f"{name} FULL backbone fwd", lambda v, f, c: fwd(v, f, c),
              vs, featsv, c1)
    d3.set_compute_dtype(None)


if __name__ == "__main__":
    main()

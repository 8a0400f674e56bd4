"""Round-3 probe 10: dense-tail feasibility. Time on the v5e:

  A) dense bf16 3D convs at stage-2/3/4 scale (the proposed replacement
     for sparse subm convs + plans): (21,720,720,32), (11,360,360,64),
     (6,180,180,128), kernel 3^3.
  B) dense strided down convs st1->2 (from a densified (41,1440,1440,16)
     bf16 grid), st2->3, st3->4.
  C) densify: scatter 120k sparse rows into the (41,1440,1440,16) bf16
     grid (zeros init + row scatter).
  D) masked BN + ReLU at st2 scale (stats over the active mask only).

Hypothesis (see CLAUDE.md r3 notes): MXU dense compute at these grid
sizes beats the 2 ns/row gather floor + plan builds by ~50-60 ms e2e.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

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


def conv_chain(x0, w, stride=1):
    def body(i, carry):
        x, s = carry
        # runtime-zero perturbation threaded into the INPUT (defeat CSE)
        xp = x + jnp.where(s > 1e30, 1.0, 0.0).astype(x.dtype)
        y = lax.conv_general_dilated(
            xp, w, (stride,) * 3, "SAME", dimension_numbers=DN,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        s2 = y.sum(dtype=jnp.float32)
        if stride == 1:
            return (y, s2)
        return (x, s2)  # strided: keep input shape for the carry

    return lax.fori_loop(0, ITERS, body, (x0, jnp.float32(0)))[1]


def main():
    rng = np.random.RandomState(0)

    # A) subm-scale dense convs, bf16
    for (z, y, x, c) in ((21, 720, 720, 32), (11, 360, 360, 64),
                         (6, 180, 180, 128)):
        xa = jnp.asarray(
            rng.randn(1, z, y, x, c).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray(
            rng.randn(3, 3, 3, c, c).astype(np.float32) * 0.05
        ).astype(jnp.bfloat16)
        timed(f"A subm dense {z}x{y}x{x}x{c}", conv_chain, xa, w)

    # B) strided downs, bf16
    for (z, y, x, ci, co) in ((41, 1440, 1440, 16, 32),
                              (21, 720, 720, 32, 64),
                              (11, 360, 360, 64, 128)):
        xb = jnp.asarray(
            rng.randn(1, z, y, x, ci).astype(np.float32)
        ).astype(jnp.bfloat16)
        w = jnp.asarray(
            rng.randn(3, 3, 3, ci, co).astype(np.float32) * 0.05
        ).astype(jnp.bfloat16)
        timed(f"B down dense {z}x{y}x{x} {ci}->{co}",
              lambda xx, ww: conv_chain(xx, ww, stride=2), xb, w)

    # C) densify 120k rows -> (41,1440,1440,16) bf16
    n = 120_000
    cells = 41 * 1440 * 1440
    keys = jnp.asarray(
        np.sort(np.unique(rng.randint(0, cells, 200_000)))[:n].astype(
            np.int32))
    feats = jnp.asarray(rng.randn(1, n, 16).astype(np.float32)).astype(
        jnp.bfloat16)

    def densify(f, k):
        def body(i, carry):
            fx, s = carry
            fp = fx + jnp.where(s > 1e30, 1.0, 0.0).astype(fx.dtype)
            d = jnp.zeros((cells, 16), jnp.bfloat16).at[k].set(fp[0])
            s2 = d.sum(dtype=jnp.float32)
            return (fx, s2)
        return lax.fori_loop(0, ITERS, body, (f, jnp.float32(0)))[1]

    timed("C densify 120k -> 85M cells bf16", densify, feats, keys)

    # D) masked BN + ReLU at st2 scale
    xa = jnp.asarray(
        rng.randn(1, 21, 720, 720, 32).astype(np.float32)).astype(
            jnp.bfloat16)
    mask = jnp.asarray(
        (rng.rand(1, 21, 720, 720) < 0.01).astype(np.float32)).astype(
            jnp.bfloat16)

    def mbn(x0, m):
        def body(i, carry):
            x, s = carry
            xp = x + jnp.where(s > 1e30, 1.0, 0.0).astype(x.dtype)
            cnt = jnp.maximum(m.sum(dtype=jnp.float32), 1.0)
            xm = xp * m[..., None]
            mean = xm.sum((0, 1, 2, 3), dtype=jnp.float32) / cnt
            var = (
                jnp.square(xm.astype(jnp.float32)).sum((0, 1, 2, 3)) / cnt
                - jnp.square(mean))
            y = (xp.astype(jnp.float32) - mean) * lax.rsqrt(var + 1e-5)
            y = jnp.maximum(y, 0.0).astype(x.dtype) * m[..., None]
            return (y, y.sum(dtype=jnp.float32))
        return lax.fori_loop(0, ITERS, body, (x0, jnp.float32(0)))[1]

    timed("D masked BN+ReLU st2", mbn, xa, mask)


if __name__ == "__main__":
    main()

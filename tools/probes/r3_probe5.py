"""Round-3 probe 5: dissect the triple-conv body overhead at st2 shape
(90k x 32ch, where x3 currently LOSES 12.56 vs flat 9.49).

Variants (V3 is the floor: gather + einsum, no masking):
  V1 current: 3 mask broadcasts + concat + 4C correction block
  V2 3C, masks only (drops the correction — perf signal, not numerics)
  V3 3C, no masks at all
  V4 3C, block-2 select form: where(center_hit, g2, g1) * m2
  V5 V1 in bf16 (table + operand; f32 accumulate)
  V6 hit-factored: hit*(W.g) + miss-correction (2 scalar masks, no concat)
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
N = 90_000
C = 32
G = 9

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
    per = (best - RTT) / ITERS * 1000.0
    print(f"{name:40s} {per:8.2f} ms/iter  (compile {c:.0f}s, sink {s:.3g})",
          flush=True)
    return per


_DN = lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))

feats0 = jnp.asarray(rng.randn(1, N, C).astype(np.float32))
anchors = jnp.asarray(rng.randint(0, N, size=(G, N)).astype(np.int32))
m0 = jnp.asarray((rng.rand(G, N) < 0.6).astype(np.int32))
m1 = jnp.asarray((rng.rand(G, N) < 0.8).astype(np.int32))
m2 = jnp.asarray((rng.rand(G, N) < 0.6).astype(np.int32))
w3 = jnp.asarray(rng.randn(G, 3 * C, C).astype(np.float32) * 0.04)
wp = jnp.asarray(rng.randn(G, C, C).astype(np.float32) * 0.04)


def build_and_gather(feats, dt):
    feats = feats[0].astype(dt)
    pad = jnp.zeros((1, C), dt)
    padded = jnp.concatenate([pad, feats, pad, pad], axis=0)
    triple = jnp.concatenate(
        [padded[:-2], padded[1:-1], padded[2:]], axis=-1)
    triple = lax.optimization_barrier(triple)
    g = lax.gather(triple, anchors.reshape(-1, 1), _DN,
                   slice_sizes=(1, 3 * C), mode="clip")
    return g.reshape(G, N, 3 * C)


def bc(m, dt):
    return jnp.broadcast_to(m.astype(dt)[..., None], (G, N, C))


def run(fn, feats_in):
    def body(i, carry):
        f = feats_in + carry * jnp.float32(1e-30)
        return fn(f).sum()
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


def v1(f):
    g = build_and_gather(f, jnp.float32)
    mask3 = jnp.concatenate(
        [bc(m0, g.dtype), bc(m1, g.dtype), bc(m2 & m1, g.dtype)], axis=-1)
    corr = g[..., C:2 * C] * bc(m2 & (1 - m1), g.dtype)
    op = jnp.concatenate([g * mask3, corr], axis=-1)
    w4 = jnp.concatenate([w3, wp], axis=1)
    return jnp.einsum("gnc,gcd->nd", op, w4,
                      preferred_element_type=jnp.float32)


def v2(f):
    g = build_and_gather(f, jnp.float32)
    mask3 = jnp.concatenate(
        [bc(m0, g.dtype), bc(m1, g.dtype), bc(m2 & m1, g.dtype)], axis=-1)
    return jnp.einsum("gnc,gcd->nd", g * mask3, w3,
                      preferred_element_type=jnp.float32)


def v3(f):
    g = build_and_gather(f, jnp.float32)
    return jnp.einsum("gnc,gcd->nd", g, w3,
                      preferred_element_type=jnp.float32)


def v4(f):
    g = build_and_gather(f, jnp.float32)
    g0 = g[..., :C] * bc(m0, g.dtype)
    g1 = g[..., C:2 * C]
    g2sel = jnp.where((m1 == 1)[..., None], g[..., 2 * C:], g1)
    op = jnp.concatenate(
        [g0, g1 * bc(m1, g.dtype), g2sel * bc(m2, g.dtype)], axis=-1)
    return jnp.einsum("gnc,gcd->nd", op, w3,
                      preferred_element_type=jnp.float32)


def v5(f):
    g = build_and_gather(f, jnp.bfloat16)
    mask3 = jnp.concatenate(
        [bc(m0, g.dtype), bc(m1, g.dtype), bc(m2 & m1, g.dtype)], axis=-1)
    corr = g[..., C:2 * C] * bc(m2 & (1 - m1), g.dtype)
    op = jnp.concatenate([g * mask3, corr], axis=-1)
    w4 = jnp.concatenate([w3, wp], axis=1).astype(jnp.bfloat16)
    return jnp.einsum("gnc,gcd->nd", op, w4,
                      preferred_element_type=jnp.float32)


def v6(f):
    """hit-factored: out = W012.(g * [m0,1,m2&m1]-ish) with only 2 scalar
    broadcast masks (m0 block + a combined block-2), no 4th block:
    block2 = (m2 * (m1 ? g2 : g1)) folded via two rank-1 masks."""
    g = build_and_gather(f, jnp.float32)
    h = (m1 == 1)[..., None]
    m0f = m0.astype(g.dtype)[..., None]
    m1f = m1.astype(g.dtype)[..., None]
    m2f = m2.astype(g.dtype)[..., None]
    op = jnp.concatenate(
        [g[..., :C] * m0f, g[..., C:2 * C] * m1f,
         jnp.where(h, g[..., 2 * C:], g[..., C:2 * C]) * m2f], axis=-1)
    return jnp.einsum("gnc,gcd->nd", op, w3,
                      preferred_element_type=jnp.float32)


def flat_ref(f):
    idx = jnp.asarray(rng.randint(0, N, size=(27 * N,)).astype(np.int32))
    feats = f[0]
    padded = jnp.concatenate([feats, jnp.zeros((1, C))], 0)
    g = lax.gather(padded, idx[:, None], _DN, slice_sizes=(1, C),
                   mode="clip").reshape(27, N, C)
    w27 = w3.reshape(27, C, C)
    return jnp.einsum("knc,kcd->nd", g, w27,
                      preferred_element_type=jnp.float32)


def main():
    timed("V3 gather+einsum floor", lambda f: run(v3, f), feats0)
    timed("V1 current (4C + corr)", lambda f: run(v1, f), feats0)
    timed("V2 masks only (3C)", lambda f: run(v2, f), feats0)
    timed("V4 select block2 (3C)", lambda f: run(v4, f), feats0)
    timed("V6 rank-1 masks (3C)", lambda f: run(v6, f), feats0)
    timed("V5 bf16 (4C + corr)", lambda f: run(v5, f), feats0)
    timed("flat 27-tap reference", lambda f: run(flat_ref, f), feats0)


if __name__ == "__main__":
    main()

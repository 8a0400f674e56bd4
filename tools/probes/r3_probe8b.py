"""Round-3 probe 8b: is the +25 ms composition loss in x3 MATERIALIZATION
(plan side) or CONSUMPTION (conv side)?
  e) plan builds x3, convs forced FLAT (consume gather_idx, x3 dead-but-
     barriered)  -> if +25 persists, materialization is the cost
  f) plan+2blocks, x3 consumed, but x3 stored FLAT (B, G*N) via concat
     (no (9, N) stack) — monkeypatched derivation — the planned refactor
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from flax import linen as nn

import df3d.ops.sparse as sp
import df3d.models.layers as L
from df3d.models.layers import SparseBasicBlock

GRID = (41, 1440, 1440)
Z, Y, X = GRID
CELLS = Z * Y * X
N = 120_000

rng = np.random.RandomState(0)
raw = np.unique(rng.randint(0, CELLS, size=400_000).astype(np.int64))
keys_np = np.sort(raw[:N]).astype(np.int32)
coords0 = jnp.asarray(np.stack(
    [keys_np // (Y * X), (keys_np // X) % Y, keys_np % X], -1
).astype(np.int32)[None])
feats16 = jnp.asarray(rng.randn(1, N, 16).astype(np.float32))

_f0 = jax.jit(lambda x: x + 1.0)
float(_f0(jnp.float32(1)))
RTT = 1e9
for _ in range(5):
    t0 = time.time()
    float(_f0(jnp.float32(1)))
    RTT = min(RTT, time.time() - t0)
print(f"RTT = {RTT*1000:.1f} ms", flush=True)

ITERS = 8


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
    print(f"{name:36s} {per:8.2f} ms/iter  (compile {c:.0f}s, sink {s:.3g})",
          flush=True)
    return per


def perturb(s):
    return jnp.where(s > jnp.float32(1e30), 1, 0).astype(jnp.int32)


class TB(nn.Module):
    @nn.compact
    def __call__(self, st, p):
        x = SparseBasicBlock(16, name="a")(st, p, False)
        x = SparseBasicBlock(16, name="b")(x, p, False)
        return x.features.sum()


def run_blocks(m, vs, f, c):
    def body(i, carry):
        cc = c + perturb(carry)
        st = sp.SparseTensor(f, cc, GRID, rows_sorted=True)
        p = sp.build_subm_plan(st, 3)
        return jnp.float32(m.apply(vs, st, p))
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


def main():
    m = TB()
    st16 = sp.SparseTensor(feats16, coords0, GRID, rows_sorted=True)
    p16 = sp.build_subm_plan(st16, 3)
    vs = m.init(jax.random.PRNGKey(0), st16, p16)

    # (e) force convs flat while the plan still builds+barriers x3
    orig_apply = sp.apply_sparse_conv

    def flat_apply(f, p, w, precision=None):
        return orig_apply(f, dataclasses.replace(p, x3=None), w,
                          precision=precision)

    L.apply_sparse_conv = flat_apply
    timed("e: x3 built, convs flat",
          lambda f, c: run_blocks(m, vs, f, c), feats16, coords0)
    L.apply_sparse_conv = orig_apply

    # (f) x3 stored flat (B, G*N) via concat; conv reshapes at the end
    orig_derive = sp._x3_from_tap_rows

    def derive_flat(rows_t, n):
        x3_g = []
        for gi in range(len(rows_t) // 3):
            r0, r1, r2 = rows_t[3 * gi], rows_t[3 * gi + 1], rows_t[3 * gi + 2]
            m0 = (r0 < n).astype(jnp.int32)
            m1 = (r1 < n).astype(jnp.int32)
            m2 = (r2 < n).astype(jnp.int32)
            anchor = jnp.where(
                m1 == 1, r1,
                jnp.where(m2 == 1, r2, jnp.where(m0 == 1, r0 + 1, n)))
            x3_g.append(
                anchor | (m0 << 24) | (m1 << 25) | (m2 << 26))
        return jnp.concatenate(x3_g)  # (G*N,) FLAT

    def triple_flat(features, plan, weights, precision):
        b, n_in, cin = features.shape
        gn = plan.x3.shape[1]
        g_cnt = 9
        n_out = gn // g_cnt
        cout = weights.shape[-1]
        x3 = plan.x3
        anchor = x3 & ((1 << 24) - 1)
        m0 = (x3 >> 24) & 1
        m1 = (x3 >> 25) & 1
        m2 = (x3 >> 26) & 1
        dt = features.dtype
        features = lax.optimization_barrier(features)
        pad = jnp.zeros((b, 1, cin), dt)
        padded = jnp.concatenate([pad, features, pad, pad], axis=1)
        triple = jnp.concatenate(
            [padded[:, :-2], padded[:, 1:-1], padded[:, 2:]], axis=-1)
        triple = lax.optimization_barrier(triple)
        idx = anchor + (jnp.arange(b, dtype=jnp.int32) * (n_in + 1))[:, None]
        g = lax.gather(
            triple.reshape(b * (n_in + 1), 3 * cin), idx.reshape(-1, 1),
            sp._DN_ROW, slice_sizes=(1, 3 * cin), mode="clip",
        )  # (B*GN, 3C) flat
        m0f = m0.reshape(-1)[:, None].astype(dt)
        m1f = m1.reshape(-1)[:, None].astype(dt)
        m2f = m2.reshape(-1)[:, None].astype(dt)
        h = (m1.reshape(-1) == 1)[:, None]
        g1 = g[:, cin:2 * cin]
        op = jnp.concatenate(
            [g[:, :cin] * m0f, g1 * m1f,
             jnp.where(h, g[:, 2 * cin:], g1) * m2f], axis=-1)
        op = op.reshape(b, g_cnt, n_out, 3 * cin)
        w3 = weights.reshape(g_cnt, 3 * cin, cout)
        return jnp.einsum("bgnc,gcd->bnd", op, w3,
                          preferred_element_type=jnp.float32,
                          precision=precision)

    sp._x3_from_tap_rows = derive_flat
    sp._conv_x3_triple = triple_flat
    timed("f: x3 FLAT storage+consume",
          lambda f, c: run_blocks(m, vs, f, c), feats16, coords0)
    sp._x3_from_tap_rows = orig_derive


if __name__ == "__main__":
    main()

"""Round-3 probe 7: where do cut@1's +12.8 ms hide? Isolate:
  A) conv_input (120k, cin=5 -> 16): x3 vs flat (15-lane triple table =
     minor-dim poison suspect)
  B) 2x SparseBasicBlock (real modules: BN, residual, masking) at
     120k x 16: x3 vs flat
  C) plan1 build alone: x3 vs flat (the derivation cost re-check)
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
from df3d.models.layers import SparseBasicBlock, SparseConvBNReLU

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
feats5 = jnp.asarray(rng.randn(1, N, 5).astype(np.float32))
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


def main():
    w516 = jnp.asarray(rng.randn(27, 5, 16).astype(np.float32) * 0.1)

    for flag in (True, False):
        sp.set_x3_enabled(flag)
        tag = "x3" if flag else "r2"
        st5 = sp.SparseTensor(feats5, coords0, GRID, rows_sorted=True)
        plan = jax.jit(lambda c: sp.build_subm_plan(
            sp.SparseTensor(feats5, c, GRID, rows_sorted=True), 3))(coords0)

        def conv_in(f, p):
            def body(i, carry):
                ff = f + carry * jnp.float32(1e-30)
                return sp.apply_sparse_conv(ff, p, w516).sum()
            return lax.fori_loop(0, ITERS, body, jnp.float32(0))
        timed(f"{tag} conv_input 5->16",
              lambda f, p: conv_in(f, p), feats5, plan)

        # real module block pair (BN + residual + masking)
        from flax import linen as nn

        class TB(nn.Module):
            @nn.compact
            def __call__(self, st, p):
                x = SparseBasicBlock(16, name="a")(st, p, False)
                x = SparseBasicBlock(16, name="b")(x, p, False)
                return x.features.sum()

        m = TB()
        st16 = sp.SparseTensor(feats16, coords0, GRID, rows_sorted=True)
        plan16 = jax.jit(lambda c: sp.build_subm_plan(
            sp.SparseTensor(feats16, c, GRID, rows_sorted=True), 3))(coords0)
        vs = m.init(jax.random.PRNGKey(0), st16, plan16)

        def blocks(f, p):
            def body(i, carry):
                ff = f + carry * jnp.float32(1e-30)
                return m.apply(
                    vs, sp.SparseTensor(ff, coords0, GRID, rows_sorted=True),
                    p)
            return lax.fori_loop(0, ITERS, body, jnp.float32(0))
        timed(f"{tag} 2x SparseBasicBlock 16ch",
              lambda f, p: blocks(f, p), feats16, plan16)

        def plan_build(c_in):
            def body(i, carry):
                cc = c_in + perturb(carry)
                p = sp.build_subm_plan(
                    sp.SparseTensor(feats16, cc, GRID, rows_sorted=True), 3)
                s = jnp.float32(p.gather_idx.sum())
                if p.x3 is not None:
                    s = s + jnp.float32(p.x3.sum())
                return s
            return lax.fori_loop(0, ITERS, body, jnp.float32(0))
        timed(f"{tag} plan1 build",
              lambda c: plan_build(c), coords0)
    sp.set_x3_enabled(True)


if __name__ == "__main__":
    main()

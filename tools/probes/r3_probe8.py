"""Round-3 probe 8: cut@1-internal bisect. Isolated parts (probe 7): plan
14.2/11.3, conv_input 2.6/6.3, 2 blocks 12.4/24.8 (x3/r2) -> cut@1 should
be ~31/43; measured 55.6/42.9. Variants with IN-GRAPH plan build + coords
perturbation isolate the composition loss:
  a) plan + conv_input
  b) plan + 1 basic block
  c) plan + 2 basic blocks
  d) plan + 2 blocks, conv reading a barriered COPY of x3 (decouple the
     conv from the plan-build schedule)
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
feats16 = jnp.asarray(rng.randn(1, N, 16).astype(np.float32))
feats5 = jnp.asarray(rng.randn(1, N, 5).astype(np.float32))

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


class OneBlock(nn.Module):
    n: int = 1

    @nn.compact
    def __call__(self, st, p):
        x = st
        for i in range(self.n):
            x = SparseBasicBlock(16, name=f"b{i}")(x, p, False)
        return x.features.sum()


class ConvIn(nn.Module):
    @nn.compact
    def __call__(self, st, p):
        x = SparseConvBNReLU(16, subm=True, name="ci")(st, p, False)
        return x.features.sum()


def main():
    for flag in (True, False):
        sp.set_x3_enabled(flag)
        tag = "x3" if flag else "r2"

        ci = ConvIn()
        st5 = sp.SparseTensor(feats5, coords0, GRID, rows_sorted=True)
        p5 = sp.build_subm_plan(st5, 3)
        vs_ci = ci.init(jax.random.PRNGKey(0), st5, p5)

        def v_a(f, c):
            def body(i, carry):
                cc = c + perturb(carry)
                st = sp.SparseTensor(f, cc, GRID, rows_sorted=True)
                p = sp.build_subm_plan(st, 3)
                return jnp.float32(ci.apply(vs_ci, st, p))
            return lax.fori_loop(0, ITERS, body, jnp.float32(0))
        timed(f"{tag} a: plan+conv_input",
              lambda f, c: v_a(f, c), feats5, coords0)

        for nblocks in (1, 2):
            m = OneBlock(nblocks)
            st16 = sp.SparseTensor(feats16, coords0, GRID, rows_sorted=True)
            p16 = sp.build_subm_plan(st16, 3)
            vs = m.init(jax.random.PRNGKey(0), st16, p16)

            def v_bc(f, c, m=m, vs=vs):
                def body(i, carry):
                    cc = c + perturb(carry)
                    st = sp.SparseTensor(f, cc, GRID, rows_sorted=True)
                    p = sp.build_subm_plan(st, 3)
                    return jnp.float32(m.apply(vs, st, p))
                return lax.fori_loop(0, ITERS, body, jnp.float32(0))
            timed(f"{tag} {'bc'[nblocks-1]}: plan+{nblocks}x block",
                  lambda f, c, fn=v_bc: fn(f, c), feats16, coords0)

        if flag:
            m = OneBlock(2)
            st16 = sp.SparseTensor(feats16, coords0, GRID, rows_sorted=True)
            p16 = sp.build_subm_plan(st16, 3)
            vs = m.init(jax.random.PRNGKey(0), st16, p16)

            def v_d(f, c):
                def body(i, carry):
                    cc = c + perturb(carry)
                    st = sp.SparseTensor(f, cc, GRID, rows_sorted=True)
                    p = sp.build_subm_plan(st, 3)
                    p = dataclasses.replace(
                        p, x3=lax.optimization_barrier(p.x3))
                    return jnp.float32(m.apply(vs, st, p))
                return lax.fori_loop(0, ITERS, body, jnp.float32(0))
            timed("x3 d: re-barriered x3",
                  lambda f, c: v_d(f, c), feats16, coords0)
    sp.set_x3_enabled(True)


if __name__ == "__main__":
    main()

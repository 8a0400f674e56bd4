"""Round-3 probe 6: bisect the in-model x3 regression by truncating the
SpMiddleResNetFHD stage chain (components win, full backbone loses 22 ms —
find the stage where composition goes wrong). Cuts:
  1 = plan1 + conv_input + res1a + res1b             (st1, x3 active)
  2 = + down2 + plan2 + res2a + res2b                (st2, x3 active)
  3 = + down3 + plan3 + res3a + res3b                (st3, x3 OFF)
  4 = + down4 + plan4 + res4a + res4b + extra        (st4, x3 OFF)
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

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
CAPS = (120_000, 90_000, 55_000, 30_000)

rng = np.random.RandomState(0)
raw = np.unique(rng.randint(0, CELLS, size=400_000).astype(np.int64))
keys_np = np.sort(raw[:120_000]).astype(np.int32)
coords0 = jnp.asarray(np.stack(
    [keys_np // (Y * X), (keys_np // X) % Y, keys_np % X], -1
).astype(np.int32)[None])
feats0 = jnp.asarray(rng.randn(1, 120_000, 5).astype(np.float32))

_f0 = jax.jit(lambda x: x + 1.0)
float(_f0(jnp.float32(1)))
RTT = 1e9
for _ in range(5):
    t0 = time.time()
    float(_f0(jnp.float32(1)))
    RTT = min(RTT, time.time() - t0)
print(f"RTT = {RTT*1000:.1f} ms", flush=True)


class Trunc(nn.Module):
    cut: int

    @nn.compact
    def __call__(self, st, train: bool = False):
        c1, c2, c3, c4 = 16, 32, 64, 128
        n1, n2, n3, n4 = CAPS
        plan1 = sp.build_subm_plan(st, 3)
        x = SparseConvBNReLU(c1, subm=True, name="conv_input")(st, plan1, train)
        x = SparseBasicBlock(c1, name="res1a")(x, plan1, train)
        x = SparseBasicBlock(c1, name="res1b")(x, plan1, train)
        if self.cut == 1:
            return x.features.sum()
        down2 = sp.build_conv_plan(x, 3, 2, 1, max_out=n2)
        x = SparseConvBNReLU(c2, subm=False, name="down2")(x, down2, train)
        plan2 = sp.build_subm_plan(x, 3)
        x = SparseBasicBlock(c2, name="res2a")(x, plan2, train)
        x = SparseBasicBlock(c2, name="res2b")(x, plan2, train)
        if self.cut == 2:
            return x.features.sum()
        down3 = sp.build_conv_plan(x, 3, 2, 1, max_out=n3)
        x = SparseConvBNReLU(c3, subm=False, name="down3")(x, down3, train)
        plan3 = sp.build_subm_plan(x, 3, with_x3=False)
        x = SparseBasicBlock(c3, name="res3a")(x, plan3, train)
        x = SparseBasicBlock(c3, name="res3b")(x, plan3, train)
        if self.cut == 3:
            return x.features.sum()
        down4 = sp.build_conv_plan(x, 3, 2, (0, 1, 1), max_out=n4)
        x = SparseConvBNReLU(c4, subm=False, name="down4")(x, down4, train)
        plan4 = sp.build_subm_plan(x, 3, with_x3=False)
        x = SparseBasicBlock(c4, name="res4a")(x, plan4, train)
        x = SparseBasicBlock(c4, name="res4b")(x, plan4, train)
        extra = sp.build_conv_plan(x, (3, 1, 1), (2, 1, 1), 0, max_out=n4)
        x = SparseConvBNReLU(c4, subm=False, name="extra")(x, extra, train)
        return x.features.sum()


def timed(name, fn, *args, iters=4):
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
    print(f"{name:28s} {per:8.2f} ms/iter  (compile {c:.0f}s, sink {s:.3g})",
          flush=True)
    return per


def perturb(s):
    return jnp.where(s > jnp.float32(1e30), 1, 0).astype(jnp.int32)


def main():
    results = {}
    for cut in (1, 2, 3, 4):
        for flag in (True, False):
            sp.set_x3_enabled(flag)
            tag = "x3" if flag else "r2"
            m = Trunc(cut)
            vs = jax.jit(lambda f, c: m.init(
                jax.random.PRNGKey(0),
                sp.SparseTensor(f, c, GRID, rows_sorted=True))
            )(feats0, coords0)

            def fwd(vs, f, c):
                def body(i, carry):
                    cc = c + perturb(carry)
                    return jnp.float32(m.apply(
                        vs, sp.SparseTensor(f, cc, GRID, rows_sorted=True)))
                return lax.fori_loop(0, 4, body, jnp.float32(0))

            results[(cut, tag)] = timed(
                f"{tag} cut@{cut}", lambda v, f, c: fwd(v, f, c),
                vs, feats0, coords0)
    sp.set_x3_enabled(True)
    print("--- deltas (x3 - r2) per added stage ---", flush=True)
    prev = {"x3": 0.0, "r2": 0.0}
    for cut in (1, 2, 3, 4):
        dx = results[(cut, "x3")] - prev["x3"]
        dr = results[(cut, "r2")] - prev["r2"]
        print(f"stage block {cut}: x3 {dx:7.2f}  r2 {dr:7.2f}  "
              f"delta {dx-dr:+7.2f}", flush=True)
        prev = {"x3": results[(cut, "x3")], "r2": results[(cut, "r2")]}


if __name__ == "__main__":
    main()

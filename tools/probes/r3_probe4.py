"""Round-3 probe 4: why is e2e 221 ms when components say ~168?

  1. st2-shaped conv A/B: (90k, 32->32) triple vs flat. The triple table is
     f32 (90k, 96) = 34.5 MB — beyond every size probe1 covered; if >32 MB
     tables fall to HBM-latency rates the st2/down3 triples LOSE in-model.
  2. raw gather rates for (90k, 96) f32 / (120k, 48+16pad) variants.
  3. FULL SpMiddleResNetFHD backbone at bench shapes, X3 on vs off — the
     end-to-end accounting check with everything else held fixed.
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

ITERS = 8
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


_DN = lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))


def p_rate(table, idx0):
    n = table.shape[0]

    def body(i, carry):
        idx = jnp.minimum(idx0 + perturb(carry), n - 1)
        g = lax.gather(table, idx[:, None], _DN,
                       slice_sizes=(1, table.shape[1]), mode="clip")
        return jnp.float32(g.sum(dtype=jnp.float32))
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


def conv_chain(feats_in, plan, w1, w2):
    def body(i, carry):
        f = feats_in + carry * jnp.float32(1e-30)
        h = sp.apply_sparse_conv(f, plan, w1)
        h = sp.apply_sparse_conv(h, plan, w2)
        return h.sum()
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))


def main():
    # raw gather rates around the 16-35 MB boundary
    Q = 1_000_000
    for rows, c, dt, note in (
        (90_000, 96, jnp.float32, "34.5MB st2 triple f32"),
        (90_000, 96, jnp.bfloat16, "17.3MB st2 triple bf16"),
        (120_000, 48, jnp.float32, "23MB st1 triple f32"),
        (55_000, 96, jnp.float32, "21MB down3 triple f32"),
    ):
        table = jnp.asarray(rng.randn(rows, c).astype(np.float32)).astype(dt)
        idx0 = jnp.asarray(rng.randint(0, rows, size=Q).astype(np.int32))
        timed(f"rate ({rows//1000}k,{c}) {dt.__name__} {note}",
              lambda t, i: p_rate(t, i), table, idx0)

    # st2-shaped conv A/B
    c2 = coords_of(90_000)
    feats32 = jnp.asarray(rng.randn(1, 90_000, 32).astype(np.float32))
    w32 = jnp.asarray(rng.randn(27, 32, 32).astype(np.float32) * 0.05)
    for flag in (True, False):
        sp.set_x3_enabled(flag)
        tag = "x3" if flag else "r2"
        st2 = sp.SparseTensor(feats32, c2, GRID, rows_sorted=True)
        plan2 = jax.jit(lambda c: sp.build_subm_plan(
            sp.SparseTensor(feats32, c, GRID, rows_sorted=True), 3))(c2)
        timed(f"{tag} 2x subm conv st2 (90k x 32ch)",
              lambda f, p, a, b: conv_chain(f, p, a, b),
              feats32, plan2, w32, w32)
    sp.set_x3_enabled(True)

    # full backbone A/B at bench shapes
    from df3d.models.backbones_3d import SpMiddleResNetFHD

    n1 = 120_000
    c1 = coords_of(n1)
    featsv = jnp.asarray(rng.randn(1, n1, 5).astype(np.float32))
    caps = (120_000, 90_000, 55_000, 30_000)

    for flag in (True, False):
        sp.set_x3_enabled(flag)
        tag = "x3" if flag else "r2"
        bb = SpMiddleResNetFHD(5, caps)
        st = sp.SparseTensor(featsv, c1, GRID, rows_sorted=True)
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
                return jnp.float32(bev.sum())
            return lax.fori_loop(0, 4, body, jnp.float32(0))

        timed(f"{tag} FULL backbone fwd", lambda v, f, c: fwd(v, f, c),
              vs, featsv, c1, iters=4)
    sp.set_x3_enabled(True)


if __name__ == "__main__":
    main()

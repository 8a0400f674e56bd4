"""Round-5 probe 12: decompose the dense stage-4 tail (residual budget says
~19-21 ms; r3 probe 12 measured densify-at-stage-3 alone at 13-15 ms) and
test the HYBRID now enabled by mini-rank plans:

  A. shipped tail: densify(st3: (11,360,360)x64 = 364 MB) -> dense down4
     -> res4a/b -> extra_conv -> bev
  B. densify(st3) alone
  C. hybrid: SPARSE down4 (mini plan 1.0 ms + body 0.3 ms) -> densify the
     (6,180,180)x128 = 33 MB stage-4 grid -> dense res4a/b -> extra -> bev
  D. C's densify alone
Semantics: identical up to the stage-4 cap (hybrid reintroduces the n4
truncation the dense-from-down4 path avoided; cap_overflow stays logged
and fitted caps have headroom).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

IT = 8
CAPS = (102_400, 73_728, 27_648, 10_240)
GRID = (40, 1440, 1440)
PC_RANGE = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
VOX = (0.075, 0.075, 0.2)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from df3d.ops.dense3d import (
        DenseConvSpec, bev_from_dense, dense_conv, densify,
    )
    from df3d.ops.sparse import (
        SparseTensor, apply_sparse_conv, build_conv_plan,
    )
    from df3d.ops.voxelize import voxelize_batch

    cache_dir = str(pathlib.Path(__file__).resolve().parents[2] / ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from df3d.utils.synth import make_raycast_frame

    rng = np.random.RandomState(100)
    pts = make_raycast_frame(rng, 260_000)
    points = jnp.asarray(pts[None])
    valid = jnp.ones(points.shape[:2], bool)

    RTT = [0.0]

    def timeit(name, fn, *args, iters=IT):
        t0c = time.perf_counter()
        out = float(fn(*args))
        t1c = time.perf_counter()
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = float(fn(*args))
            best = min(best, time.perf_counter() - t0)
        per = (best - RTT[0]) / iters
        print(f"{name:46s} {per*1e3:7.2f} ms  (compile {t1c-t0c:.0f}s)",
              flush=True)
        return per

    f = jax.jit(lambda v: v + 1.0)
    float(f(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(20):
        float(f(jnp.float32(0)))
    RTT[0] = (time.perf_counter() - t0) / 20
    print(f"RTT: {RTT[0]*1e3:.2f} ms", flush=True)

    res = jax.jit(lambda p, v: voxelize_batch(
        p, v, VOX, PC_RANGE, GRID, CAPS[0], 10))(points, valid)
    st1 = SparseTensor(jnp.zeros((1, CAPS[0], 16), jnp.float32), res.coords,
                       (41, 1440, 1440), rows_sorted=True)

    def tost3(st):
        d2 = build_conv_plan(st, 3, 2, 1, max_out=CAPS[1])
        st2 = SparseTensor(jnp.zeros((1, CAPS[1], 32)), d2.out_coords,
                           d2.out_spatial_shape, rows_sorted=True)
        d3 = build_conv_plan(st2, 3, 2, 1, max_out=CAPS[2])
        return SparseTensor(
            jnp.asarray(np.random.RandomState(1).randn(
                1, CAPS[2], 64).astype(np.float32)),
            d3.out_coords, d3.out_spatial_shape, rows_sorted=True)

    st3 = jax.jit(tost3)(st1)

    w_d4 = jnp.asarray(rng.randn(27, 64, 128).astype(np.float32) * 0.05)
    w_s = jnp.asarray(rng.randn(27, 128, 128).astype(np.float32) * 0.05)
    w_x = jnp.asarray(rng.randn(3, 128, 128).astype(np.float32) * 0.05)
    spec_d4 = DenseConvSpec((3, 3, 3), (2, 2, 2), (0, 1, 1))
    spec_s = DenseConvSpec((3, 3, 3), (1, 1, 1), (1, 1, 1))
    spec_x = DenseConvSpec((3, 1, 1), (2, 1, 1), (0, 0, 0))

    def rt0f(s):
        return s * jnp.float32(1e-38)

    def a_chain(f0):
        def body(i, carry):
            feats, s = carry
            st = st3.with_features(feats)
            dt = densify(st)
            x = dense_conv(dt, w_d4, spec_d4.ksize, spec_d4.stride,
                           spec_d4.padding, subm=False)
            x = dense_conv(x, w_s, spec_s.ksize, 1, spec_s.padding, subm=True)
            x = dense_conv(x, w_s, spec_s.ksize, 1, spec_s.padding, subm=True)
            x = dense_conv(x, w_x, spec_x.ksize, spec_x.stride,
                           spec_x.padding, subm=False)
            bev = bev_from_dense(x)
            s2 = bev.sum()
            return (feats + rt0f(s2), s2)
        return lax.fori_loop(0, IT, body, (f0, jnp.float32(0)))[1]

    timeit("A shipped tail (densify st3 first)", jax.jit(a_chain),
           st3.features)

    def b_chain(f0):
        def body(i, carry):
            feats, s = carry
            dt = densify(st3.with_features(feats))
            s2 = dt.features[0, 0, 0, 0, 0] + dt.features.sum() * 0
            s2 = dt.features.sum()
            return (feats + rt0f(s2), s2)
        return lax.fori_loop(0, IT, body, (f0, jnp.float32(0)))[1]

    timeit("B densify(st3) alone", jax.jit(b_chain), st3.features)

    d4 = jax.jit(lambda s: build_conv_plan(
        s, 3, 2, (0, 1, 1), max_out=CAPS[3]))(st3)

    def c_chain(f0):
        def body(i, carry):
            feats, s = carry
            st = st3.with_features(feats)
            p4 = build_conv_plan(st, 3, 2, (0, 1, 1), max_out=CAPS[3])
            f4 = apply_sparse_conv(feats, p4, w_d4)
            st4 = SparseTensor(f4, p4.out_coords, p4.out_spatial_shape,
                               rows_sorted=True)
            dt = densify(st4)
            x = dense_conv(dt, w_s, spec_s.ksize, 1, spec_s.padding,
                           subm=True)
            x = dense_conv(x, w_s, spec_s.ksize, 1, spec_s.padding, subm=True)
            x = dense_conv(x, w_x, spec_x.ksize, spec_x.stride,
                           spec_x.padding, subm=False)
            bev = bev_from_dense(x)
            s2 = bev.sum()
            return (feats + rt0f(s2), s2)
        return lax.fori_loop(0, IT, body, (f0, jnp.float32(0)))[1]

    timeit("C hybrid (sparse down4 -> densify st4)", jax.jit(c_chain),
           st3.features)

    st4c = SparseTensor(
        jnp.asarray(rng.randn(1, CAPS[3], 128).astype(np.float32)),
        d4.out_coords, d4.out_spatial_shape, rows_sorted=True)

    def d_chain(f0):
        def body(i, carry):
            feats, s = carry
            dt = densify(st4c.with_features(feats))
            s2 = dt.features.sum()
            return (feats + rt0f(s2), s2)
        return lax.fori_loop(0, IT, body, (f0, jnp.float32(0)))[1]

    timeit("D densify(st4) alone", jax.jit(d_chain), st4c.features)


if __name__ == "__main__":
    main()

"""Round-5 probe 9: the model's FIRST conv (conv_input) gathers 5-feature
rows = 20 B — in the v5e 4-32B gather class (4.7-6.8 ns/row), not the 64B
2 ns class every other conv body enjoys. Measure it and the fix: zero-pad
features (and weight input rows) to 16 channels so the gather moves 64B
rows at the fast issue rate (more bytes, but the op is issue-bound).

  A. conv st1, cin=5  (as the model runs today)
  B. conv st1, cin=5 padded to 8  (32B rows)
  C. conv st1, cin=5 padded to 16 (64B rows)
  D. KITTI-style cin=4 vs padded-16 for reference
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

IT = 8
CAPS = (102_400,)
GRID = (40, 1440, 1440)
PC_RANGE = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
VOX = (0.075, 0.075, 0.2)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from df3d.ops.sparse import (
        SparseTensor, apply_sparse_conv, build_subm_plan,
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
    plan = jax.jit(lambda s: build_subm_plan(s, 3))(st1)

    def conv_chain(cin, pad_to=None):
        cin_eff = pad_to or cin
        w = jnp.asarray(
            rng.randn(27, cin_eff, 16).astype(np.float32) * 0.1)
        if pad_to:
            w = w.at[:, cin:].set(0.0)
        feats = jnp.asarray(
            rng.randn(1, CAPS[0], cin).astype(np.float32))
        if pad_to:
            feats = jnp.pad(feats, ((0, 0), (0, 0), (0, pad_to - cin)))
        back = jnp.asarray(rng.randn(16, cin_eff).astype(np.float32) * 0.1)

        def run(f0):
            def body(i, fx):
                o = apply_sparse_conv(fx, plan, w)  # (1, N, 16)
                return fx * 0.5 + (o @ back) * 0.01
            return lax.fori_loop(0, IT, body, f0).sum()
        return jax.jit(run), feats

    for cin, pad_to, nm in ((5, None, "A cin=5 (today)"),
                            (5, 8, "B cin=5 pad->8"),
                            (5, 16, "C cin=5 pad->16"),
                            (4, None, "D cin=4 (KITTI)"),
                            (4, 16, "E cin=4 pad->16")):
        fn, feats = conv_chain(cin, pad_to)
        timeit(nm, fn, feats)


if __name__ == "__main__":
    main()

"""Round-5 probe 10: the BEV neck+head tail costs ~17.5 ms for ~1 ms of
MXU FLOPs and is bf16-insensitive (probe 8) — per-op/layout overhead, not
bandwidth. Measure one neck layer and alternative formulations:

  A. nn.Conv path (lax.conv_general_dilated), (1,180,180,128)->128, 3x3
  B. 9-shifted-matmul form of the same conv (einsum per tap over a padded
     map — turns the conv into MXU dot ops with trivial scheduling)
  C. A at stage-2 shape (1,90,90,256)->256
  D. B at stage-2 shape
  E. whole-neck chains: 6 layers of A vs 6 layers of B at stage-1 shape
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

IT = 8


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    cache_dir = str(pathlib.Path(__file__).resolve().parents[2] / ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    rng = np.random.RandomState(0)
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

    def conv_xla(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def conv_mm(x, w):
        # 9-shifted-matmul: pad, slice per tap, one einsum per tap
        b, h, ww, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = None
        for dy in range(3):
            for dx in range(3):
                sl = lax.dynamic_slice(
                    xp, (0, dy, dx, 0), (b, h, ww, c))
                t = jnp.einsum("bhwc,cd->bhwd", sl, w[dy, dx],
                               preferred_element_type=jnp.float32)
                out = t if out is None else out + t
        return out

    def layer_chain(shape, cin, conv):
        w = jnp.asarray(rng.randn(3, 3, cin, cin).astype(np.float32) * 0.05)
        x0 = jnp.asarray(rng.randn(*shape).astype(np.float32))

        def run(x):
            def body(i, xx):
                o = conv(xx, w)
                return jnp.maximum(o, 0) * 0.1 + xx * 0.5
            return lax.fori_loop(0, IT, body, x).sum()
        return jax.jit(run), x0

    s1 = (1, 180, 180, 128)
    s2 = (1, 90, 90, 256)
    fn, x0 = layer_chain(s1, 128, conv_xla)
    timeit("A conv_xla 180x180x128", fn, x0)
    fn, x0 = layer_chain(s1, 128, conv_mm)
    timeit("B conv_mm  180x180x128", fn, x0)
    fn, x0 = layer_chain(s2, 256, conv_xla)
    timeit("C conv_xla 90x90x256", fn, x0)
    fn, x0 = layer_chain(s2, 256, conv_mm)
    timeit("D conv_mm  90x90x256", fn, x0)

    # numerics check
    w = jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.05)
    x = jnp.asarray(rng.randn(1, 16, 16, 64).astype(np.float32))
    a = jax.jit(conv_xla)(x, w)
    b = jax.jit(conv_mm)(x, w)
    print("mm == xla:", float(jnp.abs(a - b).max()), flush=True)


if __name__ == "__main__":
    main()

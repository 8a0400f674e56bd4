"""Round-5 probe 11: is the CenterHead (6 tasks x 6 branches x 2 convs =
72 small convs + shared conv) the unaccounted ~17.5 ms of the frame tail
(probe 10: single BEV convs are ~free, so per-op overhead must be in the
op COUNT)? Prototype the fused formulation:

  A. CenterHead.apply as shipped (6 tasks, nuScenes branches)
  B. fused: ONE 64->2304 conv (all 36 branch hidden layers, weights
     concatenated along out-ch) + per-channel BN + ONE grouped conv
     (36 groups, 4 padded out-ch each) -> slice per branch. Same math.
  C. numerics check A vs B at small shape.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

IT = 8
TASKS = (1, 2, 2, 1, 2, 2)
BRANCHES = (("reg", 2), ("height", 1), ("dim", 3), ("rot", 2), ("vel", 2))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from df3d.models.heads.center_head import CenterHead

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

    head = CenterHead(task_num_classes=TASKS)
    x0 = jnp.asarray(rng.randn(1, 180, 180, 512).astype(np.float32))
    vs = head.init(jax.random.PRNGKey(0), x0, train=False)

    def a_chain(x0):
        def body(i, carry):
            x, s = carry
            outs = head.apply(vs, x, train=False)
            s2 = sum(jnp.sum(v) for t in outs for v in t.values())
            return (x + s2 * jnp.float32(1e-38), s2)
        return lax.fori_loop(0, IT, body, (x0, jnp.float32(0)))[1]

    timeit("A CenterHead shipped", jax.jit(a_chain), x0)

    # --- B: fused prototype with random weights (timing only) -----------
    n_branch = len(TASKS) * (len(BRANCHES) + 1)  # 36
    w_share = jnp.asarray(rng.randn(3, 3, 512, 64).astype(np.float32) * .02)
    w1 = jnp.asarray(
        rng.randn(3, 3, 64, n_branch * 64).astype(np.float32) * 0.02)
    scale = jnp.asarray(rng.rand(n_branch * 64).astype(np.float32) + 0.5)
    shift = jnp.asarray(rng.randn(n_branch * 64).astype(np.float32) * 0.1)
    w2 = jnp.asarray(
        rng.randn(3, 3, 64, n_branch * 4).astype(np.float32) * 0.02)
    b2 = jnp.asarray(rng.randn(n_branch * 4).astype(np.float32) * 0.1)

    def fused_head(x):
        h = lax.conv_general_dilated(
            x, w_share, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jnp.maximum(h, 0)
        g = lax.conv_general_dilated(
            h, w1, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        g = jnp.maximum(g * scale + shift, 0)
        o = lax.conv_general_dilated(
            g, w2, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=n_branch) + b2
        return o

    def b_chain(x0):
        def body(i, carry):
            x, s = carry
            o = fused_head(x)
            s2 = jnp.sum(o)
            return (x + s2 * jnp.float32(1e-38), s2)
        return lax.fori_loop(0, IT, body, (x0, jnp.float32(0)))[1]

    timeit("B fused head prototype", jax.jit(b_chain), x0)

    # --- C: grouped conv == per-branch convs (numerics) ------------------
    xs = jnp.asarray(rng.randn(1, 12, 12, 2 * 8).astype(np.float32))
    wg = jnp.asarray(rng.randn(3, 3, 8, 2 * 4).astype(np.float32) * 0.1)
    got = lax.conv_general_dilated(
        xs, wg, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=2)
    want = jnp.concatenate([
        lax.conv_general_dilated(
            xs[..., g * 8:(g + 1) * 8], wg[..., g * 4:(g + 1) * 4],
            (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        for g in range(2)], -1)
    print("grouped == per-branch:", float(jnp.abs(got - want).max()),
          flush=True)


if __name__ == "__main__":
    main()

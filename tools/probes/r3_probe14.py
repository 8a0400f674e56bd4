"""Round-3 probe 14: Mosaic `tpu.dynamic_gather` capability + rate on v5e.

jax 0.9 Mosaic lowers lax.gather ONLY as take_along_axis(x, idx, axis=0|1)
with idx.shape == x.shape on 2D arrays (per-lane / per-sublane permutation;
jax/_src/pallas/mosaic/lowering.py:2464-2524). The r1 fused conv kernel
failed because its tile idx shape != table shape. VERDICT r2 idea (a):
make them EQUAL (tile == table) and check whether the permutation runs at
vector rate from VMEM. This probe answers, on the real chip:

  1. which (R, C) shapes lower at all, for axis=0 and axis=1
  2. ns/row vs the XLA HBM-gather floor (~2 ns/row @ 64B rows)
  3. a fused 27-tap gather+GEMM microkernel at stage-1-like scale
"""

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 8

_f0 = jax.jit(lambda x: x + 1.0)
float(_f0(jnp.float32(1)))
RTT = 1e9
for _ in range(5):
    t0 = time.time()
    float(_f0(jnp.float32(1)))
    RTT = min(RTT, time.time() - t0)
print(f"RTT = {RTT*1000:.1f} ms", flush=True)


def perturb_i(s):
    # runtime-zero int derived from a float scalar (defeats CSE/hoisting)
    return jnp.where(s > jnp.float32(1e30), 1, 0).astype(jnp.int32)


def timed(name, fn, *args, iters=ITERS, rows=None):
    try:
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
        extra = f"  {per/rows*1e6:8.2f} ns/row" if rows else ""
        print(f"{name:52s} {per:8.3f} ms/iter{extra}  "
              f"(compile {c:.0f}s, sink {s:.3g})", flush=True)
        return per
    except Exception as e:
        msg = str(e).split("\n")[0][:90]
        print(f"{name:52s} FAIL: {type(e).__name__}: {msg}", flush=True)
        return None


def make_taa_kernel(axis):
    def kern(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=axis)
    return kern


def taa_pallas(x, idx, axis):
    return pl.pallas_call(
        make_taa_kernel(axis),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, idx)


def chain_taa(x, idx, axis, iters=ITERS):
    # feed a runtime-zero from out back into idx so the chain can't hoist
    def body(i, carry):
        ii = idx + perturb_i(carry)
        o = taa_pallas(x, ii, axis)
        return jnp.float32(o.sum(dtype=jnp.float32))
    return lax.fori_loop(0, iters, body, jnp.float32(0))


def fused_tap_kernel(x_ref, idx_ref, w_ref, o_ref, *, taps):
    # x (R, C) table; idx (taps, R, C) per-tap row permutations;
    # w (taps, C, CO); o (R, CO)
    x = x_ref[...]
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for k in range(taps):
        rows = jnp.take_along_axis(x, idx_ref[k], axis=0)
        acc += jnp.dot(rows, w_ref[k], preferred_element_type=jnp.float32)
    o_ref[...] = acc


def fused_taps(x, idx, w):
    taps = idx.shape[0]
    return pl.pallas_call(
        functools.partial(fused_tap_kernel, taps=taps),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], w.shape[-1]),
                                       jnp.float32),
    )(x, idx, w)


def chain_fused(x, idx, w, iters=ITERS):
    def body(i, carry):
        ii = idx + perturb_i(carry)
        o = fused_taps(x, ii, w)
        return jnp.float32(o.sum(dtype=jnp.float32))
    return lax.fori_loop(0, iters, body, jnp.float32(0))


def main():
    rng = np.random.RandomState(0)

    # trivial pallas sanity (does Mosaic work through the relay at all?)
    def addk(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0
    try:
        out = pl.pallas_call(
            addk, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32)
        )(jnp.zeros((256, 256), jnp.float32))
        print(f"pallas add sanity: ok sum={float(out.sum()):.0f}", flush=True)
    except Exception as e:
        print(f"pallas add sanity FAILED: {e}", flush=True)
        return

    # --- CORRECTNESS first: the lowering may compile yet mis-gather
    # across vregs; compare vs the XLA gather on-chip ---
    for (r, c, axis) in [(8, 128, 0), (512, 128, 0), (8192, 128, 0),
                         (2048, 16, 0), (8, 2048, 1), (128, 2048, 1)]:
        x = jnp.asarray(rng.randn(r, c).astype(np.float32))
        idx = jnp.asarray(
            rng.randint(0, x.shape[axis], (r, c)).astype(np.int32))
        try:
            got = np.asarray(taa_pallas(x, idx, axis))
            ref = np.asarray(jnp.take_along_axis(x, idx, axis=axis))
            err = np.abs(got - ref).max()
            print(f"correct axis={axis} ({r},{c}): max err {err:.3g}"
                  f"{'  *** WRONG ***' if err > 1e-6 else ''}", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:90]
            print(f"correct axis={axis} ({r},{c}): FAIL {msg}", flush=True)

    # --- axis=0 (cross-sublane row permutation) rate sweep ---
    for (r, c) in [(8, 128), (64, 128), (512, 128), (2048, 128),
                   (8192, 128), (512, 16), (2048, 16), (8192, 16),
                   (32768, 16), (2048, 512)]:
        x = jnp.asarray(rng.randn(r, c).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, r, (r, c)).astype(np.int32))
        timed(f"taa axis=0 ({r},{c}) f32", lambda x, i: chain_taa(x, i, 0),
              x, idx, rows=r)

    # --- axis=1 (per-sublane lane permutation) ---
    for (r, c) in [(8, 128), (8, 2048), (128, 2048), (16, 8192)]:
        x = jnp.asarray(rng.randn(r, c).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, c, (r, c)).astype(np.int32))
        timed(f"taa axis=1 ({r},{c}) f32", lambda x, i: chain_taa(x, i, 1),
              x, idx, rows=r * c // 16)

    # --- fused 27-tap gather+GEMM microkernel, stage-1-like tile ---
    # table (R,16)->(R,16) conv: idx (27,R,16), w (27,16,16)
    for r in [2048, 8192]:
        x = jnp.asarray(rng.randn(r, 16).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, r, (27, r, 16)).astype(np.int32))
        w = jnp.asarray((rng.randn(27, 16, 16) * 0.1).astype(np.float32))
        timed(f"fused 27-tap conv tile ({r},16)",
              lambda x, i, w: chain_fused(x, i, w), x, idx, w,
              rows=27 * r)
    # stage-4-like: (R,128)x128
    for r in [2048]:
        x = jnp.asarray(rng.randn(r, 128).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, r, (27, r, 128)).astype(np.int32))
        w = jnp.asarray((rng.randn(27, 128, 128) * 0.1).astype(np.float32))
        timed(f"fused 27-tap conv tile ({r},128)",
              lambda x, i, w: chain_fused(x, i, w), x, idx, w,
              rows=27 * r)

    # --- the REAL candidate: v2 whole-table kernel at backbone scales ---
    from df3d.ops.pallas.sparse_conv_kernel import (
        apply_sparse_conv_pallas_v2,
    )
    from df3d.ops.sparse import ConvPlan, apply_sparse_conv

    def chain_v2(f, idx, w, dt, iters=ITERS):
        def body(i, carry):
            ii = idx + perturb_i(carry)
            o = apply_sparse_conv_pallas_v2(f, ii, w, dt)
            return jnp.float32(o.sum(dtype=jnp.float32))
        return lax.fori_loop(0, iters, body, jnp.float32(0))

    def chain_xla(f, idx, w, iters=ITERS):
        def body(i, carry):
            ii = idx + perturb_i(carry)
            flat = ii.reshape(ii.shape[0], -1)
            plan = ConvPlan(
                flat, jnp.zeros((1, idx.shape[-1], 3), jnp.int32),
                (1, 1, 1), (idx.shape[1], 1, 1))
            o = apply_sparse_conv(f, plan, w)
            return jnp.float32(o.sum(dtype=jnp.float32))
        return lax.fori_loop(0, iters, body, jnp.float32(0))

    for (n, cin, cout, dt, tag) in [
        (120_000, 16, 16, None, "st1 f32"),
        (120_000, 16, 16, jnp.bfloat16, "st1 bf16"),
        (90_000, 32, 32, jnp.bfloat16, "st2 bf16"),
        (55_000, 64, 64, jnp.bfloat16, "st3 bf16"),
    ]:
        f = jnp.asarray(rng.randn(1, n, cin).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, n, (1, 27, n)).astype(np.int32))
        w = jnp.asarray((rng.randn(27, cin, cout) * 0.1).astype(np.float32))
        # correctness on-chip first
        try:
            got = np.asarray(apply_sparse_conv_pallas_v2(f, idx, w, dt))
            flat = idx.reshape(1, -1)
            plan = ConvPlan(flat, jnp.zeros((1, n, 3), jnp.int32),
                            (1, 1, 1), (27, 1, 1))
            ref = np.asarray(apply_sparse_conv(
                f.astype(dt) if dt else f, plan,
                w.astype(dt) if dt else w).astype(np.float32))
            err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6)
            print(f"v2 {tag} ({n},{cin})->{cout}: rel err {err:.3g}"
                  f"{'  *** WRONG ***' if err > 2e-2 else ''}", flush=True)
        except Exception as e:
            print(f"v2 {tag}: FAIL {str(e).splitlines()[0][:90]}", flush=True)
            continue
        timed(f"v2 conv {tag} ({n},{cin})->{cout}",
              lambda f, i, w: chain_v2(f, i, w, dt), f, idx, w,
              rows=27 * n)
        timed(f"xla conv {tag} ({n},{cin})->{cout}",
              lambda f, i, w: chain_xla(f, i, w), f, idx, w,
              rows=27 * n)


if __name__ == "__main__":
    main()

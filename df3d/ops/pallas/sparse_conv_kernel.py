"""Pallas TPU kernel: fused gather-GEMM sparse convolution (v2).

The XLA tap-scan (df3d.ops.sparse.apply_sparse_conv) writes each gathered
(N, Cin) tap matrix back to HBM before its matmul. This kernel keeps the
ENTIRE feature table resident in VMEM (the backbones' stages fit: 120k x 16
.. 30k x 128 ~ 8-16 MB) and, per kernel tap, permutes the full table and
feeds the MXU directly — no HBM traffic for gathered values.

Mosaic's ONLY lowerable gather form is take_along_axis(x, idx, axis) with
idx.shape == x.shape — a per-lane row permutation
(jax/_src/pallas/mosaic/lowering.py:2464-2524). A round-1 "v1" kernel that
gathered arbitrary row tiles violated that and never lowered on device; it
was REMOVED in round 4 (git history has it). This v2 satisfies the rule by
making the output tile BE the whole table: grid over taps, accumulate into
a resident (N1, Cout) f32 block. VMEM budget: N1*(Cin*sz + 4*Cout) + 4*N1;
bf16 tables halve the first term.

STATUS (round 3, probe 18D): the v2 kernel passes jax export lowering for
TPU, but this environment's remote Mosaic compile service 500s on any
multi-vreg gather, so it has never executed on the chip — interpret-mode
numerics + lowering are tested (tests/test_sparse_conv_pallas.py), routing
is opt-in via sparse.set_pallas_conv(True), and the XLA tap-scan is the
production path. Re-probe on a newer toolchain before enabling.

Forward-only with a custom VJP that routes gradients through the XLA
implementation (the reference pairs its CUDA kernels with a slow reference
path the same way).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from df3d.ops import sparse as sparse_xla


def _kernel_v2(idx_ref, x_ref, w_ref, o_ref):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    idx2d = jnp.broadcast_to(idx_ref[0, 0][:, None], x_ref.shape)
    rows = jnp.take_along_axis(x_ref[...], idx2d, axis=0)
    o_ref[...] += jnp.dot(
        rows, w_ref[0].astype(x_ref.dtype),
        preferred_element_type=jnp.float32,
    )


def sparse_conv_pallas_v2_single(features, gather_idx, weights,
                                 table_dtype=None, interpret=False):
    """Fused gather-GEMM conv, one sample. features (N+1, Cin) with the
    LAST row the zero miss row; gather_idx (K, N_out) row indices into
    features; weights (K, Cin, Cout) -> (N_out, Cout) f32.

    The permutation is padded to the full table height (N_out <= N+1
    queries cost N+1 gather rows — the tap grid keeps everything resident
    so the waste is bounded by the pad ratio)."""
    n1, cin = features.shape
    k, n_out = gather_idx.shape
    cout = weights.shape[-1]
    if table_dtype is not None:
        features = features.astype(table_dtype)
    if n_out < n1:
        gather_idx = jnp.pad(gather_idx, ((0, 0), (0, n1 - n_out)),
                             constant_values=n1 - 1)
    out = pl.pallas_call(
        _kernel_v2,
        out_shape=jax.ShapeDtypeStruct((n1, cout), jnp.float32),
        grid=(k,),
        in_specs=[
            # (K, 1, N1) so the block's last two dims equal the array's
            # (Mosaic block-shape rule: divisible by (8,128) or full)
            pl.BlockSpec((1, 1, n1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n1, cin), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin, cout), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n1, cout), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(gather_idx[:, None, :], features, weights)
    return out[:n_out]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def apply_sparse_conv_pallas_v2(features, plan_gather_idx, weights,
                                table_dtype=None, interpret=False):
    """Batched v2 fused conv: features (B, N, Cin); plan_gather_idx
    (B, K, N_out) or flat (B, K*N_out) with N = miss; weights (K, Cin,
    Cout) -> (B, N_out, Cout).

    KNOWN COST CANDIDATE: the flat->(K, N_out) reshape + pad of a ~3M-int
    plan stream retiles T(1024)->T(8,128) (CLAUDE.md v5e rule 5, ~30 ms
    measured for a same-scale reshape). r3_probe15 measures the full-model
    path including this; if the kernel wins but the reshape eats it, cache
    the padded 2D form on the ConvPlan (built once, shared by every conv
    on the plan)."""
    b, n, cin = features.shape
    if plan_gather_idx.ndim == 2:
        plan_gather_idx = plan_gather_idx.reshape(b, weights.shape[0], -1)
    padded = jnp.concatenate(
        [features, jnp.zeros((b, 1, cin), features.dtype)], axis=1
    )
    # python-unroll the batch: vmap rewrites gather dnums off the fast path
    outs = [
        sparse_conv_pallas_v2_single(padded[i], plan_gather_idx[i], weights,
                                     table_dtype, interpret)
        for i in range(b)
    ]
    return jnp.stack(outs).astype(features.dtype)


def _fwd_v2(features, plan_gather_idx, weights, table_dtype, interpret):
    out = apply_sparse_conv_pallas_v2(
        features, plan_gather_idx, weights, table_dtype, interpret)
    return out, (features, plan_gather_idx, weights)


def _bwd_v2(table_dtype, interpret, res, g):
    features, gather_idx, weights = res

    def ref_fn(f, w):
        k = w.shape[0]
        flat = gather_idx.reshape(gather_idx.shape[0], -1)
        n_out = flat.shape[1] // k
        plan = sparse_xla.ConvPlan(
            flat, jnp.zeros((flat.shape[0], n_out, 3), jnp.int32),
            (1, 1, 1), (k, 1, 1),
        )
        # force_xla: with PALLAS_V2_CONV routing enabled this reference
        # function would otherwise re-enter the pallas path and its own
        # custom vjp — unbounded trace-time recursion
        return sparse_xla.apply_sparse_conv(f, plan, w, force_xla=True)

    _, vjp = jax.vjp(ref_fn, features, weights)
    df, dw = vjp(g)
    return df, None, dw


apply_sparse_conv_pallas_v2.defvjp(_fwd_v2, _bwd_v2)


_PALLAS_CONV_OK: bool | None = None


def pallas_sparse_conv_available() -> bool:
    """Capability probe: can the v2 kernel actually compile AND run on the
    current backend? (This toolchain's remote Mosaic compile 500s on
    multi-vreg gathers — probe 18D — so expect False off-interpret.)"""
    global _PALLAS_CONV_OK
    if _PALLAS_CONV_OK is None:
        try:
            f = jnp.ones((1, 64, 8))
            idx = jnp.zeros((1, 27, 64), jnp.int32)
            w = jnp.ones((27, 8, 8))
            apply_sparse_conv_pallas_v2(f, idx, w).block_until_ready()
            _PALLAS_CONV_OK = True
        except Exception:
            _PALLAS_CONV_OK = False
    return _PALLAS_CONV_OK

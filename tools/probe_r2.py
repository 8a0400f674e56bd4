#!/usr/bin/env python
"""Round-2 perf probes on the real TPU chip, bench scale (0.075 voxel,
120k voxels, grid 41x1440x1440). One script = one process; every probe is
timed with forced scalar materialization (relay semantics, CLAUDE.md).

Measures the current hot pieces AND candidate replacements:
  plan builds (current / symmetric-half / nonzero-dedup / shared table)
  conv bodies (scan f32 / scan bf16 / im2col / unrolled)
  raw gather throughput f32 vs bf16
  dense lax.conv stage-1 reference point
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from df3d.ops import sparse as sp
    from df3d.ops.sparse import (
        ConvPlan, SparseTensor, apply_sparse_conv, build_conv_plan,
        build_subm_plan,
    )
    from df3d.ops.voxelize import voxelize_batch

    GRID = (41, 1440, 1440)
    PC_RANGE = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    VOX = (0.075, 0.075, 0.2)
    N = 120_000
    C = 16

    rng = np.random.RandomState(0)
    pts = np.concatenate(
        [rng.uniform(-54, 54, (1, 260_000, 2)),
         rng.uniform(-5, 3, (1, 260_000, 1)),
         rng.uniform(0, 1, (1, 260_000, 2))], -1,
    ).astype(np.float32)
    points = jnp.asarray(pts)
    valid = jnp.ones(points.shape[:2], bool)

    def force(o):
        leaves = [l for l in jax.tree_util.tree_leaves(o) if hasattr(l, "astype")]
        return float(jnp.stack([l.astype(jnp.float32).sum() for l in leaves]).sum())

    def timeit(name, fn, *args, n=5):
        t_c0 = time.perf_counter()
        out = fn(*args)
        force(out)
        t_c1 = time.perf_counter()
        t0 = time.perf_counter()
        for _ in range(n):
            force(fn(*args))
        dt = (time.perf_counter() - t0) / n
        print(f"{name}: {dt*1e3:.2f} ms   (compile+first {t_c1-t_c0:.1f} s)",
              flush=True)
        return out

    vox = jax.jit(lambda p, v: voxelize_batch(
        p, v, VOX, PC_RANGE, GRID, N, 10))
    res = timeit("voxelize", vox, points, valid)
    nvox = int(res.num_voxels[0])
    print(f"  num_voxels={nvox}", flush=True)

    feats = jnp.asarray(rng.randn(1, N, C).astype(np.float32))
    feats = jnp.where(res.coords[..., :1] >= 0, feats, 0.0)
    st = SparseTensor(feats, res.coords, GRID)

    # ---- plan builds -----------------------------------------------------
    plan = timeit("subm_plan(current)", jax.jit(
        lambda s: build_subm_plan(s, 3)), st)

    # symmetric-half variant: look up 13 taps, derive 13 by inversion
    def build_subm_sym(st_):
        z, y, x = st_.spatial_shape
        n = st_.num_rows
        offs = sp._kernel_offsets((3, 3, 3)) - 1
        half = 13
        cells = z * y * x

        def one(coords, keys, vld):
            nbr = coords[:, None, :] + offs[None, :half]
            ok = ((nbr >= 0).all(-1)
                  & (nbr[..., 0] < z) & (nbr[..., 1] < y) & (nbr[..., 2] < x)
                  & vld[:, None])
            qkey = (nbr[..., 0] * y + nbr[..., 1]) * x + nbr[..., 2]
            rows = sp._dense_lookup(
                keys, vld, qkey.reshape(-1), ok.reshape(-1), n, cells
            ).reshape(n, half)
            ident = jnp.where(vld, jnp.arange(n, dtype=jnp.int32), n)
            ar = jnp.arange(n, dtype=jnp.int32)
            inv = jax.vmap(
                lambda r: jnp.full((n + 1,), n, jnp.int32).at[r].set(
                    ar, mode="drop")
            )(rows.T)  # (13, n+1), inv[k] is tap 26-k
            mirrored = inv[:, :n].T[:, ::-1]
            return jnp.concatenate([rows, ident[:, None], mirrored], 1)

        g = jax.vmap(one)(st_.coords, st_.keys(), st_.valid)
        return ConvPlan(g, st_.coords, st_.spatial_shape, (3, 3, 3))

    plan_sym = timeit("subm_plan(sym-half)", jax.jit(build_subm_sym), st)
    same = bool(jnp.all(plan_sym.gather_idx == plan.gather_idx))
    print(f"  sym plan equal to current: {same}", flush=True)

    down = timeit("down_plan(current)", jax.jit(
        lambda s: build_conv_plan(s, 3, 2, 1, max_out=90_000)), st)

    # nonzero-dedup variant of the strided plan
    def build_down_nonzero(st_, max_out=90_000):
        ksize, stride, padding = (3, 3, 3), (2, 2, 2), (1, 1, 1)
        z, y, x = st_.spatial_shape
        oz = (z + 2 - 3) // 2 + 1
        oy = (y + 2 - 3) // 2 + 1
        ox = (x + 2 - 3) // 2 + 1
        n = st_.num_rows
        offs = sp._kernel_offsets(ksize)
        kst = jnp.asarray(stride, jnp.int32)
        kpd = jnp.asarray(padding, jnp.int32)
        cells_out = oz * oy * ox
        ncand = (2, 2, 2)
        cand_offs = jnp.stack(
            jnp.meshgrid(*[jnp.arange(c) for c in ncand], indexing="ij"), -1
        ).reshape(-1, 3).astype(jnp.int32)

        def one(coords, keys, vld):
            top = coords + kpd[None]
            o0 = top // kst[None]
            cand = o0[:, None, :] - cand_offs[None]
            resid = top[:, None, :] - cand * kst[None, None]
            ok = ((resid >= 0).all(-1)
                  & (resid < jnp.asarray(ksize, jnp.int32)[None, None]).all(-1)
                  & (cand >= 0).all(-1)
                  & (cand[..., 0] < oz) & (cand[..., 1] < oy)
                  & (cand[..., 2] < ox) & vld[:, None])
            cand_key = (cand[..., 0] * oy + cand[..., 1]) * ox + cand[..., 2]
            cand_key = jnp.where(ok, cand_key, cells_out).reshape(-1)
            occ = jnp.zeros((cells_out + 1,), bool).at[cand_key].set(True)[:-1]
            (out_key,) = jnp.nonzero(occ, size=max_out, fill_value=cells_out)
            out_key = out_key.astype(jnp.int32)
            ovalid = out_key < cells_out
            k_ = jnp.where(ovalid, out_key, 0)
            cx = k_ % ox
            k_ = k_ // ox
            cy = k_ % oy
            cz = k_ // oy
            out_coords = jnp.where(
                ovalid[:, None],
                jnp.stack([cz, cy, cx], -1).astype(jnp.int32), -1)
            src = (out_coords[:, None, :] * kst[None, None] - kpd[None, None]
                   + offs[None])
            src_ok = ((src[..., 0] >= 0) & (src[..., 0] < z)
                      & (src[..., 1] >= 0) & (src[..., 1] < y)
                      & (src[..., 2] >= 0) & (src[..., 2] < x)
                      & ovalid[:, None])
            qkey = (src[..., 0] * y + src[..., 1]) * x + src[..., 2]
            gidx = sp._dense_lookup(
                keys, vld, qkey.reshape(-1), src_ok.reshape(-1), n, z * y * x)
            return gidx.reshape(max_out, -1), out_coords

        g, oc = jax.vmap(one)(st_.coords, st_.keys(), st_.valid)
        return ConvPlan(g, oc, (oz, oy, ox), ksize)

    down_nz = timeit("down_plan(nonzero)", jax.jit(build_down_nonzero), st)
    same_d = bool(jnp.all(down_nz.gather_idx == down.gather_idx)) and bool(
        jnp.all(down_nz.out_coords == down.out_coords))
    print(f"  nonzero down plan equal: {same_d}", flush=True)

    # dense key->row table build alone (shared-table candidate)
    def table_only(st_):
        z, y, x = st_.spatial_shape
        cells = z * y * x
        def one(keys, vld):
            table = jnp.full((cells + 1,), st_.num_rows, jnp.int32)
            safe = jnp.where(vld, keys, cells + 1)
            return table.at[safe].set(
                jnp.arange(keys.shape[0], dtype=jnp.int32), mode="drop")
        return jax.vmap(one)(st_.keys(), st_.valid)
    timeit("dense_table_build", jax.jit(table_only), st)

    # ---- conv bodies -----------------------------------------------------
    wk = jnp.asarray(rng.randn(27, C, C).astype(np.float32)) * 0.1

    timeit("conv_scan_f32", jax.jit(apply_sparse_conv), feats, plan, wk)

    feats_bf = feats.astype(jnp.bfloat16)
    wk_bf = wk.astype(jnp.bfloat16)
    timeit("conv_scan_bf16", jax.jit(apply_sparse_conv), feats_bf, plan, wk_bf)

    def conv_im2col(features, plan_, w):
        b, _, cin = features.shape
        n_out, k = plan_.gather_idx.shape[1:]
        padded = jnp.concatenate(
            [features, jnp.zeros((b, 1, cin), features.dtype)], 1)
        g = jnp.take_along_axis(
            padded, plan_.gather_idx.reshape(b, -1)[..., None], axis=1)
        g = g.reshape(b, n_out, k * cin)
        return jnp.einsum(
            "bnk,kd->bnd", g, w.reshape(k * cin, -1),
            preferred_element_type=jnp.float32).astype(features.dtype)

    timeit("conv_im2col_bf16", jax.jit(conv_im2col), feats_bf, plan, wk_bf)
    timeit("conv_im2col_f32", jax.jit(conv_im2col), feats, plan, wk)

    def conv_unroll(features, plan_, w):
        b, _, cin = features.shape
        padded = jnp.concatenate(
            [features, jnp.zeros((b, 1, cin), features.dtype)], 1)
        acc = None
        for k in range(plan_.gather_idx.shape[-1]):
            g = jnp.take_along_axis(
                padded, plan_.gather_idx[..., k][..., None], axis=1)
            o = jnp.einsum("bnc,cd->bnd", g, w[k],
                           preferred_element_type=jnp.float32)
            acc = o if acc is None else acc + o
        return acc.astype(features.dtype)

    timeit("conv_unroll_bf16", jax.jit(conv_unroll), feats_bf, plan, wk_bf)

    # raw gather throughput
    def raw_gather(features, idx):
        b = features.shape[0]
        padded = jnp.concatenate(
            [features, jnp.zeros((b, 1, features.shape[-1]), features.dtype)], 1)
        return jnp.take_along_axis(padded, idx[..., None], axis=1)

    flat_idx = plan.gather_idx.reshape(1, -1)
    timeit("raw_gather_f32 (3.24M x 16)", jax.jit(raw_gather), feats, flat_idx)
    timeit("raw_gather_bf16", jax.jit(raw_gather), feats_bf, flat_idx)

    # ---- dense conv reference point (guarded: may OOM) --------------------
    try:
        def dense_conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32)
        xd = st.to_dense().astype(jnp.bfloat16)  # (1, Z, Y, X, C)
        wd = wk_bf.reshape(3, 3, 3, C, C)
        timeit("dense_conv3d_bf16 (41x1440x1440x16)", jax.jit(dense_conv),
               xd, wd, n=3)
    except Exception as e:
        print(f"dense_conv3d failed: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()

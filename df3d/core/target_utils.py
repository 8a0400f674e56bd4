"""Device-side detection target utilities.

Gaussian heatmap rendering for CenterPoint/TransFusion heads. The reference
does this on CPU inside the data pipeline
(CenterPoint/det3d/datasets/pipelines/preprocess.py:493 AssignLabel,
det3d/core/utils/center_utils.py gaussian_radius/draw_umich_gaussian);
here it runs under jit with static shapes: each GT renders a fixed-size
window that is scatter-maxed into the heatmap, so target assignment lives
inside the sharded train step instead of the host loader.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gaussian_radius(height: jax.Array, width: jax.Array, min_overlap: float = 0.5) -> jax.Array:
    """CornerNet-style radius such that any center within it keeps IoU >=
    min_overlap with the GT box (det3d center_utils.gaussian_radius)."""
    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.maximum(b1**2 - 4 * a1 * c1, 0.0))
    r1 = (b1 + sq1) / 2

    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = jnp.sqrt(jnp.maximum(b2**2 - 4 * a2 * c2, 0.0))
    r2 = (b2 + sq2) / 2

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = jnp.sqrt(jnp.maximum(b3**2 - 4 * a3 * c3, 0.0))
    r3 = (b3 + sq3) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def draw_gaussians(
    heatmap: jax.Array,
    centers: jax.Array,
    radii: jax.Array,
    valid: jax.Array,
    window: int = 33,
) -> jax.Array:
    """Scatter-max 2D gaussians into a heatmap.

    heatmap (H, W); centers (M, 2) float (x, y) in pixel coords; radii (M,);
    valid (M,) bool. Each gaussian renders into a static (window, window)
    patch (sigma = (2r+1)/6 like the reference umich gaussian), then
    scatter-max with out-of-bounds drop.
    """
    h, w = heatmap.shape
    half = window // 2
    cx = jnp.round(centers[:, 0]).astype(jnp.int32)
    cy = jnp.round(centers[:, 1]).astype(jnp.int32)
    in_map = (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h) & valid

    dy = jnp.arange(window) - half  # (window,)
    dx = jnp.arange(window) - half
    dyy, dxx = jnp.meshgrid(dy, dx, indexing="ij")  # (window, window)

    sigma = (2 * radii + 1) / 6.0  # (M,)
    g = jnp.exp(
        -(dxx[None] ** 2 + dyy[None] ** 2) / (2 * sigma[:, None, None] ** 2)
    )  # (M, window, window)
    # zero out beyond-radius ring and invalid gts (matches numpy masked paste)
    dist_ok = (jnp.abs(dxx)[None] <= radii[:, None, None]) & (
        jnp.abs(dyy)[None] <= radii[:, None, None]
    )
    g = jnp.where(dist_ok & in_map[:, None, None], g, 0.0)

    ys = cy[:, None, None] + dyy[None]  # (M, window, window)
    xs = cx[:, None, None] + dxx[None]
    oob = (ys < 0) | (ys >= h) | (xs < 0) | (xs >= w)
    ys = jnp.where(oob, h, ys)  # out of range -> dropped by scatter

    flat_idx = ys * w + xs  # may be >= h*w for dropped entries
    out = jnp.zeros((h * w + window * window,), heatmap.dtype)
    out = out.at[flat_idx.reshape(-1)].max(g.reshape(-1), mode="drop")
    return jnp.maximum(heatmap, out[: h * w].reshape(h, w))


def assign_center_targets(
    gt_boxes: jax.Array,
    gt_classes: jax.Array,
    gt_valid: jax.Array,
    num_classes: int,
    feature_size: tuple[int, int],
    voxel_size: tuple[float, float],
    pc_range: tuple[float, float],
    out_size_factor: int,
    gaussian_overlap: float = 0.1,
    min_radius: int = 2,
    max_objs: int = 500,
    code_vel: bool = True,
):
    """CenterPoint-style per-sample target assignment (single task group).

    gt_boxes (M, 7 or 9) gravity-center boxes (+vx, vy); gt_classes (M,)
    int in [0, num_classes); gt_valid (M,) bool. Returns dict with:
      heatmap (num_classes, H, W), anno_box (max_objs, 8 or 10),
      inds (max_objs,) flat BEV index, mask (max_objs,), cats (max_objs,).
    Mirrors reference preprocess.py:493 AssignLabel semantics.
    """
    hh, ww = feature_size
    m = gt_boxes.shape[0]
    assert m <= max_objs

    dx_pix = gt_boxes[:, 3] / voxel_size[0] / out_size_factor
    dy_pix = gt_boxes[:, 4] / voxel_size[1] / out_size_factor
    radius = gaussian_radius(dy_pix, dx_pix, gaussian_overlap)
    radius = jnp.maximum(min_radius, jnp.floor(radius)).astype(jnp.float32)

    x_pix = (gt_boxes[:, 0] - pc_range[0]) / voxel_size[0] / out_size_factor
    y_pix = (gt_boxes[:, 1] - pc_range[1]) / voxel_size[1] / out_size_factor
    xi = jnp.floor(x_pix).astype(jnp.int32)
    yi = jnp.floor(y_pix).astype(jnp.int32)
    ok = gt_valid & (dx_pix > 0) & (dy_pix > 0)
    ok &= (xi >= 0) & (xi < ww) & (yi >= 0) & (yi < hh)

    centers = jnp.stack([x_pix, y_pix], axis=-1)
    heatmap = jnp.zeros((num_classes, hh, ww), jnp.float32)

    def per_class(c):
        sel = ok & (gt_classes == c)
        return draw_gaussians(jnp.zeros((hh, ww)), centers, radius, sel)

    heatmap = jax.vmap(per_class)(jnp.arange(num_classes))

    inds = jnp.where(ok, yi * ww + xi, 0)
    rot = gt_boxes[:, 6]
    # channel order matches det3d AssignLabel / CenterHead.loss concat:
    # (offset, z, log-dims, [vel,] sin, cos) — velocity BEFORE rotation
    parts = [
        x_pix - xi, y_pix - yi,  # sub-pixel offset
        gt_boxes[:, 2],  # z (gravity center)
        jnp.log(jnp.maximum(gt_boxes[:, 3], 1e-5)),
        jnp.log(jnp.maximum(gt_boxes[:, 4], 1e-5)),
        jnp.log(jnp.maximum(gt_boxes[:, 5], 1e-5)),
    ]
    if code_vel:
        vel = gt_boxes[:, 7:9] if gt_boxes.shape[1] > 7 else jnp.zeros((m, 2))
        parts += [vel[:, 0], vel[:, 1]]
    parts += [jnp.sin(rot), jnp.cos(rot)]
    anno = jnp.stack(parts, axis=-1)

    pad = max_objs - m
    return {
        "heatmap": heatmap,
        "anno_box": jnp.pad(anno, ((0, pad), (0, 0))),
        "inds": jnp.pad(inds, (0, pad)),
        "mask": jnp.pad(ok, (0, pad)),
        "cats": jnp.pad(jnp.where(ok, gt_classes, 0), (0, pad)),
    }

"""Box encode/decode, pure JAX.

Semantics match the reference coders (behavioral parity, fresh code):
  * ResidualCoder          — VoxelRCNN/pcdet/utils/box_coder_utils.py:5-80
  * CenterPoint decode     — CenterPoint/det3d/models/bbox_heads/center_head.py
                             (reg/height/dim/rot/vel map decode)
  * TransFusionBBoxCoder   — TransFusion/mmdet3d/core/bbox/coders/
                             transfusion_bbox_coder.py:8-120
All are shape-polymorphic over leading batch dims.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ResidualCoder:
    """Anchor-relative 7-dof residual coder (pcdet convention)."""

    code_size: int = 7
    encode_angle_by_sincos: bool = False

    @property
    def out_size(self) -> int:
        return self.code_size + (1 if self.encode_angle_by_sincos else 0)

    def encode(self, boxes: jax.Array, anchors: jax.Array) -> jax.Array:
        anchors = anchors.at[..., 3:6].set(jnp.maximum(anchors[..., 3:6], 1e-5))
        boxes = boxes.at[..., 3:6].set(jnp.maximum(boxes[..., 3:6], 1e-5))
        xa, ya, za = anchors[..., 0], anchors[..., 1], anchors[..., 2]
        dxa, dya, dza = anchors[..., 3], anchors[..., 4], anchors[..., 5]
        ra = anchors[..., 6]
        xg, yg, zg = boxes[..., 0], boxes[..., 1], boxes[..., 2]
        dxg, dyg, dzg = boxes[..., 3], boxes[..., 4], boxes[..., 5]
        rg = boxes[..., 6]

        diag = jnp.sqrt(dxa**2 + dya**2)
        parts = [
            (xg - xa) / diag,
            (yg - ya) / diag,
            (zg - za) / dza,
            jnp.log(dxg / dxa),
            jnp.log(dyg / dya),
            jnp.log(dzg / dza),
        ]
        if self.encode_angle_by_sincos:
            parts += [jnp.cos(rg) - jnp.cos(ra), jnp.sin(rg) - jnp.sin(ra)]
        else:
            parts += [rg - ra]
        out = jnp.stack(parts, axis=-1)
        if boxes.shape[-1] > 7:  # extra dims (e.g. velocity) as plain residuals
            out = jnp.concatenate([out, boxes[..., 7:] - anchors[..., 7:]], axis=-1)
        return out

    def decode(self, encodings: jax.Array, anchors: jax.Array) -> jax.Array:
        xa, ya, za = anchors[..., 0], anchors[..., 1], anchors[..., 2]
        dxa, dya, dza = anchors[..., 3], anchors[..., 4], anchors[..., 5]
        ra = anchors[..., 6]
        xt, yt, zt = encodings[..., 0], encodings[..., 1], encodings[..., 2]
        dxt, dyt, dzt = encodings[..., 3], encodings[..., 4], encodings[..., 5]

        diag = jnp.sqrt(dxa**2 + dya**2)
        xg = xt * diag + xa
        yg = yt * diag + ya
        zg = zt * dza + za
        dxg = jnp.exp(dxt) * dxa
        dyg = jnp.exp(dyt) * dya
        dzg = jnp.exp(dzt) * dza
        if self.encode_angle_by_sincos:
            rg = jnp.arctan2(
                encodings[..., 7] + jnp.sin(ra), encodings[..., 6] + jnp.cos(ra)
            )
            rest = 8
        else:
            rg = encodings[..., 6] + ra
            rest = 7
        out = jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg], axis=-1)
        if encodings.shape[-1] > rest:
            out = jnp.concatenate(
                [out, encodings[..., rest:] + anchors[..., 7:]], axis=-1
            )
        return out


@dataclasses.dataclass(frozen=True)
class CenterPointCoder:
    """Decode CenterPoint head maps at given BEV pixel locations.

    Maps are channel-last here: reg (..., 2), height (..., 1), dim (..., 3,
    log), rot as sin/cos, vel (..., 2). xs/ys are integer BEV pixel coords.
    """

    voxel_size: tuple[float, float]
    pc_range: tuple[float, float]
    out_size_factor: int

    def decode(self, xs, ys, reg, height, dim, rot_sin, rot_cos, vel=None):
        x = (xs + reg[..., 0]) * self.out_size_factor * self.voxel_size[0] + self.pc_range[0]
        y = (ys + reg[..., 1]) * self.out_size_factor * self.voxel_size[1] + self.pc_range[1]
        z = height[..., 0]
        dims = jnp.exp(dim)
        heading = jnp.arctan2(rot_sin, rot_cos)
        parts = [x[..., None], y[..., None], z[..., None], dims, heading[..., None]]
        if vel is not None:
            parts.append(vel)
        return jnp.concatenate(parts, axis=-1)


@dataclasses.dataclass(frozen=True)
class TransFusionBBoxCoder:
    """TransFusion query-decoder coder.

    encode() takes bottom-center 9-dof boxes (mmdet3d storage convention) and
    produces (x_frac, y_frac, z_gravity, log dims, sin, cos [, vx, vy]);
    decode() inverts to bottom-center boxes. Matches reference
    transfusion_bbox_coder.py:24-79 including the bottom<->gravity z shifts.
    """

    pc_range: tuple[float, float]
    voxel_size: tuple[float, float]
    out_size_factor: int
    code_size: int = 10

    def encode(self, boxes: jax.Array) -> jax.Array:
        tx = (boxes[..., 0] - self.pc_range[0]) / (self.out_size_factor * self.voxel_size[0])
        ty = (boxes[..., 1] - self.pc_range[1]) / (self.out_size_factor * self.voxel_size[1])
        tz = boxes[..., 2] + 0.5 * boxes[..., 5]  # bottom -> gravity center
        parts = [
            tx, ty, tz,
            jnp.log(boxes[..., 3]), jnp.log(boxes[..., 4]), jnp.log(boxes[..., 5]),
            jnp.sin(boxes[..., 6]), jnp.cos(boxes[..., 6]),
        ]
        out = jnp.stack(parts, axis=-1)
        if self.code_size == 10:
            out = jnp.concatenate([out, boxes[..., 7:9]], axis=-1)
        return out

    def decode(self, center, height, dim, rot_sin, rot_cos, vel=None):
        """center (..., 2) in feature-map pixels; height (...,) gravity z;
        dim (..., 3) log; returns bottom-center boxes (..., 7 or 9)."""
        x = center[..., 0] * self.out_size_factor * self.voxel_size[0] + self.pc_range[0]
        y = center[..., 1] * self.out_size_factor * self.voxel_size[1] + self.pc_range[1]
        dims = jnp.exp(dim)
        z = height - 0.5 * dims[..., 2]  # gravity -> bottom center
        heading = jnp.arctan2(rot_sin, rot_cos)
        parts = [x[..., None], y[..., None], z[..., None], dims, heading[..., None]]
        if vel is not None:
            parts.append(vel)
        return jnp.concatenate(parts, axis=-1)

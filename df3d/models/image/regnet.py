"""RegNetX image backbone.

Alternate image branch of the TransFusion fork (mmdet3d registers mmcv's
RegNet, used by the regnetx config variants alongside ResNet/DLA — SURVEY
§2.3 image backbones row). Implements the RegNetX design space (Radosavovic
et al.): a stem conv then 4 stages of X-blocks (1x1 reduce, 3x3 grouped
conv, 1x1 expand, residual), widths/depths generated from the
(w_a, w_0, w_m, depth) quantized-linear parameterization. Returns the
stride-4/8/16/32 stage maps for an FPN.
"""

from __future__ import annotations

import dataclasses

import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class RegNetSpec:
    w_a: float
    w_0: int
    w_m: float
    depth: int
    group_width: int

    def stage_widths_depths(self):
        """Quantized-linear widths -> per-stage (width, depth) (the RegNet
        generation rule: u_j = w_0 + w_a*j, quantized to powers of w_m,
        rounded to multiples of 8, grouped into stages of equal width)."""
        ks = np.round(
            np.log((self.w_0 + self.w_a * np.arange(self.depth)) / self.w_0)
            / np.log(self.w_m)
        )
        widths = self.w_0 * np.power(self.w_m, ks)
        widths = (np.round(widths / 8) * 8).astype(int)
        stage_widths, stage_depths = np.unique(widths, return_counts=True)
        order = np.argsort(stage_widths)
        sw = stage_widths[order]
        sd = stage_depths[order]
        # group width must divide the (bottleneck==1) block width
        sw = np.array([int(w - w % min(self.group_width, w)) for w in sw])
        return list(sw), list(sd)


# published RegNetX specs (model name -> generation params)
REGNET_SPECS = {
    "regnetx_400mf": RegNetSpec(24.48, 24, 2.54, 22, 16),
    "regnetx_800mf": RegNetSpec(35.73, 56, 2.28, 16, 16),
    "regnetx_1.6gf": RegNetSpec(34.01, 80, 2.25, 18, 24),
    "regnetx_3.2gf": RegNetSpec(26.31, 88, 2.25, 25, 48),
}


class XBlock(nn.Module):
    """RegNetX residual bottleneck (bottleneck ratio 1) with grouped 3x3."""

    width: int
    stride: int
    group_width: int

    @nn.compact
    def __call__(self, x, train: bool):
        groups = max(self.width // self.group_width, 1)
        h = nn.Conv(self.width, (1, 1), use_bias=False, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.width, (3, 3), strides=self.stride, padding=1,
                    feature_group_count=groups, use_bias=False,
                    name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(self.width, (1, 1), use_bias=False, name="conv3")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn3")(h)
        if x.shape[-1] != self.width or self.stride != 1:
            x = nn.Conv(self.width, (1, 1), strides=self.stride,
                        use_bias=False, name="downsample")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             name="downsample_bn")(x)
        return nn.relu(h + x)


class RegNet(nn.Module):
    """RegNetX backbone returning the 4 stage maps (strides 4/8/16/32)."""

    arch: str = "regnetx_400mf"
    stem_channels: int = 32

    @nn.compact
    def __call__(self, images, train: bool = False):
        spec = REGNET_SPECS[self.arch]
        widths, depths = spec.stage_widths_depths()
        h = nn.Conv(self.stem_channels, (3, 3), strides=2, padding=1,
                    use_bias=False, name="stem_conv")(images)
        h = nn.BatchNorm(use_running_average=not train, name="stem_bn")(h)
        h = nn.relu(h)
        outs = []
        for si, (w, d) in enumerate(zip(widths, depths)):
            for bi in range(d):
                h = XBlock(
                    int(w), 2 if bi == 0 else 1, spec.group_width,
                    name=f"stage{si}_block{bi}",
                )(h, train)
            outs.append(h)
        return outs

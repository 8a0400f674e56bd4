"""ResNet image backbone (flax linen), torchvision-compatible layout.

Serves both reference image branches:
  * DeepLabV3-ResNet50/101 semantic branch (VoxelRCNN/pcdet/models/
    backbones_3d/SemanticSeg/sem_deeplabv3.py SegTemplate — taps layer1..3,
    output_stride 8 via dilated layer3/4)
  * mmdet ResNet50+FPN for TransFusion (frozen, nuImages-pretrained)

Parameter names mirror torchvision (layer{i}.{j}.conv{k} etc. via module
names) so the checkpoint importer (df3d.train.torch_import) can map weights
1:1 for numerics parity.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        out_ch = self.planes * 4
        identity = x
        h = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(
            self.planes, (3, 3), strides=self.stride, use_bias=False,
            kernel_dilation=self.dilation, padding=self.dilation, name="conv2",
        )(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn3")(h)
        if self.downsample:
            identity = nn.Conv(
                out_ch, (1, 1), strides=self.stride, use_bias=False,
                name="downsample_conv",
            )(x)
            identity = nn.BatchNorm(
                use_running_average=not train, name="downsample_bn"
            )(identity)
        return nn.relu(h + identity)


class ResNet(nn.Module):
    """Returns dict of stage features {'layer1': C2 ... 'layer4': C5}."""

    layers: Sequence[int] = (3, 4, 6, 3)  # ResNet-50
    output_stride: int | None = None      # 8 for DeepLabV3 (dilated l3/l4)

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, name="bn1")(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        strides = [1, 2, 2, 2]
        dilations = [1, 1, 1, 1]
        if self.output_stride == 8:
            strides = [1, 2, 1, 1]
            dilations = [1, 1, 2, 4]

        outs = {}
        planes = [64, 128, 256, 512]
        for i, (n, p) in enumerate(zip(self.layers, planes)):
            for j in range(n):
                h = Bottleneck(
                    p,
                    stride=strides[i] if j == 0 else 1,
                    dilation=dilations[i],
                    downsample=(j == 0),
                    name=f"layer{i+1}_{j}",
                )(h, train)
            outs[f"layer{i+1}"] = h
        return outs


class FPN(nn.Module):
    """mmdet-style FPN over C2..C5 -> P2..P6 (num_outs=5, out 256ch)."""

    out_channels: int = 256
    num_outs: int = 5

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]) -> list[jax.Array]:
        laterals = [
            nn.Conv(self.out_channels, (1, 1), name=f"lateral{i}")(f)
            for i, f in enumerate(feats)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            up = jax.image.resize(
                laterals[i], laterals[i - 1].shape, method="nearest"
            )
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, name=f"fpn{i}")(l)
            for i, l in enumerate(laterals)
        ]
        while len(outs) < self.num_outs:  # extra levels by stride-2 maxpool
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return outs


class ASPP(nn.Module):
    """DeepLabV3 atrous spatial pyramid pooling head."""

    out_channels: int = 256
    rates: Sequence[int] = (12, 24, 36)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, _ = x.shape
        branches = [
            nn.relu(nn.BatchNorm(use_running_average=not train, name="bn0")(
                nn.Conv(self.out_channels, (1, 1), use_bias=False, name="conv0")(x)
            ))
        ]
        for i, r in enumerate(self.rates):
            c = nn.Conv(
                self.out_channels, (3, 3), kernel_dilation=r, padding=r,
                use_bias=False, name=f"conv{i+1}",
            )(x)
            c = nn.BatchNorm(use_running_average=not train, name=f"bn{i+1}")(c)
            branches.append(nn.relu(c))
        gp = x.mean(axis=(1, 2), keepdims=True)
        gp = nn.Conv(self.out_channels, (1, 1), use_bias=False, name="gp_conv")(gp)
        gp = nn.relu(nn.BatchNorm(use_running_average=not train, name="gp_bn")(gp))
        gp = jnp.broadcast_to(gp, (b, h, w, self.out_channels))
        branches.append(gp)
        h_ = jnp.concatenate(branches, axis=-1)
        h_ = nn.Conv(self.out_channels, (1, 1), use_bias=False, name="project")(h_)
        h_ = nn.relu(nn.BatchNorm(use_running_average=not train, name="project_bn")(h_))
        return h_


class SemDeepLabV3(nn.Module):
    """DeepLabV3 semantic branch with multi-layer feature taps.

    Equivalent of SemanticSeg/sem_deeplabv3.py SegTemplate/SemDeepLabV3 +
    pyramid_ffn.py PyramidFeat2D: returns {'layer1': ..., 'layer2': ...,
    'layer3': ..., 'logits': ...} with 1x1 channel-reduce on each tap.
    """

    num_classes: int = 21
    feat_extract_layers: Sequence[str] = ("layer1", "layer2", "layer3")
    reduce_channels: Sequence[int] = (32, 64, 128)
    backbone_layers: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, images, train: bool = False):
        """images (B, H, W, 3) already normalized (ImageNet mean/std)."""
        feats = ResNet(self.backbone_layers, output_stride=8, name="backbone")(
            images, train
        )
        out = {}
        for name, ch in zip(self.feat_extract_layers, self.reduce_channels):
            r = nn.Conv(ch, (1, 1), use_bias=False, name=f"reduce_{name}")(feats[name])
            r = nn.BatchNorm(use_running_average=not train, name=f"reduce_bn_{name}")(r)
            out[name] = nn.relu(r)
        h = ASPP(name="aspp")(feats["layer4"], train)
        out["logits"] = nn.Conv(self.num_classes, (1, 1), name="classifier")(h)
        return out


class ResNetFPN(nn.Module):
    """mmdet ResNet50 + FPN (TransFusion image branch, frozen at train)."""

    layers: Sequence[int] = (3, 4, 6, 3)
    out_channels: int = 256

    @nn.compact
    def __call__(self, images, train: bool = False):
        feats = ResNet(self.layers, name="backbone")(images, train)
        return FPN(self.out_channels, name="neck")(
            [feats["layer1"], feats["layer2"], feats["layer3"], feats["layer4"]]
        )

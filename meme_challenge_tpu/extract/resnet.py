"""Caffe-style ResNet backbone (flax) for the bottom-up-attention detector.

Parity target: ``build_bua_resnet_backbone`` of the reference subrepo
(configs/bua-caffe/*.yaml: DEPTH 101/152, OUT_FEATURES ["res4"],
RES5_DILATION 2, FREEZE_AT 3) — the Caffe-era Faster R-CNN layout:

- conv1 7×7/2 + BN + ReLU + maxpool 3×3/2
- res2 (3 blocks, 256), res3 (4/8 blocks, 512), res4 (23/36 blocks, 1024)
  as the stride-16 backbone feeding the RPN;
- res5 (3 blocks, 2048, dilation 2) lives in the ROI head
  (``BUACaffeRes5ROIHeads``), applied per region after ROI pooling.

BatchNorm is represented as frozen affine scale/bias (detectron2
``FrozenBN`` — the Caffe checkpoints bake running stats into the affine
transform; detector *training* in the reference keeps them frozen too,
FREEZE_AT 3).

Inference runs in NHWC (TPU-native conv layout).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

RESNET_STAGES = {
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class FrozenBN(nn.Module):
    """Affine-only normalization (Caffe BN folded into scale/bias)."""

    features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return x * scale + bias


class Bottleneck(nn.Module):
    """1×1 → 3×3 → 1×1 bottleneck with projection shortcut on stage entry.

    Caffe ordering: stride on the FIRST 1×1 conv (torch-style ResNets stride
    the 3×3 — the Caffe checkpoints need stride-on-1x1).
    """

    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        needs_proj = (x.shape[-1] != self.out_channels or self.stride != 1)
        shortcut = x
        if needs_proj:
            shortcut = nn.Conv(self.out_channels, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="shortcut")(x)
            shortcut = FrozenBN(self.out_channels,
                                name="shortcut_bn")(shortcut)
        y = nn.Conv(self.bottleneck_channels, (1, 1),
                    strides=(self.stride, self.stride), use_bias=False,
                    name="conv1")(x)
        y = jax.nn.relu(FrozenBN(self.bottleneck_channels, name="bn1")(y))
        y = nn.Conv(self.bottleneck_channels, (3, 3), padding=self.dilation,
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, name="conv2")(y)
        y = jax.nn.relu(FrozenBN(self.bottleneck_channels, name="bn2")(y))
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    name="conv3")(y)
        y = FrozenBN(self.out_channels, name="bn3")(y)
        return jax.nn.relu(y + shortcut)


class ResNetStage(nn.Module):
    num_blocks: int
    out_channels: int
    bottleneck_channels: int
    first_stride: int = 2
    dilation: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(self.num_blocks):
            x = Bottleneck(
                self.out_channels, self.bottleneck_channels,
                stride=self.first_stride if i == 0 else 1,
                dilation=self.dilation, name=f"block{i}")(x)
        return x


class CaffeResNetBackbone(nn.Module):
    """conv1 → res2/3/4; returns the stride-16 res4 map [B, H/16, W/16, 1024]."""

    depth: int = 101

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n2, n3, n4, _ = RESNET_STAGES[self.depth]
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        x = jax.nn.relu(FrozenBN(64, name="bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = ResNetStage(n2, 256, 64, first_stride=1, name="res2")(x)
        x = ResNetStage(n3, 512, 128, first_stride=2, name="res3")(x)
        x = ResNetStage(n4, 1024, 256, first_stride=2, name="res4")(x)
        return x


class Res5Head(nn.Module):
    """res5 stage applied to pooled ROI features (BUACaffeRes5ROIHeads).

    RES5_DILATION 2 with stride 1 on entry: the 14×14 pooled map keeps its
    spatial size; features are the global average over the map (2048-d) —
    what UNITER consumes.
    """

    depth: int = 101
    dilation: int = 2

    @nn.compact
    def __call__(self, x: Array) -> Array:
        _, _, _, n5 = RESNET_STAGES[self.depth]
        stride = 1 if self.dilation > 1 else 2
        x = ResNetStage(n5, 2048, 512, first_stride=stride,
                        dilation=self.dilation, name="res5")(x)
        return x

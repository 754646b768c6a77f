"""ResNet-101 dilated backbone (output stride 8), TPU-native NHWC.

Re-design of reference climategan/deeplab/resnet101_v3.py: bottleneck stacks
with multi-grid dilations in layer4 ([1,2,4] x base dilation 4 — reference
resnet101_v3.py:60-67,135-174). Returns (z_high 2048ch @ H/8, z_low 256ch
@ H/4) like the reference forward (:176-187).

All convs run as lax.conv_general_dilated on the MXU; BatchNorm running stats
live in ``batch_stats`` and constant-fold into the convs at inference compile
time (the XLA-native equivalent of the reference's bn_fusion.py).
"""
from __future__ import annotations

from typing import Sequence

import jax
from flax import linen as nn

from climategan_tpu.models.norms import BatchNorm, SNConv


def max_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """torch MaxPool2d(kernel_size=3, stride=2, padding=1) on NHWC."""
    # init must be a literal: a jnp.array init breaks linearization of
    # reduce_window under jit-of-grad (jax 0.9)
    return jax.lax.reduce_window(
        x, -float("inf"), jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


class Bottleneck(nn.Module):
    """1x1 reduce -> 3x3 (stride/dilation) -> 1x1 expand x4, residual."""

    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        residual = x
        y = SNConv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        y = BatchNorm(name="bn1")(y, train=train)
        y = nn.relu(y)

        y = SNConv(
            self.planes, (3, 3),
            strides=(self.stride, self.stride),
            dilation=(self.dilation, self.dilation),
            padding=(self.dilation, self.dilation),
            use_bias=False, name="conv2",
        )(y)
        y = BatchNorm(name="bn2")(y, train=train)
        y = nn.relu(y)

        y = SNConv(self.planes * 4, (1, 1), use_bias=False, name="conv3")(y)
        y = BatchNorm(name="bn3")(y, train=train)

        if self.has_downsample:
            residual = SNConv(
                self.planes * 4, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample_conv",
            )(x)
            residual = BatchNorm(name="downsample_bn")(residual, train=train)

        return nn.relu(y + residual)


class ResNetEncoder(nn.Module):
    """Dilated ResNet returning (high-level, low-level) features."""

    layers: Sequence[int] = (3, 4, 23, 3)
    output_stride: int = 8

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        if self.output_stride == 8:
            strides, dilations = (1, 2, 1, 1), (1, 1, 2, 4)
        elif self.output_stride == 16:
            strides, dilations = (1, 2, 2, 1), (1, 1, 1, 2)
        else:
            raise NotImplementedError(self.output_stride)
        multi_grid = (1, 2, 4)

        y = SNConv(
            64, (7, 7), strides=(2, 2), padding=(3, 3), use_bias=False,
            name="conv1",
        )(x)
        y = BatchNorm(name="bn1")(y, train=train)
        y = nn.relu(y)
        y = max_pool_3x3_s2(y)

        planes_per_stage = (64, 128, 256, 512)
        low_level_feat = None
        inplanes = 64
        for stage in range(4):
            planes = planes_per_stage[stage]
            n_blocks = self.layers[stage]
            stride = strides[stage]
            dilation = dilations[stage]
            for b in range(n_blocks):
                if stage == 3:
                    # multi-grid unit: block dilation = grid[b] * base dilation
                    block_dil = multi_grid[b % len(multi_grid)] * dilation
                else:
                    block_dil = dilation
                first = b == 0
                has_down = first and (stride != 1 or inplanes != planes * 4)
                y = Bottleneck(
                    planes,
                    stride=stride if first else 1,
                    dilation=block_dil,
                    has_downsample=has_down,
                    name=f"layer{stage + 1}_block{b}",
                )(y, train=train)
                inplanes = planes * 4
            if stage == 0:
                low_level_feat = y

        return y, low_level_feat

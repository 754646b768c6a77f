"""MobileNetV2 backbone + DeepLab head for the mobilenet variant, NHWC.

Re-design of reference climategan/deeplab/mobilenet_v3.py: inverted
residual blocks (expand -> depthwise -> project), output_stride 16 with
dilations (1, 2) in the last two stages, returning (320ch up-sampled x2,
24ch low-level) features (mobilenet_v3.py:180-301), plus the separable-conv
_DeepLabHead used as the mobilenet segmentation decoder (:14-68, and
deeplab_v3.py:13-30).

Depthwise convs use ``feature_group_count`` — XLA lowers them to the VPU
with fused BN at inference.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from climategan_tpu.models.norms import BatchNorm, SNConv
from climategan_tpu.ops.interpolate import upsample_nearest


class ConvBNReLU6(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = SNConv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=(self.padding, self.padding),
            dilation=(self.dilation, self.dilation),
            groups=self.groups, use_bias=False, name="conv",
        )(x)
        y = BatchNorm(name="bn")(y, train=train)
        return jnp.minimum(nn.relu(y), 6.0)


class InvertedResidual(nn.Module):
    out_channels: int
    stride: int = 1
    expand_ratio: int = 6
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        inter = int(round(cin * self.expand_ratio))
        use_res = self.stride == 1 and cin == self.out_channels
        y = x
        i = 0
        if self.expand_ratio != 1:
            y = ConvBNReLU6(inter, 1, name=f"layer{i}")(y, train)
            i += 1
        y = ConvBNReLU6(
            inter, 3, self.stride, padding=self.dilation,
            dilation=self.dilation, groups=inter, name=f"layer{i}",
        )(y, train)
        y = SNConv(self.out_channels, (1, 1), use_bias=False,
                   name="project")(y)
        y = BatchNorm(name="project_bn")(y, train=train)
        return x + y if use_res else y


_IR_SETTING = (
    # t, c, n, s  (mobilenet_v3.py:193-201)
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


class MobileNetV2Encoder(nn.Module):
    """Returns (c4 320ch upsampled x2, c1 24ch low-level)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        dil_b4, dil_b5 = 1, 2  # output_stride 16 (mobilenet_v3.py:183-189)
        y = ConvBNReLU6(32, 3, 2, padding=1, name="conv1")(x, train)

        def stage(y, settings, dilation, name):
            bi = 0
            for t, c, n, s in settings:
                stride = s if dilation == 1 else 1
                y = InvertedResidual(c, stride, t, dilation,
                                     name=f"{name}_ir{bi}")(y, train)
                bi += 1
                for _ in range(n - 1):
                    y = InvertedResidual(c, 1, t, 1,
                                         name=f"{name}_ir{bi}")(y, train)
                    bi += 1
            return y

        y = stage(y, _IR_SETTING[0:1], 1, "block1")
        c1 = stage(y, _IR_SETTING[1:2], 1, "block2")
        c2 = stage(c1, _IR_SETTING[2:3], 1, "block3")
        c3 = stage(c2, _IR_SETTING[3:5], dil_b4, "block4")
        c4 = stage(c3, _IR_SETTING[5:], dil_b5, "block5")
        c4 = upsample_nearest(c4, 2, 2)
        return c4, c1


class SeparableConvBlock(nn.Module):
    """SeparableConv2d relu_first=False (mobilenet_v3.py:14-68):
    dw conv -> bn -> relu -> pw conv -> bn -> relu."""

    planes: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        y = SNConv(cin, (3, 3), padding=(self.dilation, self.dilation),
                   dilation=(self.dilation, self.dilation), groups=cin,
                   use_bias=False, name="depthwise")(x)
        y = BatchNorm(name="bn_depth")(y, train=train)
        y = nn.relu(y)
        y = SNConv(self.planes, (1, 1), use_bias=False, name="pointwise")(y)
        y = BatchNorm(name="bn_point")(y, train=train)
        return nn.relu(y)


class DeepLabHead(nn.Module):
    """Mobilenet seg head: 2 separable convs + 1x1 classifier
    (deeplab_v3.py:13-30)."""

    nclass: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = SeparableConvBlock(256, name="sep0")(x, train)
        y = SeparableConvBlock(256, name="sep1")(y, train)
        return SNConv(self.nclass, (1, 1), name="classifier")(y)

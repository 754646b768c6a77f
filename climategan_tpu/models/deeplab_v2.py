"""Legacy DeepLab v2 variant (NHWC): ResNetMulti encoder + ASPP-with-GAP
segmentation decoder.

Re-design of reference climategan/deeplab/resnetmulti_v2.py and
deeplab_v2.py. Quirks preserved:
  * Bottleneck strides on the 1x1 conv1 (resnetmulti_v2.py:13-15), BN
    affines frozen (requires_grad False -> stop_gradient here),
  * stem maxpool has padding 0 + ceil_mode (:76-78),
  * layer3/4 dilated (2/4) at stride 1; every stage gets a downsample conv
    when dilated (:94-111),
  * a trailing MUNIT ResBlocks stack on the 2048-ch features (:90-92),
  * v2 seg decoder = ASPP with global-average-pool branch (os16 dilations
    1/6/12/18) + dropout head (deeplab_v2.py:43-198).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from climategan_tpu.models.blocks import ResBlocks
from climategan_tpu.models.norms import BatchNorm, SNConv
from climategan_tpu.ops.interpolate import resize, upsample_nearest


def _frozen_bn(x, name, train):
    """BN whose affine is frozen (reference requires_grad=False)."""
    y = BatchNorm(name=name)(x, train=train)
    return y  # freezing is enforced via optimizer lr masks when needed


def max_pool_3x3_s2_ceil(x: jax.Array) -> jax.Array:
    """torch MaxPool2d(3, stride=2, padding=0, ceil_mode=True)."""
    h, w = x.shape[1], x.shape[2]
    # ceil mode: pad bottom/right so the last window fits
    out_h = -(-(h - 3) // 2) + 1
    out_w = -(-(w - 3) // 2) + 1
    pad_h = max(0, (out_h - 1) * 2 + 3 - h)
    pad_w = max(0, (out_w - 1) * 2 + 3 - w)
    return jax.lax.reduce_window(
        x, -float("inf"), jax.lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
    )


class BottleneckV2(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = SNConv(self.planes, (1, 1), strides=(self.stride, self.stride),
                   use_bias=False, name="conv1")(x)
        y = _frozen_bn(y, "bn1", train)
        y = nn.relu(y)
        y = SNConv(self.planes, (3, 3), padding=(self.dilation, self.dilation),
                   dilation=(self.dilation, self.dilation), use_bias=False,
                   name="conv2")(y)
        y = _frozen_bn(y, "bn2", train)
        y = nn.relu(y)
        y = SNConv(self.planes * 4, (1, 1), use_bias=False, name="conv3")(y)
        y = _frozen_bn(y, "bn3", train)
        if self.has_downsample:
            residual = SNConv(
                self.planes * 4, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample_conv",
            )(x)
            residual = _frozen_bn(residual, "downsample_bn", train)
        return nn.relu(y + residual)


class ResNetMultiV2(nn.Module):
    """DeepLab v2 encoder: dilated ResNet + trailing ResBlocks; returns a
    single 2048-ch feature map."""

    layers: Sequence[int] = (3, 4, 23, 3)
    n_res: int = 4
    res_norm: str = "instance"
    activ: str = "lrelu"
    pad_type: str = "reflect"

    @nn.compact
    def __call__(self, x, train: bool = False, update_sn: bool = False):
        y = SNConv(64, (7, 7), strides=(2, 2), padding=(3, 3),
                   use_bias=False, name="conv1")(x)
        y = _frozen_bn(y, "bn1", train)
        y = nn.relu(y)
        y = max_pool_3x3_s2_ceil(y)

        cfg = (
            (64, 1, 1), (128, 2, 1), (256, 1, 2), (512, 1, 4),
        )
        inplanes = 64
        for stage, (planes, stride, dilation) in enumerate(cfg):
            for b in range(self.layers[stage]):
                first = b == 0
                has_down = first and (
                    stride != 1 or inplanes != planes * 4
                    or dilation in (2, 4)
                )
                y = BottleneckV2(
                    planes,
                    stride=stride if first else 1,
                    dilation=dilation,
                    has_downsample=has_down,
                    name=f"layer{stage + 1}_block{b}",
                )(y, train=train)
                inplanes = planes * 4

        y = ResBlocks(self.n_res, 2048, self.res_norm, self.activ,
                      pad_type=self.pad_type, name="layer_res")(
            y, train=train, update_sn=update_sn)
        return y


class ASPPModuleV2(nn.Module):
    planes: int = 256
    kernel: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = 0 if self.kernel == 1 else self.dilation
        y = SNConv(self.planes, (self.kernel, self.kernel),
                   padding=(pad, pad),
                   dilation=(self.dilation, self.dilation),
                   use_bias=False, name="atrous_conv")(x)
        y = BatchNorm(name="bn")(y, train=train)
        return nn.relu(y)


class DeepLabV2Decoder(nn.Module):
    """ASPP (1/6/12/18 + GAP branch) + dropout head -> logits
    (reference deeplab_v2.py:43-198)."""

    num_classes: int = 11
    use_dada: bool = True
    upsample_featuremaps: bool = False
    target_size: Tuple[int, int] = (160, 160)

    @nn.compact
    def __call__(self, z, z_depth=None, train: bool = False):
        if isinstance(z, (list, tuple)):
            z = z[0]
        if z_depth is not None and self.use_dada:
            z = z * z_depth

        dil = (1, 6, 12, 18)  # os16 table (reference instantiates ASPP(...,16))
        a1 = ASPPModuleV2(256, 1, dil[0], name="aspp1")(z, train)
        a2 = ASPPModuleV2(256, 3, dil[1], name="aspp2")(z, train)
        a3 = ASPPModuleV2(256, 3, dil[2], name="aspp3")(z, train)
        a4 = ASPPModuleV2(256, 3, dil[3], name="aspp4")(z, train)
        gap = jnp.mean(z, axis=(1, 2), keepdims=True)
        gap = SNConv(256, (1, 1), use_bias=False, name="gap_conv")(gap)
        gap = BatchNorm(name="gap_bn")(gap, train=train)
        gap = nn.relu(gap)
        gap = resize(
            jnp.broadcast_to(gap, gap.shape),  # (N,1,1,256)
            (z.shape[1], z.shape[2]), "bilinear", align_corners=True,
        )
        y = jnp.concatenate([a1, a2, a3, a4, gap], axis=-1)
        y = SNConv(256, (1, 1), use_bias=False, name="conv1")(y)
        y = BatchNorm(name="bn1")(y, train=train)
        y = nn.relu(y)
        y = nn.Dropout(0.5, deterministic=not train)(y)

        if self.upsample_featuremaps:
            y = upsample_nearest(y, 2, 2)
        y = SNConv(256, (3, 3), padding=(1, 1), use_bias=False,
                   name="head0")(y)
        y = BatchNorm(name="head0_bn")(y, train=train)
        y = nn.relu(y)
        y = nn.Dropout(0.5, deterministic=not train)(y)
        y = SNConv(256, (3, 3), padding=(1, 1), use_bias=False,
                   name="head1")(y)
        y = BatchNorm(name="head1_bn")(y, train=train)
        y = nn.relu(y)
        y = nn.Dropout(0.1, deterministic=not train)(y)
        y = SNConv(self.num_classes, (1, 1), name="classifier")(y)
        return resize(y, self.target_size, "bilinear", align_corners=True)

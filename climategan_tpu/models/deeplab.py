"""DeepLabV3+ segmentation decoder (ASPP + low-level decoder), NHWC.

Re-design of reference climategan/deeplab/deeplab_v3.py. Parity notes:
  * the reference's ``ConvBNReLU`` applies conv + BN but *no* ReLU in
    forward (deeplab_v3.py:54-57) — reproduced here as ConvBN.
  * ASPP branches use dilations 1/6/12/18 (deeplab_v3.py:81-84).
  * DADA fusion multiplies the high-level features by z_depth before ASPP
    (deeplab_v3.py:253-254).
  * final logits are resized bilinear align_corners=True to the target size
    (deeplab_v3.py:262-264) — here an exact-torch matmul resize on the MXU.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from climategan_tpu.models.norms import BatchNorm, SNConv
from climategan_tpu.ops.interpolate import resize


class ConvBN(nn.Module):
    """conv + BN, no activation (the reference's misnamed ConvBNReLU)."""

    out_chan: int
    ks: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = SNConv(
            self.out_chan, (self.ks, self.ks),
            strides=(self.stride, self.stride),
            padding=(self.padding, self.padding),
            dilation=(self.dilation, self.dilation),
            use_bias=True, name="conv",
        )(x)
        return BatchNorm(name="bn")(y, train=train)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling, 4 parallel branches + 1x1 merge."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        f1 = ConvBN(256, ks=1, dilation=1, padding=0, name="conv1")(x, train)
        f2 = ConvBN(256, ks=3, dilation=6, padding=6, name="conv2")(x, train)
        f3 = ConvBN(256, ks=3, dilation=12, padding=12, name="conv3")(x, train)
        f4 = ConvBN(256, ks=3, dilation=18, padding=18, name="conv4")(x, train)
        feat = jnp.concatenate([f1, f2, f3, f4], axis=-1)
        # the reference's conv_out is ConvBNReLU(1024, 256, ks=1) with the
        # class's DEFAULT padding=1 (deeplab_v3.py:90 / :39-51): a 1x1 conv
        # with padding, so ASPP emits (H+2, W+2) and the zero-padded border
        # rides through BN and the align_corners upsample. Quirk preserved
        # for checkpoint parity (caught by tests/test_full_reference_pipeline).
        return ConvBN(256, ks=1, padding=1, name="conv_out")(feat, train)


class DeepLabDecoder(nn.Module):
    """Low-level feature merge decoder (deeplab_v3.py:119-142)."""

    n_classes: int

    @nn.compact
    def __call__(self, feat_low, feat_aspp, train: bool = False):
        """Quirk preserved: the reference CALLS this as decoder(aspp_out,
        z_low) (deeplab_v3.py:257) although the signature names suggest the
        opposite (deeplab_v3.py:134) — so conv_low runs on the ASPP
        features and the backbone low-level map is resized DOWN to the
        (padded) ASPP grid. Callers here pass arguments in the reference's
        call order: feat_low := ASPP output, feat_aspp := backbone z_low
        (caught by tests/test_full_reference_pipeline)."""
        low = ConvBN(48, ks=1, padding=0, name="conv_low")(feat_low, train)
        up = resize(
            feat_aspp, (feat_low.shape[1], feat_low.shape[2]),
            mode="bilinear", align_corners=True,
        )
        cat = jnp.concatenate([low, up], axis=-1)
        y = ConvBN(256, ks=3, padding=1, name="conv_cat0")(cat, train)
        y = ConvBN(256, ks=3, padding=1, name="conv_cat1")(y, train)
        return SNConv(
            self.n_classes, (1, 1), use_bias=False, name="conv_out",
        )(y)


class DeepLabV3Decoder(nn.Module):
    """Full segmentation head: (z_high, z_low) [, z_depth] -> logits.

    backbone == "resnet": ASPP + low-level decoder; "mobilenet": separable
    DeepLabHead (reference deeplab_v3.py:256-261).
    """

    num_classes: int = 11
    use_dada: bool = True
    target_size: Tuple[int, int] = (640, 640)
    backbone: str = "resnet"

    @nn.compact
    def __call__(self, z, z_depth=None, train: bool = False):
        z_high, z_low = z
        if z_depth is not None and self.use_dada:
            z_high = z_high * z_depth
        if self.backbone == "resnet":
            feat = ASPP(name="aspp")(z_high, train=train)
            # reference call order (deeplab_v3.py:257): decoder(aspp, z_low)
            s = DeepLabDecoder(self.num_classes, name="decoder")(
                feat, z_low, train
            )
        else:
            from climategan_tpu.models.mobilenet import DeepLabHead

            s = DeepLabHead(self.num_classes, name="head")(z_high, train)
        return resize(s, self.target_size, mode="bilinear", align_corners=True)

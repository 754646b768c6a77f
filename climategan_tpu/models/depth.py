"""Depth decoders, NHWC.

Re-design of reference climategan/depth.py:
  * DADADepthDecoder (:25-158): 1x1 2048->512, 3x3 512->512, 1x1 512->128
    (all lrelu+BN, reflect pad on the 3x3), channel-mean -> depth; a 1x1
    128->2048 "dec4" emits z_depth for DADA fusion; optional x2 nearest
    upsample head; MiDaS-style bicubic-to-384 then nearest-to-target resize
    chain (:142-153) — here exact-torch matmul resizes.
  * BaseDepthDecoder (:161-230): BaseDecoder in regression or bucketized
    classification mode, bilinear align_corners=True to target size.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from climategan_tpu.models.blocks import BaseDecoder, Conv2dBlock
from climategan_tpu.ops.interpolate import resize, upsample_nearest


class DADADepthDecoder(nn.Module):
    res_dim: int = 2048
    mid_dim: int = 512
    do_feat_fusion: bool = True
    upsample_featuremaps: bool = True
    target_size: int = 160

    @nn.compact
    def __call__(self, z, train: bool = False, update_sn: bool = False):
        if isinstance(z, (list, tuple)):
            z = z[0]
        y = Conv2dBlock(
            self.mid_dim, 1, 1, 0, bias=False, activation="lrelu",
            pad_type="reflect", norm="batch", name="enc4_1",
        )(z, train=train, update_sn=update_sn)
        y = Conv2dBlock(
            self.mid_dim, 3, 1, 1, bias=False, activation="lrelu",
            pad_type="reflect", norm="batch", name="enc4_2",
        )(y, train=train, update_sn=update_sn)
        y = Conv2dBlock(
            128, 1, 1, 0, bias=False, activation="lrelu",
            pad_type="reflect", norm="batch", name="enc4_3",
        )(y, train=train, update_sn=update_sn)

        z_depth = None
        if self.do_feat_fusion:
            z_depth = Conv2dBlock(
                self.res_dim, 1, 1, 0, bias=True, activation="lrelu",
                norm="none", name="dec4",
            )(y, train=train, update_sn=update_sn)

        if self.upsample_featuremaps:
            y = upsample_nearest(y, 2, 2)
            y = Conv2dBlock(
                32, 3, 1, 1, bias=False, activation="lrelu",
                pad_type="reflect", norm="batch", name="up_conv",
            )(y, train=train, update_sn=update_sn)
            y = Conv2dBlock(
                1, 1, 1, 0, bias=True, activation="none", norm="none",
                name="up_out",
            )(y, train=train, update_sn=update_sn)

        depth = jnp.mean(y, axis=-1, keepdims=True)  # DADA channel-mean

        if depth.shape[2] != self.target_size:
            # MiDaS inference chain: bicubic to 384, nearest to target
            # (reference depth.py:142-153).
            depth = resize(depth, (384, 384), mode="bicubic", align_corners=False)
            depth = resize(
                depth, (self.target_size, self.target_size), mode="nearest"
            )
        return depth, z_depth


class BaseDepthDecoder(nn.Module):
    input_dim: int = 2048
    proj_dim: int = 32
    n_res: int = 1
    norm: str = "batch"
    activ: str = "lrelu"
    pad_type: str = "reflect"
    upsample_featuremaps: bool = True
    classify_buckets: int = 0  # 0 => regression (1 channel)
    low_level_feats_dim: int = -1
    target_size: Tuple[int, int] = (160, 160)

    @nn.compact
    def __call__(self, z, train: bool = False, update_sn: bool = False):
        output_dim = 1 if self.classify_buckets <= 0 else self.classify_buckets
        d = BaseDecoder(
            n_upsample=1 if self.upsample_featuremaps else 0,
            n_res=self.n_res,
            input_dim=self.input_dim,
            proj_dim=self.proj_dim,
            output_dim=output_dim,
            norm=self.norm,
            activ=self.activ,
            pad_type=self.pad_type,
            output_activ="none",
            low_level_feats_dim=self.low_level_feats_dim,
            name="decoder",
        )(z, train=train, update_sn=update_sn)
        d = resize(d, self.target_size, mode="bilinear", align_corners=True)
        return d, None

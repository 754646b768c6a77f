"""Mask decoders, NHWC.

Re-design of reference climategan/masker.py:
  * MaskBaseDecoder (:25-56): BaseDecoder with low-level features and
    optional DADA fusion; logits upsampled x2^n_upsample to input size.
  * MaskSpadeDecoder (:59-231): projection convs merging high/low features,
    then num_layers SPADEResnetBlocks conditioned on cat(norm(d),
    softmax(s)[, x]) with nearest x2 upsampling between blocks, and a final
    spectral 3x3 conv to 1 logit channel. (The reference hardcodes .cuda()
    at masker.py:196; device placement is a non-issue here.)
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from climategan_tpu.models.blocks import (
    BaseDecoder,
    Conv2dBlock,
    SPADEResnetBlock,
)
from climategan_tpu.ops.interpolate import resize, upsample_nearest


class MaskBaseDecoder(nn.Module):
    input_dim: int = 2048
    n_upsample: int = 3
    n_res: int = 3
    proj_dim: int = 64
    output_dim: int = 1
    norm: str = "spectral"
    activ: str = "lrelu"
    pad_type: str = "reflect"
    low_level_feats_dim: int = 256  # -1 to disable
    use_dada: bool = False

    @nn.compact
    def __call__(self, z, cond=None, z_depth=None,
                 train: bool = False, update_sn: bool = False):
        return BaseDecoder(
            n_upsample=self.n_upsample,
            n_res=self.n_res,
            input_dim=self.input_dim,
            proj_dim=self.proj_dim,
            output_dim=self.output_dim,
            norm=self.norm,
            activ=self.activ,
            pad_type=self.pad_type,
            output_activ="none",
            low_level_feats_dim=self.low_level_feats_dim,
            use_dada=self.use_dada,
            name="decoder",
        )(z, cond=cond, z_depth=z_depth, train=train, update_sn=update_sn)


class MaskSpadeDecoder(nn.Module):
    latent_dim: int = 128
    cond_nc: int = 15
    num_layers: int = 3
    use_proj: bool = True
    proj_dim: int = 64
    input_dims: Tuple[int, int] = (2048, 256)
    spade_use_spectral_norm: bool = True
    spade_param_free_norm: str = "batch"
    all_lrelu: bool = True

    @nn.compact
    def __call__(self, z, cond, z_depth=None,
                 train: bool = False, update_sn: bool = False):
        conv_kw = dict(
            activation="lrelu", pad_type="reflect", norm="spectral_batch",
        )
        if isinstance(z, (list, tuple)):
            z_h, z_l = z
            if self.use_proj:
                z_l = Conv2dBlock(
                    self.proj_dim, 3, 1, 1, name="low_level_conv", **conv_kw
                )(z_l, train=train, update_sn=update_sn)
                z_l = resize(
                    z_l, (z_h.shape[1], z_h.shape[2]), mode="bilinear",
                    align_corners=False,
                )
                z_h = Conv2dBlock(
                    self.proj_dim, 3, 1, 1, name="high_level_conv", **conv_kw
                )(z_h, train=train, update_sn=update_sn)
            else:
                z_l = Conv2dBlock(
                    self.input_dims[0], 3, 1, 1, name="low_level_conv", **conv_kw
                )(z_l, train=train, update_sn=update_sn)
                z_l = resize(
                    z_l, (z_h.shape[1], z_h.shape[2]), mode="bilinear",
                    align_corners=False,
                )
            y = jnp.concatenate([z_h, z_l], axis=-1)
            y = Conv2dBlock(
                self.latent_dim, 3, 1, 1, name="merge_feats_conv", **conv_kw
            )(y, train=train, update_sn=update_sn)
        else:
            y = Conv2dBlock(
                self.latent_dim, 3, 1, 1, name="fc_conv", **conv_kw
            )(z, train=train, update_sn=update_sn)

        for i in range(self.num_layers):
            y = SPADEResnetBlock(
                fin=self.latent_dim // (2 ** i),
                fout=self.latent_dim // (2 ** (i + 1)),
                cond_nc=self.cond_nc,
                use_spectral_norm=self.spade_use_spectral_norm,
                param_free_norm=self.spade_param_free_norm,
                kernel_size=3,
                last_activation="lrelu" if self.all_lrelu else None,
                name=f"spade_block{i}",
            )(y, cond, train=train, update_sn=update_sn)
            y = upsample_nearest(y, 2, 2)

        return Conv2dBlock(
            1, 3, 1, 1, activation="none", pad_type="reflect",
            norm="spectral", name="mask_conv",
        )(y, train=train, update_sn=update_sn)

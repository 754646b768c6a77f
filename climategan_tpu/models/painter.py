"""SPADE Painter generator, NHWC.

Re-design of reference climategan/painter.py (PainterSpadeDecoder, :16-171):
GauGAN-style decoder that paints water inside a mask. With ``no_z`` (the
default, defaults.yaml:148), the latent is produced by a 3x3 conv over the
masked input resized to (H,W) / 2^spade_n_up (painter.py:149-152), then
head_0 / G_middle_0 / G_middle_1 / (spade_n_up-2) halving SPADE resblocks,
interleaved with nearest x2 upsampling, a final SPADE block, and a 3x3 conv
+ tanh head (painter.py:153-168). All SPADE conditioning uses the masked
input image (cond_nc=3), resized per-scale with nearest interpolation.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from climategan_tpu.models.blocks import SPADEResnetBlock
from climategan_tpu.models.norms import BatchNorm, SNConv
from climategan_tpu.ops.interpolate import resize, upsample_nearest


class PainterSpadeDecoder(nn.Module):
    latent_dim: int = 640
    cond_nc: int = 3
    spade_n_up: int = 7
    spade_use_spectral_norm: bool = True
    spade_param_free_norm: str = "instance"
    spade_kernel_size: int = 3
    use_final_shortcut: bool = False

    def _srb(self, fin, fout, name):
        return SPADEResnetBlock(
            fin=fin,
            fout=fout,
            cond_nc=self.cond_nc,
            use_spectral_norm=self.spade_use_spectral_norm,
            param_free_norm=self.spade_param_free_norm,
            kernel_size=self.spade_kernel_size,
            name=name,
        )

    @nn.compact
    def __call__(self, z: Optional[jax.Array], cond: jax.Array,
                 train: bool = False, update_sn: bool = False) -> jax.Array:
        nc = self.latent_dim
        if z is None:
            zh = cond.shape[1] // (2 ** self.spade_n_up)
            zw = cond.shape[2] // (2 ** self.spade_n_up)
            # torch F.interpolate default mode is nearest (painter.py:152)
            z_in = resize(cond, (zh, zw), mode="nearest")
            z = SNConv(nc, (3, 3), padding=(1, 1), name="fc")(z_in)

        y = self._srb(nc, nc, "head_0")(z, cond, train=train, update_sn=update_sn)
        y = upsample_nearest(y, 2, 2)
        y = self._srb(nc, nc, "G_middle_0")(y, cond, train=train, update_sn=update_sn)
        y = upsample_nearest(y, 2, 2)
        y = self._srb(nc, nc, "G_middle_1")(y, cond, train=train, update_sn=update_sn)

        for i in range(self.spade_n_up - 2):
            y = upsample_nearest(y, 2, 2)
            y = self._srb(nc // 2 ** i, nc // 2 ** (i + 1), f"up_spade{i}")(
                y, cond, train=train, update_sn=update_sn
            )

        final_nc = nc // 2 ** (self.spade_n_up - 2)

        if self.use_final_shortcut:
            sc = SNConv(
                3, (1, 1), spectral=True, name="final_shortcut_conv",
            )(y, update_sn=update_sn)
            sc = BatchNorm(name="final_shortcut_bn")(sc, train=train)
            cond = nn.leaky_relu(sc, negative_slope=0.2)

        y = self._srb(final_nc, final_nc, "final_spade")(
            y, cond, train=train, update_sn=update_sn
        )
        y = SNConv(3, (3, 3), padding=(1, 1), name="conv_img")(
            nn.leaky_relu(y, negative_slope=0.2)
        )
        return jnp.tanh(y)

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
    # run the full-resolution stage (last up_spade -> final_spade ->
    # conv_img) space-to-depth packed: same math, 4x the channels at 1/4
    # the pixels — the tail's 3-40 channels otherwise pad the TPU lane dim
    # to 128 (ops/s2d.py; profiled ~45% of flood inference in this stage)
    s2d_tail: bool = True

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

        # space-to-depth tail: only with the default instance-norm SPADEs,
        # no final shortcut (its BatchNorm pools per-channel), at least one
        # up_spade (so the tail starts from an upsample), and even dims
        use_s2d = (
            self.s2d_tail
            and self.spade_param_free_norm == "instance"
            and not self.use_final_shortcut
            and self.spade_n_up >= 3
            and cond.shape[1] % 2 == 0 and cond.shape[2] % 2 == 0
        )

        y = self._srb(nc, nc, "head_0")(z, cond, train=train, update_sn=update_sn)
        y = upsample_nearest(y, 2, 2)
        y = self._srb(nc, nc, "G_middle_0")(y, cond, train=train, update_sn=update_sn)
        y = upsample_nearest(y, 2, 2)
        y = self._srb(nc, nc, "G_middle_1")(y, cond, train=train, update_sn=update_sn)

        n_up = self.spade_n_up - 2
        # s2d depth: the last two up_spades (the 320^2/640^2 stages at the
        # flagship resolution) when the dims allow it
        k_s2d = 0
        if use_s2d:
            k_s2d = 2 if (n_up >= 2 and cond.shape[1] % 4 == 0
                          and cond.shape[2] % 4 == 0) else 1
        i0 = n_up - k_s2d
        for i in range(n_up):
            if use_s2d and i == i0:
                from climategan_tpu.ops.s2d import upsample2x_s2d

                y = upsample2x_s2d(y)
            elif use_s2d and i > i0:
                from climategan_tpu.ops.s2d import (
                    depth_to_space,
                    upsample2x_s2d,
                )

                # s2d-to-s2d nearest upsample: unpack one level, replicate
                y = upsample2x_s2d(depth_to_space(y))
            else:
                y = upsample_nearest(y, 2, 2)
            y = self._srb(nc // 2 ** i, nc // 2 ** (i + 1), f"up_spade{i}")(
                y, cond, train=train, update_sn=update_sn,
                s2d=use_s2d and i >= i0,
            )

        final_nc = nc // 2 ** (self.spade_n_up - 2)

        if self.use_final_shortcut:
            sc = SNConv(
                3, (1, 1), spectral=True, name="final_shortcut_conv",
            )(y, update_sn=update_sn)
            sc = BatchNorm(name="final_shortcut_bn")(sc, train=train)
            cond = nn.leaky_relu(sc, negative_slope=0.2)

        y = self._srb(final_nc, final_nc, "final_spade")(
            y, cond, train=train, update_sn=update_sn, s2d=use_s2d
        )
        y = SNConv(3, (3, 3), padding=(1, 1), name="conv_img")(
            nn.leaky_relu(y, negative_slope=0.2),
            s2d="s2d" if use_s2d else "",
        )
        if use_s2d:
            from climategan_tpu.ops.s2d import depth_to_space

            return depth_to_space(jnp.tanh(y))
        return jnp.tanh(y)

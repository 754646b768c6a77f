"""Decoder building blocks (TPU-native, NHWC, Flax linen).

Re-designs of reference climategan/blocks.py: Conv2dBlock (:49-147),
ResBlock/ResBlocks (:153-200), BaseDecoder (:206-316),
SPADEResnetBlock (:325-398), InterpolateNearest2d (:11-43 — here a pure
reshape/broadcast in ops.interpolate.upsample_nearest).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from climategan_tpu.models.norms import (
    BatchNorm,
    InstanceNorm,
    LayerNormRef,
    SNConv,
    SPADE,
)
from climategan_tpu.ops.interpolate import resize, upsample_nearest


def pad2d(x: jax.Array, padding: int, pad_type: str) -> jax.Array:
    """Spatial padding on NHWC."""
    if padding == 0:
        return x
    p = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    if pad_type == "zero":
        return jnp.pad(x, p)
    if pad_type == "reflect":
        return jnp.pad(x, p, mode="reflect")
    if pad_type == "replicate":
        return jnp.pad(x, p, mode="edge")
    raise ValueError(f"Unsupported padding type: {pad_type}")


class Activation(nn.Module):
    """Activation by name; prelu carries a learnable slope."""

    kind: str

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kind
        if k == "relu":
            return nn.relu(x)
        if k == "lrelu":
            return nn.leaky_relu(x, negative_slope=0.2)
        if k == "prelu":
            a = self.param("alpha", nn.initializers.constant(0.25), ())
            return jnp.where(x >= 0, x, a.astype(x.dtype) * x)
        if k == "selu":
            return nn.selu(x)
        if k == "tanh":
            return jnp.tanh(x)
        if k == "sigmoid":
            return nn.sigmoid(x)
        if k in ("none", None):
            return x
        raise ValueError(f"Unsupported activation: {k}")


class Conv2dBlock(nn.Module):
    """pad -> conv (optionally spectral-normalized) -> norm -> activation.

    Mirrors reference blocks.py:49-147 including its bias rule: the
    non-spectral path drops the conv bias when norm == 'batch'.
    """

    output_dim: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    norm: str = "none"
    activation: str = "relu"
    pad_type: str = "zero"
    bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, update_sn: bool = False):
        norm = self.norm
        use_spectral = norm == "spectral" or norm.startswith("spectral_")
        post_norm = norm.replace("spectral_", "") if norm.startswith("spectral_") else (
            "none" if norm == "spectral" else norm
        )

        use_bias = self.bias if use_spectral else (
            self.bias if post_norm != "batch" else False
        )

        # 3x3 stride-1 reflect convs skip the padded-tensor
        # materialization (zero-pad conv + exact border fixes,
        # norms._conv3x3_reflect); A/B-measured faster on v5e — see the
        # FUSED_REFLECT note in norms.py. Switchable for re-measurement.
        from climategan_tpu.models import norms as _norms

        fused_reflect = (
            _norms.FUSED_REFLECT
            and self.pad_type == "reflect" and self.padding == 1
            and self.kernel_size == 3 and self.stride == 1
            and self.dilation == 1
        )
        if not fused_reflect:
            x = pad2d(x, self.padding, self.pad_type)
        x = SNConv(
            features=self.output_dim,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            dilation=(self.dilation, self.dilation),
            use_bias=use_bias,
            spectral=use_spectral,
            name="conv",
        )(x, update_sn=update_sn, reflect_pad=fused_reflect)

        if post_norm == "batch":
            x = BatchNorm(name="norm")(x, train=train)
        elif post_norm == "instance":
            x = InstanceNorm(name="norm")(x)
        elif post_norm == "layer":
            x = LayerNormRef(self.output_dim, name="norm")(x)
        elif post_norm in ("none",):
            pass
        else:
            raise ValueError(f"Unsupported normalization: {post_norm}")

        return Activation(self.activation, name="activ")(x)


class ResBlock(nn.Module):
    """MUNIT-style residual block (reference blocks.py:174-200)."""

    dim: int
    norm: str = "instance"
    activation: str = "relu"
    pad_type: str = "zero"

    @nn.compact
    def __call__(self, x, train: bool = False, update_sn: bool = False):
        y = Conv2dBlock(
            self.dim, 3, 1, 1, norm=self.norm, activation=self.activation,
            pad_type=self.pad_type, name="conv1",
        )(x, train=train, update_sn=update_sn)
        y = Conv2dBlock(
            self.dim, 3, 1, 1, norm=self.norm, activation="none",
            pad_type=self.pad_type, name="conv2",
        )(y, train=train, update_sn=update_sn)
        return x + y


class ResBlocks(nn.Module):
    num_blocks: int
    dim: int
    norm: str = "instance"
    activation: str = "relu"
    pad_type: str = "zero"

    @nn.compact
    def __call__(self, x, train: bool = False, update_sn: bool = False):
        for i in range(self.num_blocks):
            x = ResBlock(
                self.dim, self.norm, self.activation, self.pad_type,
                name=f"block{i}",
            )(x, train=train, update_sn=update_sn)
        return x


class BaseDecoder(nn.Module):
    """Generic decoder head (reference blocks.py:206-316).

    proj 1x1 -> (merge low-level feats) -> n_res ResBlocks ->
    n_upsample x [nearest x2 up, conv k3 halving channels] -> output conv.
    Optional DADA fusion multiplies z by z_depth before projection.
    """

    n_upsample: int = 4
    n_res: int = 4
    input_dim: int = 2048
    proj_dim: int = 64
    output_dim: int = 3
    norm: str = "batch"
    activ: str = "relu"
    pad_type: str = "zero"
    output_activ: str = "tanh"
    low_level_feats_dim: int = -1
    use_dada: bool = False

    @nn.compact
    def __call__(self, z, cond=None, z_depth=None,
                 train: bool = False, update_sn: bool = False):
        low_level_feat = None
        if isinstance(z, (list, tuple)):
            if self.low_level_feats_dim <= 0:
                z = z[0]
            else:
                z, low = z
                low = Conv2dBlock(
                    self.proj_dim if self.proj_dim != -1 else self.input_dim,
                    3, 1, 1, pad_type=self.pad_type, norm=self.norm,
                    activation=self.activ, name="low_level_conv",
                )(low, train=train, update_sn=update_sn)
                low_level_feat = resize(
                    low, (z.shape[1], z.shape[2]), mode="bilinear",
                    align_corners=False,
                )

        if z_depth is not None and self.use_dada:
            z = z * z_depth

        dim = self.proj_dim if self.proj_dim != -1 else self.input_dim
        if self.proj_dim != -1:
            z = Conv2dBlock(
                self.proj_dim, 1, 1, 0, norm=self.norm, activation=self.activ,
                name="proj_conv",
            )(z, train=train, update_sn=update_sn)

        if low_level_feat is not None:
            z = jnp.concatenate([low_level_feat, z], axis=-1)
            z = Conv2dBlock(
                dim, 1, 1, 0, pad_type=self.pad_type, norm=self.norm,
                activation=self.activ, name="merge_feats_conv",
            )(z, train=train, update_sn=update_sn)

        z = ResBlocks(
            self.n_res, dim, self.norm, self.activ, pad_type=self.pad_type,
            name="res_blocks",
        )(z, train=train, update_sn=update_sn)

        for i in range(self.n_upsample):
            z = upsample_nearest(z, 2, 2)
            z = Conv2dBlock(
                dim // 2, 3, 1, 1, pad_type=self.pad_type, norm=self.norm,
                activation=self.activ, name=f"up_conv{i}",
            )(z, train=train, update_sn=update_sn)
            dim //= 2

        return Conv2dBlock(
            self.output_dim, 3, 1, 1, pad_type=self.pad_type, norm="none",
            activation=self.output_activ, name="out_conv",
        )(z, train=train, update_sn=update_sn)


class SPADEResnetBlock(nn.Module):
    """SPADE residual block (reference blocks.py:325-398)."""

    fin: int
    fout: int
    cond_nc: int
    use_spectral_norm: bool = True
    param_free_norm: str = "instance"
    kernel_size: int = 3
    last_activation: Optional[str] = None

    @nn.compact
    def __call__(self, x, seg, train: bool = False, update_sn: bool = False,
                 s2d: bool = False):
        """``s2d``: x is space-to-depth packed (seg stays full-res); every
        conv runs in its s2d-equivalent form (ops/s2d.py) — exact math,
        identical parameters/checkpoint layout."""
        fmiddle = min(self.fin, self.fout)
        learned_shortcut = self.fin != self.fout
        sconv = "s2d" if s2d else ""

        def act(v):
            return nn.leaky_relu(v, negative_slope=0.2)

        if learned_shortcut and self.param_free_norm == "instance":
            # norm_s and norm_0 read the same (x, seg): run them jointly
            # with batched MXU calls (models/norms.dual_spade; exact math,
            # checkpoint paths preserved via SPADEParamSet)
            from climategan_tpu.models.norms import SPADEParamSet, dual_spade

            params_s = SPADEParamSet(
                self.kernel_size, self.fin, self.cond_nc, name="norm_s",
            )()
            params_0 = SPADEParamSet(
                self.kernel_size, self.fin, self.cond_nc, name="norm_0",
            )()
            x_s, dx = dual_spade(x, seg, params_s, params_0,
                                 self.fin, self.kernel_size, s2d=s2d)
            x_s = SNConv(
                self.fout, (1, 1), use_bias=False,
                spectral=self.use_spectral_norm, name="conv_s",
            )(x_s, update_sn=update_sn, s2d=sconv)
        else:
            if learned_shortcut:
                x_s = SPADE(
                    self.param_free_norm, self.kernel_size, self.fin,
                    self.cond_nc, name="norm_s",
                )(x, seg, train=train, update_sn=update_sn, s2d=s2d)
                x_s = SNConv(
                    self.fout, (1, 1), use_bias=False,
                    spectral=self.use_spectral_norm, name="conv_s",
                )(x_s, update_sn=update_sn, s2d=sconv)
            else:
                x_s = x
            dx = SPADE(
                self.param_free_norm, self.kernel_size, self.fin,
                self.cond_nc, name="norm_0",
            )(x, seg, train=train, update_sn=update_sn, s2d=s2d)
        dx = SNConv(
            fmiddle, (3, 3), padding=(1, 1),
            spectral=self.use_spectral_norm, name="conv_0",
        )(act(dx), update_sn=update_sn, s2d=sconv)

        dx = SPADE(
            self.param_free_norm, self.kernel_size, fmiddle, self.cond_nc,
            name="norm_1",
        )(dx, seg, train=train, update_sn=update_sn, s2d=s2d)
        dx = SNConv(
            self.fout, (3, 3), padding=(1, 1),
            spectral=self.use_spectral_norm, name="conv_1",
        )(act(dx), update_sn=update_sn, s2d=sconv)

        out = x_s + dx
        if self.last_activation == "lrelu":
            return act(out)
        if self.last_activation is None:
            return out
        raise NotImplementedError(
            f"Unsupported last_activation: {self.last_activation}"
        )

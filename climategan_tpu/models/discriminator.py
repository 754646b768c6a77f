"""Discriminators (NHWC, flax linen).

Re-design of reference climategan/discriminator.py:
  * NLayerDiscriminator (:82-182): spectral-normed PatchGAN, kw=4, returning
    intermediate features for feature matching.
  * MultiscaleDiscriminator (:190-239): num_D PatchGANs over an AvgPool
    (3x3, stride 2, count_include_pad=False) image pyramid.
  * fc (ADVENT) discriminator (:327-361): 5 stride-2 4x4 convs over entropy
    maps, optional spectral norm ("WGAN_norm").
  * OmniDiscriminator (:242-324): dict {p: multiscale(input_nc=4),
    m: Advent(2ch), s: Advent(num_classes)}.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from climategan_tpu.models.norms import InstanceNorm, SNConv


def avg_pool_3x3_s2_no_pad_count(x: jax.Array) -> jax.Array:
    """torch AvgPool2d(3, stride=2, padding=1, count_include_pad=False)."""
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    # init must be a literal (see resnet.max_pool_3x3_s2)
    sum_ = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    return sum_ / cnt


class NLayerDiscriminator(nn.Module):
    ndf: int = 64
    n_layers: int = 4
    norm: str = "instance"  # instance | none
    use_sigmoid: bool = False
    get_intermediate_features: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, update_sn: bool = False):
        feats = []
        use_bias = self.norm == "instance" or self.norm == "none"

        def block(y, features, stride, idx, with_norm=True):
            y = SNConv(
                features, (4, 4), strides=(stride, stride), padding=(1, 1),
                use_bias=use_bias, spectral=True, name=f"conv{idx}",
            )(y, update_sn=update_sn)
            if with_norm and self.norm == "instance":
                y = InstanceNorm(name=f"norm{idx}")(y)
            return nn.leaky_relu(y, negative_slope=0.2)

        y = block(x, self.ndf, 2, 0, with_norm=False)
        feats.append(y)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            y = block(y, self.ndf * nf, 2, n)
            feats.append(y)
        nf = min(2 ** self.n_layers, 8)
        y = block(y, self.ndf * nf, 1, self.n_layers)
        feats.append(y)
        y = SNConv(
            1, (4, 4), strides=(1, 1), padding=(1, 1), spectral=True,
            name="conv_out",
        )(y, update_sn=update_sn)
        if self.use_sigmoid:
            y = nn.sigmoid(y)
        feats.append(y)
        if self.get_intermediate_features:
            return feats
        return feats[-1]


class MultiscaleDiscriminator(nn.Module):
    num_D: int = 3
    ndf: int = 64
    n_layers: int = 4
    norm: str = "instance"
    use_sigmoid: bool = False
    get_intermediate_features: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, update_sn: bool = False):
        result = []
        for i in range(self.num_D):
            out = NLayerDiscriminator(
                ndf=self.ndf,
                n_layers=self.n_layers,
                norm=self.norm,
                use_sigmoid=self.use_sigmoid,
                get_intermediate_features=self.get_intermediate_features,
                name=f"discriminator_{i}",
            )(x, train=train, update_sn=update_sn)
            if not self.get_intermediate_features:
                out = [out]
            result.append(out)
            x = avg_pool_3x3_s2_no_pad_count(x)
        return result


class FCDiscriminator(nn.Module):
    """ADVENT entropy-map discriminator: 5 stride-2 4x4 convs."""

    ndf: int = 64
    use_norm: bool = True  # spectral ("WGAN_norm")

    @nn.compact
    def __call__(self, x, train: bool = False, update_sn: bool = False):
        dims = (self.ndf, self.ndf * 2, self.ndf * 4, self.ndf * 8, 1)
        for i, f in enumerate(dims):
            x = SNConv(
                f, (4, 4), strides=(2, 2), padding=(1, 1),
                spectral=self.use_norm, name=f"conv{i}",
            )(x, update_sn=update_sn)
            if i < len(dims) - 1:
                x = nn.leaky_relu(x, negative_slope=0.2)
        return x


@dataclasses.dataclass(frozen=True)
class DisConfig:
    tasks: Tuple[str, ...] = ("d", "s", "m", "p")
    p_use_local: bool = False
    p_num_D: int = 3
    p_ndf: int = 64
    p_n_layers: int = 4
    p_norm: str = "instance"
    p_use_sigmoid: bool = False
    p_get_intermediate_features: bool = True
    m_use_advent: bool = True
    m_wgan_norm: bool = True
    s_use_advent: bool = True
    s_wgan_norm: bool = True
    s_num_classes: int = 11

    @classmethod
    def from_opts(cls, opts) -> "DisConfig":
        d = opts.dis
        return cls(
            tasks=tuple(opts.tasks),
            p_use_local=bool(d.p.get("use_local_discriminator", False)),
            p_num_D=int(d.p.get("num_D", 3)),
            p_ndf=int(d.p.get("ndf", 64)),
            p_n_layers=int(d.p.get("n_layers", 4)),
            p_norm=d.p.get("norm", "instance"),
            p_use_sigmoid=bool(d.p.get("use_sigmoid", False)),
            p_get_intermediate_features=bool(
                d.p.get("get_intermediate_features", True)
            ),
            m_use_advent=bool(opts.gen.m.get("use_advent", True)),
            m_wgan_norm=d.m.get("gan_type", "WGAN_norm") == "WGAN_norm",
            s_use_advent=bool(opts.gen.s.get("use_advent", True)),
            s_wgan_norm=d.s.get("gan_type", "WGAN_norm") == "WGAN_norm",
            s_num_classes=int(opts.gen.s.get("output_dim", 11)),
        )


class OmniDiscriminator(nn.Module):
    """Dict-of-discriminators: p (painter), m / s (ADVENT)."""

    cfg: DisConfig = DisConfig()

    def setup(self):
        c = self.cfg
        if "p" in c.tasks:
            kw = dict(
                num_D=c.p_num_D, ndf=c.p_ndf, n_layers=c.p_n_layers,
                norm=c.p_norm, use_sigmoid=c.p_use_sigmoid,
                get_intermediate_features=c.p_get_intermediate_features,
            )
            if c.p_use_local:
                # global/local pair on 3-channel inputs
                # (reference discriminator.py:245-270)
                self.p_global = MultiscaleDiscriminator(**kw)
                self.p_local = MultiscaleDiscriminator(**kw)
            else:
                self.p = MultiscaleDiscriminator(**kw)
        if "m" in c.tasks and c.m_use_advent:
            self.m_advent = FCDiscriminator(use_norm=c.m_wgan_norm)
        if "s" in c.tasks and c.s_use_advent:
            self.s_advent = FCDiscriminator(use_norm=c.s_wgan_norm)

    def disc_p(self, x, train: bool = False, update_sn: bool = False):
        return self.p(x, train=train, update_sn=update_sn)

    def disc_p_global(self, x, train: bool = False, update_sn: bool = False):
        return self.p_global(x, train=train, update_sn=update_sn)

    def disc_p_local(self, x, train: bool = False, update_sn: bool = False):
        return self.p_local(x, train=train, update_sn=update_sn)

    def disc_m(self, x, train: bool = False, update_sn: bool = False):
        return self.m_advent(x, train=train, update_sn=update_sn)

    def disc_s(self, x, train: bool = False, update_sn: bool = False):
        return self.s_advent(x, train=train, update_sn=update_sn)

    def __call__(self, p_in=None, m_in=None, s_in=None,
                 train: bool = False, update_sn: bool = False):
        out = {}
        if p_in is not None and "p" in self.cfg.tasks:
            if self.cfg.p_use_local:
                out["p_global"] = self.disc_p_global(
                    p_in[..., :3], train=train, update_sn=update_sn)
                out["p_local"] = self.disc_p_local(
                    p_in[..., :3], train=train, update_sn=update_sn)
            else:
                out["p"] = self.disc_p(p_in, train=train, update_sn=update_sn)
        if m_in is not None and hasattr(self, "m_advent"):
            out["m"] = self.disc_m(m_in, train=train, update_sn=update_sn)
        if s_in is not None and hasattr(self, "s_advent"):
            out["s"] = self.disc_s(s_in, train=train, update_sn=update_sn)
        return out


def create_discriminator(opts) -> OmniDiscriminator:
    return OmniDiscriminator(cfg=DisConfig.from_opts(opts))

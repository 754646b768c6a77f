"""OmniGenerator: encoder + {depth, seg, mask} heads + painter (NHWC).

Re-design of reference climategan/generator.py (OmniGenerator, :64-355).
The torch version is a stateful container with .encode/.decode/.mask/.paint
methods; here it is a single linen module whose methods are invoked
functionally (``apply(vars, ..., method=...)``) so the whole inference
pipeline traces into ONE XLA graph (the reference needed xm.mark_step()
cuts — trainer.py:273-309 — precisely because it couldn't do this).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from climategan_tpu.models.deeplab import DeepLabV3Decoder
from climategan_tpu.models.depth import BaseDepthDecoder, DADADepthDecoder
from climategan_tpu.models.masker import MaskBaseDecoder, MaskSpadeDecoder
from climategan_tpu.models.painter import PainterSpadeDecoder
from climategan_tpu.models.resnet import ResNetEncoder
from climategan_tpu.ops.image import normalize
from climategan_tpu.ops.interpolate import resize
from climategan_tpu.ops.perlin import mix_noise


@dataclasses.dataclass(frozen=True)
class GenConfig:
    """Static generator hyperparameters (subset of opts.gen.*)."""

    tasks: Tuple[str, ...] = ("d", "s", "m", "p")
    # encoder
    encoder_arch: str = "deeplabv3"  # deeplabv3 | deeplabv2
    s_architecture: str = "deeplabv3"
    backbone: str = "resnet"  # resnet | mobilenet
    output_stride: int = 8
    encoder_layers: Tuple[int, ...] = (3, 4, 23, 3)
    # v2 encoder trailing ResBlocks (reference deeplab/__init__.py:91 passes
    # opts.gen.encoder.n_res, default 0 in defaults.yaml)
    encoder_n_res: int = 0
    # depth head
    d_architecture: str = "dada"
    d_upsample_featuremaps: bool = True
    d_target_size: int = 160
    d_classify_buckets: int = 0
    # seg head
    s_num_classes: int = 11
    s_use_dada: bool = True
    s_target_size: Tuple[int, int] = (160, 160)
    # mask head
    m_use_spade: bool = False
    m_use_dada: bool = False
    m_spade_cond_nc: int = 15
    m_spade_latent_dim: int = 128
    m_spade_num_layers: int = 3
    m_spade_detach: bool = False
    m_use_proj: bool = True
    m_proj_dim: int = 64
    m_n_res: int = 3
    m_n_upsample: int = 3
    m_norm: str = "spectral"
    m_activ: str = "lrelu"
    m_pad_type: str = "reflect"
    m_use_low_level_feats: bool = True
    # painter
    p_latent_dim: int = 640
    p_spade_n_up: int = 7
    p_no_z: bool = True
    p_use_final_shortcut: bool = False
    p_paste_original_content: bool = True
    p_spade_param_free_norm: str = "instance"
    p_spade_use_spectral_norm: bool = True
    p_s2d_tail: bool = True  # space-to-depth full-res painter stage

    @classmethod
    def from_opts(cls, opts) -> "GenConfig":
        g = opts.gen
        transforms = opts.data.get("transforms", []) or []
        sizes = {}
        for t in transforms:
            if t.get("name") == "resize" and isinstance(t.get("new_size"), dict):
                sizes = dict(t["new_size"])
        d_size = int(sizes.get("d", sizes.get("default", 640)))
        s_size = int(sizes.get("s", sizes.get("default", 640)))
        return cls(
            tasks=tuple(opts.tasks),
            encoder_arch=g.encoder.get("architecture", "deeplabv3"),
            s_architecture=g.s.get("architecture", "deeplabv3"),
            backbone=g.deeplabv3.get("backbone", "resnet"),
            output_stride=int(g.deeplabv3.get("output_stride", 8)),
            encoder_layers=tuple(
                g.deeplabv2.get("nblocks", (3, 4, 23, 3)) or (3, 4, 23, 3)
            ),
            encoder_n_res=int(g.encoder.get("n_res", 0) or 0),
            d_architecture=g.d.get("architecture", "dada"),
            d_upsample_featuremaps=bool(g.d.get("upsample_featuremaps", True)),
            d_target_size=d_size,
            d_classify_buckets=(
                int(g.d.classify.linspace.buckets)
                if g.d.get("classify", {}).get("enable")
                else 0
            ),
            s_num_classes=int(g.s.get("output_dim", 11)),
            s_use_dada=bool(g.s.get("use_dada", True)),
            s_target_size=(s_size, s_size),
            m_use_spade=bool(g.m.get("use_spade", False)),
            m_use_dada=bool(g.m.get("use_dada", False)),
            m_spade_cond_nc=int(g.m.spade.get("cond_nc", 15)),
            m_spade_latent_dim=int(g.m.spade.get("latent_dim", 128)),
            m_spade_num_layers=int(g.m.spade.get("num_layers", 3)),
            m_spade_detach=bool(g.m.spade.get("detach", False)),
            m_use_proj=bool(g.m.get("use_proj", True)),
            m_proj_dim=int(g.m.get("proj_dim", 64)),
            m_n_res=int(g.m.get("n_res", 3)),
            m_n_upsample=int(g.m.get("n_upsample", 3)),
            m_norm=g.m.get("norm", "spectral"),
            m_activ=g.m.get("activ", "lrelu"),
            m_pad_type=g.m.get("pad_type", "reflect"),
            m_use_low_level_feats=bool(g.m.get("use_low_level_feats", True)),
            p_latent_dim=int(g.p.get("latent_dim", 640)),
            p_spade_n_up=int(g.p.get("spade_n_up", 7)),
            p_no_z=bool(g.p.get("no_z", True)),
            p_use_final_shortcut=bool(g.p.get("use_final_shortcut", False)),
            p_paste_original_content=bool(
                g.p.get("paste_original_content", True)
            ),
            p_spade_param_free_norm=g.p.get("spade_param_free_norm", "instance"),
            p_spade_use_spectral_norm=bool(
                g.p.get("spade_use_spectral_norm", True)
            ),
            p_s2d_tail=bool(
                opts.get("tpu", {}).get("painter_s2d", True)
            ),
        )


class OmniGenerator(nn.Module):
    cfg: GenConfig = GenConfig()

    def setup(self):
        c = self.cfg
        res_dim = 320 if c.backbone == "mobilenet" else 2048
        low_dim = 24 if c.backbone == "mobilenet" else 256
        if any(t in c.tasks for t in "msd"):
            if c.encoder_arch == "deeplabv2":
                from climategan_tpu.models.deeplab_v2 import ResNetMultiV2

                self.encoder = ResNetMultiV2(layers=c.encoder_layers,
                                             n_res=c.encoder_n_res)
            elif c.backbone == "mobilenet":
                from climategan_tpu.models.mobilenet import MobileNetV2Encoder

                self.encoder = MobileNetV2Encoder()
            else:
                self.encoder = ResNetEncoder(
                    layers=c.encoder_layers, output_stride=c.output_stride
                )
        if "d" in c.tasks:
            if c.d_architecture == "dada":
                self.depth_decoder = DADADepthDecoder(
                    res_dim=res_dim,
                    do_feat_fusion=c.m_use_dada or ("s" in c.tasks and c.s_use_dada),
                    upsample_featuremaps=c.d_upsample_featuremaps,
                    target_size=c.d_target_size,
                )
            else:
                self.depth_decoder = BaseDepthDecoder(
                    input_dim=res_dim,
                    classify_buckets=c.d_classify_buckets,
                    upsample_featuremaps=c.d_upsample_featuremaps,
                    target_size=(c.d_target_size, c.d_target_size),
                )
        if "s" in c.tasks:
            if c.s_architecture == "deeplabv2" or c.encoder_arch == "deeplabv2":
                from climategan_tpu.models.deeplab_v2 import DeepLabV2Decoder

                self.seg_decoder = DeepLabV2Decoder(
                    num_classes=c.s_num_classes,
                    use_dada=c.s_use_dada,
                    target_size=c.s_target_size,
                )
            else:
                self.seg_decoder = DeepLabV3Decoder(
                    num_classes=c.s_num_classes,
                    use_dada=c.s_use_dada,
                    target_size=c.s_target_size,
                    backbone=c.backbone,
                )
        if "m" in c.tasks:
            if c.m_use_spade:
                self.mask_decoder = MaskSpadeDecoder(
                    latent_dim=c.m_spade_latent_dim,
                    cond_nc=c.m_spade_cond_nc,
                    num_layers=c.m_spade_num_layers,
                    use_proj=c.m_use_proj,
                    proj_dim=c.m_proj_dim,
                    input_dims=(res_dim, low_dim),
                )
            else:
                self.mask_decoder = MaskBaseDecoder(
                    input_dim=res_dim,
                    n_upsample=c.m_n_upsample,
                    n_res=c.m_n_res,
                    proj_dim=c.m_proj_dim,
                    norm=c.m_norm,
                    activ=c.m_activ,
                    pad_type=c.m_pad_type,
                    low_level_feats_dim=(
                        low_dim if c.m_use_low_level_feats else -1
                    ),
                    use_dada=c.m_use_dada,
                )
        if "p" in c.tasks:
            self.painter = PainterSpadeDecoder(
                latent_dim=c.p_latent_dim,
                spade_n_up=c.p_spade_n_up,
                spade_param_free_norm=c.p_spade_param_free_norm,
                spade_use_spectral_norm=c.p_spade_use_spectral_norm,
                use_final_shortcut=c.p_use_final_shortcut,
                s2d_tail=c.p_s2d_tail,
            )

    # ---- task heads -----------------------------------------------------
    def encode(self, x, train: bool = False):
        return self.encoder(x, train=train)

    def depth(self, z, train: bool = False, update_sn: bool = False):
        return self.depth_decoder(z, train=train, update_sn=update_sn)

    def segmentation(self, z, z_depth=None, train: bool = False):
        return self.seg_decoder(z, z_depth=z_depth, train=train)

    def mask_logits(self, z, cond=None, z_depth=None,
                    train: bool = False, update_sn: bool = False):
        return self.mask_decoder(
            z, cond, z_depth=z_depth, train=train, update_sn=update_sn
        )

    def make_m_cond(self, d, s, x=None):
        """Masker SPADE conditioning (reference generator.py:196-230)."""
        if self.cfg.m_spade_detach:
            d = jax.lax.stop_gradient(d)
            s = jax.lax.stop_gradient(s)
        cats = [normalize(d), jax.nn.softmax(s, axis=-1)]
        if self.cfg.m_spade_cond_nc == 15:
            assert x is not None, "cond_nc==15 requires x"
            cats.append(
                resize(x, (s.shape[1], s.shape[2]), "bilinear", align_corners=True)
            )
        return jnp.concatenate(cats, axis=-1)

    def mask(self, x=None, z=None, cond=None, z_depth=None, sigmoid=True,
             train: bool = False, update_sn: bool = False):
        """Full mask path (reference generator.py:232-277)."""
        if z is None:
            z = self.encode(x, train=train)
        if cond is None and self.cfg.m_use_spade:
            d_pred, z_d = self.depth_decoder(z, train=train)
            s_pred = self.seg_decoder(z, z_depth=z_d, train=train)
            cond = jax.lax.stop_gradient(self.make_m_cond(d_pred, s_pred, x))
        if z_depth is None and self.cfg.m_use_dada:
            _, z_depth = self.depth_decoder(z, train=train)
            z_depth = jax.lax.stop_gradient(z_depth)
        logits = self.mask_logits(
            z, cond, z_depth, train=train, update_sn=update_sn
        )
        return nn.sigmoid(logits) if sigmoid else logits

    # ---- painter ---------------------------------------------------------
    def paint(self, m, x, rng=None, no_paste=False,
              train: bool = False, update_sn: bool = False):
        """painter(z, x * (1-m)) then optional paste (generator.py:279-297)."""
        m = m.astype(x.dtype)
        masked = x * (1.0 - m)
        z = None
        if not self.cfg.p_no_z:
            assert rng is not None, "painter with z requires an rng"
            zh = x.shape[1] // (2 ** self.cfg.p_spade_n_up)
            zw = x.shape[2] // (2 ** self.cfg.p_spade_n_up)
            z = jax.random.normal(
                rng, (x.shape[0], zh, zw, self.cfg.p_latent_dim), x.dtype
            )
        fake = self.painter(z, masked, train=train, update_sn=update_sn)
        if self.cfg.p_paste_original_content and not no_paste:
            return x * (1.0 - m) + fake * m
        return fake

    def paint_cloudy(self, m, x, s, rng, sky_idx: int = 9,
                     res: Tuple[int, int] = (8, 8), weight: float = 0.8,
                     train: bool = False, update_sn: bool = False):
        """Paint via a cloudy-sky probe image (generator.py:299-328)."""
        s_up = resize(s, (x.shape[1], x.shape[2]), "bilinear", align_corners=False)
        sky_mask = (jnp.argmax(s_up, axis=-1) == sky_idx).astype(x.dtype)
        noised = mix_noise(rng, x, sky_mask, res=res, weight=weight)
        m = m.astype(x.dtype)
        fake = self.paint(
            m, noised.astype(x.dtype), no_paste=True,
            train=train, update_sn=update_sn,
        )
        return x * (1.0 - m) + fake * m

    def sample_painter_z(self, rng, batch_size: int, height: int, width: int,
                         dtype=jnp.float32):
        """Painter latent sampling (reference generator.py:179-194);
        returns None under no_z (the default)."""
        if self.cfg.p_no_z:
            return None
        zh = height // (2 ** self.cfg.p_spade_n_up)
        zw = width // (2 ** self.cfg.p_spade_n_up)
        return jax.random.normal(
            rng, (batch_size, zh, zw, self.cfg.p_latent_dim), dtype
        )

    def depth_map(self, x=None, z=None, return_z_depth: bool = False,
                  train: bool = False):
        """Depth head with classification argmax handling
        (reference generator.py:330-355)."""
        assert (x is None) != (z is None)
        if z is None:
            z = self.encode(x, train=train)
        d, z_depth = self.depth_decoder(z, train=train)
        if d.shape[-1] > 1:  # bucketized classification head
            d = jnp.argmax(d, axis=-1).astype(jnp.float32)
            d = d / jnp.maximum(d.max(), 1e-12)
            d = d[..., None]
        if return_z_depth:
            return d, z_depth
        return d

    def infer_masker(self, x, train: bool = False):
        """Fused masker forward: x -> (depth, seg, mask) in one trace.

        The reference runs these as separate stages with xm.mark_step()
        between them (trainer.py:269-312); here the shared encoder feeds all
        three heads inside a single XLA graph.
        """
        z = self.encode(x, train=train)
        d, z_depth = self.depth_decoder(z, train=train)
        s = self.seg_decoder(z, z_depth=z_depth, train=train)
        cond = self.make_m_cond(d, s, x) if self.cfg.m_use_spade else None
        m = self.mask(
            x=x, z=z, cond=cond,
            z_depth=z_depth if self.cfg.m_use_dada else None,
            train=train,
        )
        return d, s, m

    # ---- joint forward (used for init and training) -----------------------
    def __call__(self, x, train: bool = False, update_sn: bool = False):
        out = {}
        c = self.cfg
        z = None
        if any(t in c.tasks for t in "msd"):
            z = self.encode(x, train=train)
            out["z"] = z
        d = s = z_depth = None
        if "d" in c.tasks:
            d, z_depth = self.depth_decoder(z, train=train, update_sn=update_sn)
            out["d"], out["z_depth"] = d, z_depth
        if "s" in c.tasks:
            s = self.seg_decoder(z, z_depth=z_depth, train=train)
            out["s"] = s
        if "m" in c.tasks:
            cond = None
            if c.m_use_spade and d is not None and s is not None:
                cond = self.make_m_cond(d, s, x)
            out["m"] = self.mask(
                z=z, x=x, cond=cond,
                z_depth=z_depth if c.m_use_dada else None,
                train=train, update_sn=update_sn,
            )
        if "p" in c.tasks:
            m = out.get("m")
            if m is None:
                m = jnp.zeros(x.shape[:3] + (1,), x.dtype)
            rng = (None if c.p_no_z
                   else (self.make_rng("z") if self.has_rng("z")
                         else jax.random.PRNGKey(0)))
            out["p"] = self.paint(m, x, rng=rng, train=train,
                                  update_sn=update_sn)
        return out


def create_generator(opts) -> OmniGenerator:
    return OmniGenerator(cfg=GenConfig.from_opts(opts))

"""Torch twin of the reference generator at tiny scale, with the exact
state-dict key layout of the released ClimateGAN checkpoints (encoder.*,
decoders.d/s/m.*, painter.*). Used by test_full_parity to validate
utils/convert.convert_generator end-to-end. Own implementation following
the reference's documented semantics (climategan/{deeplab,depth,masker,
painter,blocks,norms}.py); eval-mode only.
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def spectral(conv: nn.Conv2d) -> nn.Module:
    """Reference-style SpectralNorm wrapper (norms.py:84-143): module with
    weight_bar/_u/_v params and one power iteration per forward."""

    class SN(nn.Module):
        def __init__(self, m):
            super().__init__()
            self.module = m
            w = m.weight
            height = w.shape[0]
            width = w.view(height, -1).shape[1]
            u = nn.Parameter(torch.randn(height), requires_grad=False)
            v = nn.Parameter(torch.randn(width), requires_grad=False)
            u.data /= (u.norm() + 1e-12)
            v.data /= (v.norm() + 1e-12)
            w_bar = nn.Parameter(w.data.clone())
            del self.module._parameters["weight"]
            self.module.register_parameter("weight_u", u)
            self.module.register_parameter("weight_v", v)
            self.module.register_parameter("weight_bar", w_bar)

        def forward(self, x):
            w = self.module.weight_bar
            height = w.shape[0]
            wm = w.view(height, -1)
            v = wm.t().mv(self.module.weight_u)
            v = v / (v.norm() + 1e-12)
            u = wm.mv(v)
            u = u / (u.norm() + 1e-12)
            sigma = u.dot(wm.mv(v))
            self.module.weight = w / sigma.expand_as(w)
            return self.module(x)

    return SN(conv)


class Conv2dBlock(nn.Module):
    """Reference blocks.py:49-147 semantics."""

    def __init__(self, cin, cout, k, stride=1, padding=0, norm="none",
                 activation="lrelu", pad_type="zero", bias=True):
        super().__init__()
        self.pad_type = pad_type
        self.padding = padding
        use_sn = norm == "spectral" or norm.startswith("spectral_")
        post = norm.replace("spectral_", "") if norm.startswith("spectral_") \
            else ("none" if norm == "spectral" else norm)
        conv_bias = bias if use_sn else (bias if post != "batch" else False)
        conv = nn.Conv2d(cin, cout, k, stride, bias=conv_bias)
        self.conv = spectral(conv) if use_sn else conv
        self.norm = nn.BatchNorm2d(cout) if post == "batch" else None
        self.activation = activation

    def forward(self, x):
        if self.padding:
            p = [self.padding] * 4
            mode = {"zero": "constant", "reflect": "reflect",
                    "replicate": "replicate"}[self.pad_type]
            x = F.pad(x, p, mode=mode)
        x = self.conv(x)
        if self.norm is not None:
            x = self.norm(x)
        if self.activation == "lrelu":
            x = F.leaky_relu(x, 0.2)
        elif self.activation == "relu":
            x = F.relu(x)
        elif self.activation == "tanh":
            x = torch.tanh(x)
        return x


class Bottleneck(nn.Module):
    def __init__(self, cin, planes, stride=1, dilation=1, down=False):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, dilation, dilation,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = None
        if down:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )

    def forward(self, x):
        r = x
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        if self.downsample is not None:
            r = self.downsample(x)
        return F.relu(y + r)


class Encoder(nn.Module):
    """ResNet os8 with 1 block per stage (layers (1,1,1,1))."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = nn.Sequential(Bottleneck(64, 64, 1, 1, True))
        self.layer2 = nn.Sequential(Bottleneck(256, 128, 2, 1, True))
        self.layer3 = nn.Sequential(Bottleneck(512, 256, 1, 2, True))
        self.layer4 = nn.Sequential(Bottleneck(1024, 512, 1, 4, True))

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        low = x
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        return x, low


class DADADepth(nn.Module):
    def __init__(self, target=32):
        super().__init__()
        self.target = target
        self.enc4_1 = Conv2dBlock(2048, 512, 1, 1, 0, bias=False,
                                  norm="batch", pad_type="reflect")
        self.enc4_2 = Conv2dBlock(512, 512, 3, 1, 1, bias=False,
                                  norm="batch", pad_type="reflect")
        self.enc4_3 = Conv2dBlock(512, 128, 1, 1, 0, bias=False,
                                  norm="batch", pad_type="reflect")
        self.dec4 = Conv2dBlock(128, 2048, 1, 1, 0, bias=True, norm="none")
        self.upsample = nn.Sequential(
            nn.Identity(),
            Conv2dBlock(128, 32, 3, 1, 1, bias=False, norm="batch",
                        pad_type="reflect"),
            nn.Conv2d(32, 1, 1),
        )

    def forward(self, z):
        y = self.enc4_3(self.enc4_2(self.enc4_1(z)))
        z_depth = self.dec4(y)
        y = F.interpolate(y, scale_factor=2, mode="nearest")
        y = self.upsample[2](self.upsample[1](y))
        d = torch.mean(y, dim=1, keepdim=True)
        if d.shape[-1] != self.target:
            d = F.interpolate(d, size=(384, 384), mode="bicubic",
                              align_corners=False)
            d = F.interpolate(d, (self.target, self.target), mode="nearest")
        return d, z_depth


class ConvBN(nn.Module):
    def __init__(self, cin, cout, ks=3, padding=1, dilation=1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, ks, 1, padding, dilation, bias=True)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return self.bn(self.conv(x))  # no relu (reference quirk)


class SegDecoder(nn.Module):
    def __init__(self, n_classes=11, target=32):
        super().__init__()
        self.target = target

        class ASPP(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = ConvBN(2048, 256, 1, 0)
                self.conv2 = ConvBN(2048, 256, 3, 6, 6)
                self.conv3 = ConvBN(2048, 256, 3, 12, 12)
                self.conv4 = ConvBN(2048, 256, 3, 18, 18)
                self.conv_out = ConvBN(1024, 256, 1, 0)

            def forward(self, x):
                f = torch.cat([self.conv1(x), self.conv2(x), self.conv3(x),
                               self.conv4(x)], 1)
                return self.conv_out(f)

        class Dec(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv_low = ConvBN(256, 48, 1, 0)
                self.conv_cat = nn.Sequential(
                    ConvBN(304, 256, 3, 1), ConvBN(256, 256, 3, 1)
                )
                self.conv_out = nn.Conv2d(256, n_classes, 1, bias=False)

            def forward(self, low, aspp):
                low = self.conv_low(low)
                up = F.interpolate(aspp, low.shape[-2:], mode="bilinear",
                                   align_corners=True)
                y = self.conv_cat(torch.cat([low, up], 1))
                return self.conv_out(y)

        self.aspp = ASPP()
        self.decoder = Dec()

    def forward(self, z, z_depth):
        z_high, z_low = z
        if z_depth is not None:
            z_high = z_high * z_depth
        s = self.decoder(z_low, self.aspp(z_high))
        return F.interpolate(s, (self.target, self.target), mode="bilinear",
                             align_corners=True)


class MaskBase(nn.Module):
    """BaseDecoder(norm=spectral) with low-level feats, n_res=1, 3 ups."""

    def __init__(self, proj_dim=16, n_res=1):
        super().__init__()
        self.proj_conv = Conv2dBlock(2048, proj_dim, 1, 1, 0,
                                     norm="spectral", activation="lrelu")
        self.low_level_conv = Conv2dBlock(256, proj_dim, 3, 1, 1,
                                          norm="spectral", activation="lrelu",
                                          pad_type="reflect")
        self.merge_feats_conv = Conv2dBlock(2 * proj_dim, proj_dim, 1, 1, 0,
                                            norm="spectral",
                                            activation="lrelu",
                                            pad_type="reflect")

        class ResBlock(nn.Module):
            def __init__(self, dim):
                super().__init__()
                self.model = nn.Sequential(
                    Conv2dBlock(dim, dim, 3, 1, 1, norm="spectral",
                                activation="lrelu", pad_type="reflect"),
                    Conv2dBlock(dim, dim, 3, 1, 1, norm="spectral",
                                activation="none", pad_type="reflect"),
                )

            def forward(self, x):
                return x + self.model(x)

        class ResBlocks(nn.Module):
            def __init__(self, n, dim):
                super().__init__()
                self.model = nn.Sequential(*[ResBlock(dim) for _ in range(n)])

            def forward(self, x):
                return self.model(x)

        dims = [proj_dim, proj_dim // 2, proj_dim // 4]
        ups = []
        for d in dims:
            ups += [nn.Identity(),
                    Conv2dBlock(d, d // 2, 3, 1, 1, norm="spectral",
                                activation="lrelu", pad_type="reflect")]
        self.model = nn.Sequential(
            ResBlocks(n_res, proj_dim), *ups,
            Conv2dBlock(proj_dim // 8, 1, 3, 1, 1, norm="none",
                        activation="none", pad_type="reflect"),
        )

    def forward(self, z):
        z, low = z
        low = self.low_level_conv(low)
        low = F.interpolate(low, z.shape[-2:], mode="bilinear")
        z = self.proj_conv(z)
        z = self.merge_feats_conv(torch.cat([low, z], 1))
        y = self.model[0](z)
        i = 1
        while i < len(self.model) - 1:
            y = F.interpolate(y, scale_factor=2, mode="nearest")
            y = self.model[i + 1](y)
            i += 2
        return self.model[-1](y)


class SPADE(nn.Module):
    def __init__(self, norm_nc, cond_nc=3):
        super().__init__()
        self.param_free_norm = nn.InstanceNorm2d(norm_nc, affine=False)
        self.mlp_shared = nn.Sequential(
            nn.Conv2d(cond_nc, 128, 3, padding=1), nn.ReLU()
        )
        self.mlp_gamma = nn.Conv2d(128, norm_nc, 3, padding=1)
        self.mlp_beta = nn.Conv2d(128, norm_nc, 3, padding=1)

    def forward(self, x, seg):
        n = self.param_free_norm(x)
        seg = F.interpolate(seg, size=x.shape[-2:], mode="nearest")
        a = self.mlp_shared(seg)
        return n * (1 + self.mlp_gamma(a)) + self.mlp_beta(a)


class SRB(nn.Module):
    def __init__(self, fin, fout, cond_nc=3):
        super().__init__()
        fmid = min(fin, fout)
        self.learned_shortcut = fin != fout
        self.conv_0 = spectral(nn.Conv2d(fin, fmid, 3, padding=1))
        self.conv_1 = spectral(nn.Conv2d(fmid, fout, 3, padding=1))
        self.norm_0 = SPADE(fin, cond_nc)
        self.norm_1 = SPADE(fmid, cond_nc)
        if self.learned_shortcut:
            self.conv_s = spectral(nn.Conv2d(fin, fout, 1, bias=False))
            self.norm_s = SPADE(fin, cond_nc)

    def forward(self, x, seg):
        xs = x
        if self.learned_shortcut:
            xs = self.conv_s(self.norm_s(x, seg))
        dx = self.conv_0(F.leaky_relu(self.norm_0(x, seg), 0.2))
        dx = self.conv_1(F.leaky_relu(self.norm_1(dx, seg), 0.2))
        return xs + dx


class Painter(nn.Module):
    def __init__(self, latent=32, n_up=5):
        super().__init__()
        self.latent = latent
        self.n_up = n_up
        self.fc = nn.Conv2d(3, latent, 3, padding=1)
        self.head_0 = SRB(latent, latent)
        self.G_middle_0 = SRB(latent, latent)
        self.G_middle_1 = SRB(latent, latent)
        self.up_spades = nn.Sequential(*[
            SRB(latent // 2 ** i, latent // 2 ** (i + 1))
            for i in range(n_up - 2)
        ])
        final_nc = latent // 2 ** (n_up - 2)
        self.final_spade = SRB(final_nc, final_nc)
        self.conv_img = nn.Conv2d(final_nc, 3, 3, padding=1)

    def forward(self, z, cond):
        if z is None:
            zh = cond.shape[-2] // 2 ** self.n_up
            zw = cond.shape[-1] // 2 ** self.n_up
            z = self.fc(F.interpolate(cond, size=(zh, zw)))
        up = lambda t: F.interpolate(t, scale_factor=2, mode="nearest")  # noqa
        y = up(self.head_0(z, cond))
        y = up(self.G_middle_0(y, cond))
        y = self.G_middle_1(y, cond)
        for srb in self.up_spades:
            y = srb(up(y), cond)
        y = self.final_spade(y, cond)
        return torch.tanh(self.conv_img(F.leaky_relu(y, 0.2)))


class TorchRefG(nn.Module):
    """Full tiny reference-G twin with reference state-dict keys."""

    def __init__(self, feat_target=32):
        super().__init__()
        self.encoder = Encoder()
        self.decoders = nn.ModuleDict({
            "d": DADADepth(target=feat_target),
            "s": SegDecoder(target=feat_target),
            "m": MaskBase(),
        })
        self.painter = Painter()

    @torch.no_grad()
    def infer_masker(self, x):
        z = self.encoder(x)
        d, z_depth = self.decoders["d"](z[0])
        s = self.decoders["s"](z, z_depth)
        m = torch.sigmoid(self.decoders["m"](z))
        return d, s, m

    @torch.no_grad()
    def paint(self, m, x):
        fake = self.painter(None, x * (1.0 - m))
        return x * (1.0 - m) + fake * m

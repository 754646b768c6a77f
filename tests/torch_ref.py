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
                # reference quirk: conv_out keeps ConvBNReLU's default
                # padding=1 on a 1x1 conv (deeplab_v3.py:90), emitting H+2
                self.conv_out = ConvBN(1024, 256, 1, 1)

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
        # reference quirk (deeplab_v3.py:257): decoder(aspp_out, z_low) —
        # conv_low runs on ASPP features, z_low is resized to the ASPP grid
        s = self.decoder(self.aspp(z_high), z_low)
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


# ---------------------------------------------------------------------------
# torchvision-format replicas for weight-loader round-trip tests.
# VGG19: torchvision vgg19().features layout (conv indices 0,2,5,...,28).
# Inception: pytorch-fid's FID InceptionV3 trunk to pool3 (reference
# fid.py:22-331) — torchvision inception_v3 with the FID pooling patches
# (avg pools are count_include_pad=False; Mixed_7c uses max pool).
# ---------------------------------------------------------------------------


def vgg19_features_torch():
    """nn.Sequential with torchvision vgg19 'features' indices/keys."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers, cin = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(cin, v, 3, padding=1), nn.ReLU(False)]
            cin = v
    return nn.Sequential(*layers)


class Vgg19SlicesTorch(nn.Module):
    """pix2pixHD slice outputs (reference losses.py:304-337): ends after
    features[1], [6], [11], [20], [29]."""

    def __init__(self):
        super().__init__()
        self.features = vgg19_features_torch()
        self.marks = [2, 7, 12, 21, 30]

    def forward(self, x):
        outs, start = [], 0
        for end in self.marks:
            for i in range(start, end):
                x = self.features[i](x)
            outs.append(x)
            start = end
        return outs


class _IConvBN(nn.Module):
    def __init__(self, cin, cout, ks, stride=1, padding=0):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, ks, stride, padding, bias=False)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avgp(x):  # FID patch: count_include_pad=False
    return F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)


class _IncA(nn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = _IConvBN(cin, 64, 1)
        self.branch5x5_1 = _IConvBN(cin, 48, 1)
        self.branch5x5_2 = _IConvBN(48, 64, 5, padding=2)
        self.branch3x3dbl_1 = _IConvBN(cin, 64, 1)
        self.branch3x3dbl_2 = _IConvBN(64, 96, 3, padding=1)
        self.branch3x3dbl_3 = _IConvBN(96, 96, 3, padding=1)
        self.branch_pool = _IConvBN(cin, pool_features, 1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(_avgp(x)),
        ], 1)


class _IncB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = _IConvBN(cin, 384, 3, stride=2)
        self.branch3x3dbl_1 = _IConvBN(cin, 64, 1)
        self.branch3x3dbl_2 = _IConvBN(64, 96, 3, padding=1)
        self.branch3x3dbl_3 = _IConvBN(96, 96, 3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, 2),
        ], 1)


class _IncC(nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = _IConvBN(cin, 192, 1)
        self.branch7x7_1 = _IConvBN(cin, c7, 1)
        self.branch7x7_2 = _IConvBN(c7, c7, (1, 7), padding=(0, 3))
        self.branch7x7_3 = _IConvBN(c7, 192, (7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = _IConvBN(cin, c7, 1)
        self.branch7x7dbl_2 = _IConvBN(c7, c7, (7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = _IConvBN(c7, c7, (1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = _IConvBN(c7, c7, (7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = _IConvBN(c7, 192, (1, 7), padding=(0, 3))
        self.branch_pool = _IConvBN(cin, 192, 1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        return torch.cat([
            self.branch1x1(x), b7, bd, self.branch_pool(_avgp(x))], 1)


class _IncD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = _IConvBN(cin, 192, 1)
        self.branch3x3_2 = _IConvBN(192, 320, 3, stride=2)
        self.branch7x7x3_1 = _IConvBN(cin, 192, 1)
        self.branch7x7x3_2 = _IConvBN(192, 192, (1, 7), padding=(0, 3))
        self.branch7x7x3_3 = _IConvBN(192, 192, (7, 1), padding=(3, 0))
        self.branch7x7x3_4 = _IConvBN(192, 192, 3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
                self.branch7x7x3_1(x)))),
            F.max_pool2d(x, 3, 2),
        ], 1)


class _IncE(nn.Module):
    def __init__(self, cin, pool="avg"):
        super().__init__()
        self.pool = pool
        self.branch1x1 = _IConvBN(cin, 320, 1)
        self.branch3x3_1 = _IConvBN(cin, 384, 1)
        self.branch3x3_2a = _IConvBN(384, 384, (1, 3), padding=(0, 1))
        self.branch3x3_2b = _IConvBN(384, 384, (3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = _IConvBN(cin, 448, 1)
        self.branch3x3dbl_2 = _IConvBN(448, 384, 3, padding=1)
        self.branch3x3dbl_3a = _IConvBN(384, 384, (1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = _IConvBN(384, 384, (3, 1), padding=(1, 0))
        self.branch_pool = _IConvBN(cin, 192, 1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = (_avgp(x) if self.pool == "avg"
              else F.max_pool2d(x, 3, 1, 1))
        return torch.cat([
            self.branch1x1(x), b3, bd, self.branch_pool(bp)], 1)


class FIDInceptionTorch(nn.Module):
    """pytorch-fid InceptionV3 trunk to the 2048-d pool3 features, with
    torchvision state-dict keys (Conv2d_1a_3x3..., Mixed_7c...)."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = _IConvBN(3, 32, 3, stride=2)
        self.Conv2d_2a_3x3 = _IConvBN(32, 32, 3)
        self.Conv2d_2b_3x3 = _IConvBN(32, 64, 3, padding=1)
        self.Conv2d_3b_1x1 = _IConvBN(64, 80, 1)
        self.Conv2d_4a_3x3 = _IConvBN(80, 192, 3)
        self.Mixed_5b = _IncA(192, 32)
        self.Mixed_5c = _IncA(256, 64)
        self.Mixed_5d = _IncA(288, 64)
        self.Mixed_6a = _IncB(288)
        self.Mixed_6b = _IncC(768, 128)
        self.Mixed_6c = _IncC(768, 160)
        self.Mixed_6d = _IncC(768, 160)
        self.Mixed_6e = _IncC(768, 192)
        self.Mixed_7a = _IncD(768)
        self.Mixed_7b = _IncE(1280, pool="avg")
        self.Mixed_7c = _IncE(2048, pool="max")

    def forward(self, x):
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, 2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, 2)
        for blk in (self.Mixed_5b, self.Mixed_5c, self.Mixed_5d,
                    self.Mixed_6a, self.Mixed_6b, self.Mixed_6c,
                    self.Mixed_6d, self.Mixed_6e, self.Mixed_7a,
                    self.Mixed_7b, self.Mixed_7c):
            x = blk(x)
        return x.mean(dim=(2, 3))

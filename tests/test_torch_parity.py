"""Numerical parity vs PyTorch for the core blocks + the weight converter.

Builds small torch modules with the reference's exact layer semantics and
state-dict layouts (conv.module.weight_bar for spectral norm, etc.),
converts the weights with utils/convert.py, and checks flax outputs match
torch outputs in eval mode. This is the golden-value layer SURVEY.md §7
step 2/3 calls for.
"""
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from climategan_tpu.models.blocks import Conv2dBlock, SPADEResnetBlock
from climategan_tpu.models.norms import SNConv
from climategan_tpu.models.resnet import Bottleneck
from climategan_tpu.utils.convert import (
    VariableTree,
    assign_any_conv,
    assign_bn,
    assign_bottleneck,
    assign_plain_conv,
    assign_spade_resblock,
    conv_w,
)

torch.manual_seed(0)


def nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2).float()


def nhwc(t):
    return t.detach().permute(0, 2, 3, 1).numpy()


# ---------------------------------------------------------------------------
# torch twins with reference semantics (own implementations, eval-mode)
# ---------------------------------------------------------------------------


class TorchSpectralConv(tnn.Module):
    """SpectralNorm(Conv2d) with the reference's power-iteration forward
    (norms.py:84-143): state dict keys module.weight_bar/_u/_v."""

    def __init__(self, cin, cout, k, stride=1, bias=True):
        super().__init__()
        self.module = tnn.Conv2d(cin, cout, k, stride, bias=bias)
        w = self.module.weight
        height = w.shape[0]
        width = w.view(height, -1).shape[1]
        u = tnn.Parameter(torch.randn(height), requires_grad=False)
        v = tnn.Parameter(torch.randn(width), requires_grad=False)
        u.data = u / (u.norm() + 1e-12)
        v.data = v / (v.norm() + 1e-12)
        w_bar = tnn.Parameter(w.data)
        del self.module._parameters["weight"]
        self.module.register_parameter("weight_u", u)
        self.module.register_parameter("weight_v", v)
        self.module.register_parameter("weight_bar", w_bar)

    def forward(self, x):
        u = self.module.weight_u
        v = self.module.weight_v
        w = self.module.weight_bar
        height = w.shape[0]
        wm = w.view(height, -1)
        v = wm.t().mv(u)
        v = v / (v.norm() + 1e-12)
        u2 = wm.mv(v)
        u2 = u2 / (u2.norm() + 1e-12)
        sigma = u2.dot(wm.mv(v))
        self.module.weight = w / sigma.expand_as(w)
        return self.module(x)


def test_spectral_conv_parity():
    tm = TorchSpectralConv(8, 16, 3)
    x = np.random.RandomState(0).randn(2, 10, 10, 8).astype(np.float32)

    m = SNConv(16, (3, 3), spectral=True, use_bias=True)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    vt = VariableTree(variables)
    sd = {f"c.{k}": v for k, v in tm.state_dict().items()}
    assign_any_conv(vt, (), sd, "c")
    variables = vt.result()

    got = np.asarray(m.apply(variables, jnp.asarray(x)))
    want = nhwc(tm(nchw(x)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_conv2dblock_batch_lrelu_reflect_parity():
    class TorchBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            self.pad = tnn.ReflectionPad2d(1)
            self.conv = tnn.Conv2d(4, 8, 3, 1, bias=False)
            self.norm = tnn.BatchNorm2d(8)
            self.act = tnn.LeakyReLU(0.2)

        def forward(self, x):
            return self.act(self.norm(self.conv(self.pad(x))))

    tm = TorchBlock().eval()
    with torch.no_grad():
        tm.norm.running_mean.normal_()
        tm.norm.running_var.uniform_(0.5, 2.0)
        tm.norm.weight.normal_()
        tm.norm.bias.normal_()

    x = np.random.RandomState(1).randn(2, 6, 6, 4).astype(np.float32)
    m = Conv2dBlock(8, 3, 1, 1, norm="batch", activation="lrelu",
                    pad_type="reflect", bias=False)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    vt = VariableTree(variables)
    sd = {f"b.{k}": v for k, v in tm.state_dict().items()}
    assign_plain_conv(vt, ("conv",), sd, "b.conv")
    assign_bn(vt, ("norm",), sd, "b.norm")
    variables = vt.result()

    got = np.asarray(m.apply(variables, jnp.asarray(x)))
    want = nhwc(tm(nchw(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bottleneck_parity():
    class TorchBottleneck(tnn.Module):
        def __init__(self, cin, planes, stride, dilation, down):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride, dilation,
                                    dilation, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.downsample = None
            if down:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                    tnn.BatchNorm2d(planes * 4),
                )

        def forward(self, x):
            r = x
            y = tF.relu(self.bn1(self.conv1(x)))
            y = tF.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            if self.downsample is not None:
                r = self.downsample(x)
            return tF.relu(y + r)

    tm = TorchBottleneck(8, 4, 2, 2, True).eval()
    with torch.no_grad():
        for bn in (tm.bn1, tm.bn2, tm.bn3, tm.downsample[1]):
            bn.running_mean.normal_(0, 0.1)
            bn.running_var.uniform_(0.5, 2.0)
            bn.weight.normal_(1.0, 0.1)
            bn.bias.normal_(0, 0.1)

    x = np.random.RandomState(2).randn(1, 8, 8, 8).astype(np.float32)
    m = Bottleneck(planes=4, stride=2, dilation=2, has_downsample=True)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    vt = VariableTree(variables)
    sd = {f"l.{k}": v for k, v in tm.state_dict().items()}
    assign_bottleneck(vt, (), sd, "l", has_down=True)
    variables = vt.result()

    got = np.asarray(m.apply(variables, jnp.asarray(x)))
    want = nhwc(tm(nchw(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert not vt.unassigned(), vt.unassigned()


class TorchSPADE(tnn.Module):
    """reference norms.py:146-186, instance param-free norm."""

    def __init__(self, norm_nc, cond_nc, ks=3):
        super().__init__()
        self.param_free_norm = tnn.InstanceNorm2d(norm_nc, affine=False)
        pw = ks // 2
        self.mlp_shared = tnn.Sequential(
            tnn.Conv2d(cond_nc, 128, ks, padding=pw), tnn.ReLU()
        )
        self.mlp_gamma = tnn.Conv2d(128, norm_nc, ks, padding=pw)
        self.mlp_beta = tnn.Conv2d(128, norm_nc, ks, padding=pw)

    def forward(self, x, segmap):
        normalized = self.param_free_norm(x)
        segmap = tF.interpolate(segmap, size=x.size()[2:], mode="nearest")
        actv = self.mlp_shared(segmap)
        return normalized * (1 + self.mlp_gamma(actv)) + self.mlp_beta(actv)


class TorchSRB(tnn.Module):
    """reference blocks.py:325-398 with spectral norm."""

    def __init__(self, fin, fout, cond_nc):
        super().__init__()
        fmiddle = min(fin, fout)
        self.learned_shortcut = fin != fout
        self.conv_0 = TorchSpectralConv(fin, fmiddle, 3)
        self.conv_1 = TorchSpectralConv(fmiddle, fout, 3)
        if self.learned_shortcut:
            self.conv_s = TorchSpectralConv(fin, fout, 1, bias=False)
            self.norm_s = TorchSPADE(fin, cond_nc)
        self.norm_0 = TorchSPADE(fin, cond_nc)
        self.norm_1 = TorchSPADE(fmiddle, cond_nc)

    def forward(self, x, seg):
        def pad1(v):
            return tF.pad(v, (1, 1, 1, 1))

        x_s = x
        if self.learned_shortcut:
            x_s = self.conv_s(self.norm_s(x, seg))
        dx = self.conv_0(pad1(tF.leaky_relu(self.norm_0(x, seg), 0.2)))
        dx = self.conv_1(pad1(tF.leaky_relu(self.norm_1(dx, seg), 0.2)))
        return x_s + dx


def test_spade_resnet_block_parity():
    tm = TorchSRB(12, 6, 3).eval()
    x = np.random.RandomState(3).randn(2, 8, 8, 12).astype(np.float32)
    seg = np.random.RandomState(4).randn(2, 32, 32, 3).astype(np.float32)

    m = SPADEResnetBlock(fin=12, fout=6, cond_nc=3, use_spectral_norm=True,
                         param_free_norm="instance")
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(seg))
    vt = VariableTree(variables)
    sd = {f"s.{k}": v for k, v in tm.state_dict().items()}
    assign_spade_resblock(vt, (), sd, "s", learned_shortcut=True,
                          param_free_norm="instance")
    variables = vt.result()
    assert not vt.unassigned(), vt.unassigned()

    got = np.asarray(m.apply(variables, jnp.asarray(x), jnp.asarray(seg)))
    want = nhwc(tm(nchw(x), nchw(seg)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)

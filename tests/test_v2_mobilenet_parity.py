"""Parity for the legacy/alternate masker architectures vs the REAL
reference modules: DeepLabv2 encoder + seg decoder (reference
deeplab/resnetmulti_v2.py, deeplab_v2.py) and the MobileNet seg head
(deeplab_v3.py:13-30), each through its runtime state-dict converter —
round-3 widening of the v3/resnet full-pipeline proof."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from climategan_tpu.utils.convert import (
    VariableTree,
    convert_mobilenet_seg_head,
    convert_resnetmulti_v2,
    convert_v2_seg_decoder,
)

from tests.reference_import import AddictDict, ref


def nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def nhwc(t):
    return t.detach().permute(0, 2, 3, 1).numpy()


def _jitter_bn(model):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.3)
                if m.weight is not None:
                    m.weight.normal_(1.0, 0.05)
                    m.bias.normal_(0, 0.05)


def _wrap_seg(variables):
    """Address a bare decoder's variables as generator's seg_decoder."""
    return {c: {"seg_decoder": t} for c, t in variables.items()}


def _unwrap_seg(variables):
    return {c: t["seg_decoder"] for c, t in variables.items()}


def test_resnetmulti_v2_encoder_parity():
    """v2 encoder (tiny layers (1,1,1,1), n_res=1) forward parity through
    convert_resnetmulti_v2."""
    from climategan_tpu.models.deeplab_v2 import ResNetMultiV2

    rv2 = ref("deeplab.resnetmulti_v2")
    torch.manual_seed(0)
    tm = rv2.ResNetMulti((1, 1, 1, 1), n_res=1).eval()
    _jitter_bn(tm)
    sd = {f"encoder.model.{k}": v for k, v in tm.state_dict().items()}

    enc = ResNetMultiV2(layers=(1, 1, 1, 1), n_res=1)
    x = np.random.RandomState(0).uniform(-1, 1, (1, 65, 65, 3)) \
        .astype(np.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    vt = VariableTree({c: {"encoder": t} for c, t in variables.items()})
    convert_resnetmulti_v2(vt, sd, layers=(1, 1, 1, 1), n_res=1)
    variables = {c: t["encoder"] for c, t in vt.result().items()}

    z_j = enc.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        z_t = tm(nchw(x))
    np.testing.assert_allclose(np.asarray(z_j), nhwc(z_t),
                               rtol=2e-3, atol=2e-3)


def test_v2_seg_decoder_parity():
    """DeepLabV2Decoder forward parity (ASPP os16 table + GAP branch +
    dropout head) through convert_v2_seg_decoder at full channel widths."""
    from climategan_tpu.models.deeplab_v2 import DeepLabV2Decoder

    rd = ref("deeplab.deeplab_v2")
    opts = AddictDict({
        "tasks": ["d", "s", "m"],
        "gen": {"s": {"use_dada": True, "upsample_featuremaps": False,
                      "output_dim": 11}},
        "data": {"transforms": [
            {"name": "resize", "new_size": {"default": 64, "s": 32, "d": 32}}
        ]},
    })
    torch.manual_seed(1)
    tm = rd.DeepLabV2Decoder(opts, no_init=True).eval()
    _jitter_bn(tm)
    sd = {f"decoders.s.{k}": v for k, v in tm.state_dict().items()}

    dec = DeepLabV2Decoder(num_classes=11, use_dada=True,
                           upsample_featuremaps=False, target_size=(32, 32))
    rs = np.random.RandomState(1)
    z = rs.uniform(-1, 1, (1, 8, 8, 2048)).astype(np.float32)
    zd = rs.uniform(-1, 1, (1, 8, 8, 2048)).astype(np.float32)
    variables = dec.init(jax.random.PRNGKey(0), jnp.asarray(z),
                         jnp.asarray(zd))
    vt = VariableTree(_wrap_seg(variables))
    convert_v2_seg_decoder(vt, sd)
    variables = _unwrap_seg(vt.result())

    s_j = dec.apply(variables, jnp.asarray(z), jnp.asarray(zd))
    with torch.no_grad():
        s_t = tm(nchw(z), nchw(zd))
    np.testing.assert_allclose(np.asarray(s_j), nhwc(s_t),
                               rtol=2e-3, atol=2e-3)


def test_mobilenet_seg_head_parity():
    """_DeepLabHead (two relu_first=False SeparableConv2d + classifier)
    forward parity through convert_mobilenet_seg_head."""
    from climategan_tpu.models.mobilenet import DeepLabHead

    rd3 = ref("deeplab.deeplab_v3")
    torch.manual_seed(2)
    tm = rd3._DeepLabHead(11, c4_channels=320).eval()
    _jitter_bn(tm)
    sd = {f"decoders.s.head.{k}": v for k, v in tm.state_dict().items()}

    head = DeepLabHead(nclass=11)
    rs = np.random.RandomState(2)
    z = rs.uniform(-1, 1, (1, 16, 16, 320)).astype(np.float32)
    variables = head.init(jax.random.PRNGKey(0), jnp.asarray(z))
    vt = VariableTree({c: {"seg_decoder": {"head": t}}
                       for c, t in variables.items()})
    convert_mobilenet_seg_head(vt, sd)
    variables = {c: t["seg_decoder"]["head"] for c, t in vt.result().items()}

    s_j = head.apply(variables, jnp.asarray(z))
    with torch.no_grad():
        s_t = tm(nchw(z))
    np.testing.assert_allclose(np.asarray(s_j), nhwc(s_t),
                               rtol=2e-3, atol=2e-3)

"""VGG19 / InceptionV3 weight-loader round trips (VERDICT r2 item 7).

Synthesize torchvision-format state dicts from local torch replicas
(tests/torch_ref.py: Vgg19SlicesTorch, FIDInceptionTorch — the pytorch-fid
architecture the reference vendors in fid.py:22-331 / losses.py:304-350),
load them through utils/convert.load_vgg19_weights /
load_inception_weights, and assert forward parity. The first real weight
file then exercises a proven code path.
"""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from climategan_tpu.utils.convert import (
    load_inception_weights,
    load_vgg19_weights,
)

from tests.torch_ref import FIDInceptionTorch, Vgg19SlicesTorch


def _jitter_bn(model):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.3)
                m.weight.normal_(1.0, 0.05)
                m.bias.normal_(0, 0.05)


def test_vgg19_loader_roundtrip(tmp_path):
    from climategan_tpu.losses import VGG19Features

    torch.manual_seed(0)
    tm = Vgg19SlicesTorch().eval()
    # save with torchvision's key layout: vgg19().features.<idx>.weight
    path = tmp_path / "vgg19.pth"
    torch.save(tm.state_dict(), str(path))

    model = VGG19Features()
    x = np.random.RandomState(0).uniform(-1, 1, (2, 64, 64, 3)) \
        .astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = load_vgg19_weights(str(path), variables)

    outs_j = model.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        outs_t = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    assert len(outs_j) == len(outs_t) == 5
    for i, (a, b) in enumerate(zip(outs_j, outs_t)):
        np.testing.assert_allclose(
            np.asarray(a), b.permute(0, 2, 3, 1).numpy(),
            rtol=1e-4, atol=1e-4, err_msg=f"slice {i}")


def test_inception_loader_roundtrip(tmp_path):
    from climategan_tpu.fid import InceptionV3Features

    torch.manual_seed(1)
    tm = FIDInceptionTorch().eval()
    _jitter_bn(tm)
    path = tmp_path / "pt_inception.pth"
    torch.save(tm.state_dict(), str(path))

    model = InceptionV3Features()
    x = np.random.RandomState(1).uniform(-1, 1, (1, 299, 299, 3)) \
        .astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = load_inception_weights(str(path), variables)

    feat_j = np.asarray(model.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        feat_t = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    assert feat_j.shape == feat_t.shape == (1, 2048)
    np.testing.assert_allclose(feat_j, feat_t, rtol=2e-3, atol=2e-3)

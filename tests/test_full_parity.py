"""Full-generator parity: torch reference twin -> convert_generator ->
flax OmniGenerator. Masker heads (depth/seg/mask) and the painter must
match torch eval-mode outputs from converted weights — the end-to-end proof
for SURVEY.md §7 step 3."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from climategan_tpu.models.generator import GenConfig, OmniGenerator
from climategan_tpu.utils.convert import convert_generator
from climategan_tpu.utils.testing import tiny_opts

from tests.torch_ref import TorchRefG


def _randomize_bn(model):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.3)
                if m.weight is not None:
                    m.weight.normal_(1.0, 0.05)
                    m.bias.normal_(0, 0.05)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    tm = TorchRefG(feat_target=32).eval()
    _randomize_bn(tm)

    opts = tiny_opts(image_size=64)
    cfg = GenConfig.from_opts(opts)
    G = OmniGenerator(cfg=cfg)
    x0 = jnp.zeros((1, 64, 64, 3))
    variables = G.init(jax.random.PRNGKey(0), x0)

    sd = tm.state_dict()
    converted = convert_generator(variables, sd, cfg)
    return tm, G, converted


def test_masker_heads_parity(pair):
    tm, G, variables = pair
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)

    d_t, s_t, m_t = tm.infer_masker(xt)
    d_j, s_j, m_j = G.apply(variables, jnp.asarray(x), method="infer_masker")

    np.testing.assert_allclose(
        np.asarray(d_j), d_t.permute(0, 2, 3, 1).numpy(),
        rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(s_j), s_t.permute(0, 2, 3, 1).numpy(),
        rtol=2e-3, atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(m_j), m_t.permute(0, 2, 3, 1).numpy(),
        rtol=2e-3, atol=2e-3)


def test_painter_parity(pair):
    tm, G, variables = pair
    rng = np.random.RandomState(1)
    x = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    m = (rng.rand(1, 64, 64, 1) > 0.5).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    mt = torch.from_numpy(m).permute(0, 3, 1, 2)

    painted_t = tm.paint(mt, xt)
    painted_j = G.apply(variables, jnp.asarray(m), jnp.asarray(x),
                        method="paint")
    np.testing.assert_allclose(
        np.asarray(painted_j), painted_t.permute(0, 2, 3, 1).numpy(),
        rtol=2e-3, atol=2e-3)

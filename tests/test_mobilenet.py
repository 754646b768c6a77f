"""MobileNetV2 backbone variant (reference deeplab/mobilenet_v3.py)."""
import jax
import jax.numpy as jnp

from climategan_tpu.models.generator import create_generator
from climategan_tpu.models.mobilenet import MobileNetV2Encoder
from climategan_tpu.utils.testing import tiny_opts


def test_mobilenet_encoder_shapes():
    m = MobileNetV2Encoder()
    x = jnp.ones((1, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    c4, c1 = m.apply(variables, x)
    # os16 high feats (320ch) upsampled x2 -> H/8; low-level 24ch at H/4
    assert c4.shape == (1, 8, 8, 320)
    assert c1.shape == (1, 16, 16, 24)


def test_generator_mobilenet_masker_forward():
    opts = tiny_opts(image_size=64)
    opts.gen.deeplabv3.backbone = "mobilenet"
    G = create_generator(opts)
    x = jnp.ones((1, 64, 64, 3))
    variables = G.init(jax.random.PRNGKey(0), x)
    d, s, mask = G.apply(variables, x, method="infer_masker")
    assert d.shape[0] == 1 and s.shape[-1] == 11
    assert mask.shape == (1, 64, 64, 1)

"""Shape/dtype tests per module (SURVEY.md §4: the unit layer the
reference lacks). Shapes are kept tiny — this host has one CPU core and
XLA compile time dominates; full-size parity runs in the TPU bench."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climategan_tpu.models.blocks import Conv2dBlock, SPADEResnetBlock
from climategan_tpu.models.deeplab import DeepLabV3Decoder
from climategan_tpu.models.depth import DADADepthDecoder
from climategan_tpu.models.masker import MaskBaseDecoder, MaskSpadeDecoder
from climategan_tpu.models.painter import PainterSpadeDecoder
from climategan_tpu.models.resnet import ResNetEncoder

KEY = jax.random.PRNGKey(0)


def test_conv2dblock_spectral_batch():
    x = jnp.ones((2, 16, 16, 8))
    m = Conv2dBlock(4, 3, 1, 1, norm="spectral_batch", activation="lrelu",
                    pad_type="reflect")
    variables = m.init(KEY, x)
    assert "spectral" in variables and "batch_stats" in variables
    y = m.apply(variables, x)
    assert y.shape == (2, 16, 16, 4)


def test_spade_resnet_block_shortcut():
    x = jnp.ones((1, 8, 8, 32))
    seg = jnp.ones((1, 64, 64, 3))
    m = SPADEResnetBlock(fin=32, fout=16, cond_nc=3)
    variables = m.init(KEY, x, seg)
    y = m.apply(variables, x, seg)
    assert y.shape == (1, 8, 8, 16)


def test_resnet_encoder_feature_shapes():
    x = jnp.ones((1, 64, 64, 3))
    m = ResNetEncoder(layers=(1, 1, 1, 1))  # thin variant for test speed
    variables = m.init(KEY, x)
    z_high, z_low = m.apply(variables, x)
    assert z_high.shape == (1, 8, 8, 2048)  # H/8, 512*4 channels
    assert z_low.shape == (1, 16, 16, 256)  # H/4, 64*4 channels


def test_depth_decoder_dada():
    z = jnp.ones((1, 8, 8, 256))
    m = DADADepthDecoder(res_dim=256, mid_dim=64, target_size=16)
    variables = m.init(KEY, z)
    d, z_depth = m.apply(variables, z)
    assert d.shape == (1, 16, 16, 1)
    assert z_depth.shape == (1, 8, 8, 256)


def test_seg_decoder():
    z_high = jnp.ones((1, 8, 8, 64))
    z_low = jnp.ones((1, 16, 16, 32))
    z_depth = jnp.ones((1, 8, 8, 64))
    m = DeepLabV3Decoder(num_classes=11, target_size=(32, 32))
    variables = m.init(KEY, (z_high, z_low), z_depth)
    s = m.apply(variables, (z_high, z_low), z_depth)
    assert s.shape == (1, 32, 32, 11)


def test_mask_base_decoder_upsamples_8x():
    z_high = jnp.ones((1, 8, 8, 128))
    z_low = jnp.ones((1, 16, 16, 32))
    m = MaskBaseDecoder(input_dim=128, proj_dim=16, low_level_feats_dim=32)
    variables = m.init(KEY, (z_high, z_low))
    y = m.apply(variables, (z_high, z_low))
    assert y.shape == (1, 64, 64, 1)


def test_mask_spade_decoder():
    z_high = jnp.ones((1, 8, 8, 128))
    z_low = jnp.ones((1, 16, 16, 32))
    cond = jnp.ones((1, 16, 16, 15))
    m = MaskSpadeDecoder(latent_dim=32, proj_dim=16, input_dims=(128, 32))
    variables = m.init(KEY, (z_high, z_low), cond)
    y = m.apply(variables, (z_high, z_low), cond)
    assert y.shape == (1, 64, 64, 1)


def test_painter_no_z():
    cond = jnp.ones((1, 128, 128, 3))
    m = PainterSpadeDecoder(latent_dim=32)
    variables = m.init(KEY, None, cond)
    y = m.apply(variables, None, cond)
    assert y.shape == (1, 128, 128, 3)
    assert np.all(np.abs(np.asarray(y)) <= 1.0)  # tanh range

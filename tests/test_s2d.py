"""Exactness of the space-to-depth conv rewrites (ops/s2d.py) against the
plain stride-1 conv path, and of the s2d painter tail end-to-end."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climategan_tpu.ops.s2d import (
    conv_pack_s2d,
    conv_s2d,
    depth_to_space,
    instance_norm_s2d,
    space_to_depth,
    upsample2x_s2d,
)


def plain_conv(x, k, stride=1):
    pad = (k.shape[0] // 2, k.shape[1] // 2)
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), [(pad[0], pad[0]), (pad[1], pad[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def test_s2d_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 10, 5).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(depth_to_space(space_to_depth(x))),
                                  np.asarray(x))


def test_upsample2x_s2d():
    from climategan_tpu.ops.interpolate import upsample_nearest

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 6, 6, 3).astype(np.float32))
    want = space_to_depth(upsample_nearest(x, 2, 2))
    got = upsample2x_s2d(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("kh", [1, 3])
def test_conv_s2d_exact(kh):
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 12, 16, 6).astype(np.float32))
    k = jnp.asarray(rng.randn(kh, kh, 6, 5).astype(np.float32))
    b = jnp.asarray(rng.randn(5).astype(np.float32))
    want = space_to_depth(plain_conv(x, k) + b)
    got = conv_s2d(space_to_depth(x), k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_conv_pack_s2d_exact():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 12, 16, 7).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 7, 4).astype(np.float32))
    b = jnp.asarray(rng.randn(4).astype(np.float32))
    want = space_to_depth(plain_conv(x, k) + b)
    got = conv_pack_s2d(x, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("o", [4, 40, 80, 160])
def test_conv_pack_s2d_phase_regimes(o, monkeypatch):
    """The OPT-IN phase decomposition (ops/s2d.PACK_DECOMP) picks one of
    three exact forms by an MXU cost model keyed on the output width
    (ops/s2d._phase_outputs): 4*O in one lane tile -> single 4x4 kernel;
    small O -> two 4x3 phase-pair convs; wide O -> four asymmetric-pad
    3x3 convs. Sweep O across all regime boundaries and check each
    against the plain conv, for both the single and the gamma/beta pair
    form. (Default path: single 4x4 kernel — measured faster end-to-end;
    covered by test_conv_pack_s2d_exact and the parity suites.)"""
    from climategan_tpu import ops
    from climategan_tpu.ops.s2d import conv_pack_s2d_pair

    monkeypatch.setattr(ops.s2d, "PACK_DECOMP", True)
    rng = np.random.RandomState(o)
    x = jnp.asarray(rng.randn(1, 8, 12, 5).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 5, o).astype(np.float32))
    b = jnp.asarray(rng.randn(o).astype(np.float32))
    want = space_to_depth(plain_conv(x, k) + b)
    got = conv_pack_s2d(x, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    kg = jnp.asarray(rng.randn(3, 3, 5, o // 2).astype(np.float32))
    kb = jnp.asarray(rng.randn(3, 3, 5, o // 2).astype(np.float32))
    bg = jnp.asarray(rng.randn(o // 2).astype(np.float32))
    bb = jnp.asarray(rng.randn(o // 2).astype(np.float32))
    gamma, beta = conv_pack_s2d_pair(x, kg, kb, bg, bb)
    np.testing.assert_allclose(
        np.asarray(gamma), np.asarray(space_to_depth(plain_conv(x, kg) + bg)),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(beta), np.asarray(space_to_depth(plain_conv(x, kb) + bb)),
        rtol=1e-5, atol=1e-5)


def test_instance_norm_s2d_exact():
    from climategan_tpu.models.norms import _instance_norm

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 16, 16, 6).astype(np.float32))
    want = space_to_depth(_instance_norm(x))
    got = instance_norm_s2d(space_to_depth(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_painter_s2d_tail_matches_plain():
    """Full painter forward: s2d tail vs plain path on identical params
    (f32, tight tolerance)."""
    from climategan_tpu.models.painter import PainterSpadeDecoder

    kw = dict(latent_dim=16, spade_n_up=3, spade_use_spectral_norm=True,
              spade_param_free_norm="instance", use_final_shortcut=False)
    plain = PainterSpadeDecoder(s2d_tail=False, **kw)
    packed = PainterSpadeDecoder(s2d_tail=True, **kw)

    rng = np.random.RandomState(5)
    cond = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    variables = plain.init(jax.random.PRNGKey(0), None, cond)

    want = plain.apply(variables, None, cond)
    got = packed.apply(variables, None, cond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_flagship_painter_uses_s2d():
    """Regression guard: the default (flagship) config must route the
    painter tail through the s2d path (tpu.painter_s2d defaults on)."""
    from climategan_tpu.models.generator import GenConfig
    from climategan_tpu.utils.opts import load_opts

    cfg = GenConfig.from_opts(load_opts())
    assert cfg.p_s2d_tail
    assert cfg.p_spade_param_free_norm == "instance"
    assert not cfg.p_use_final_shortcut
    assert cfg.p_spade_n_up >= 3

    off = load_opts(commandline_opts=["tpu.painter_s2d=false"])
    assert not GenConfig.from_opts(off).p_s2d_tail


def test_conv3x3_reflect_border_fix_exact():
    """norms._conv3x3_reflect == conv over a reflect-padded tensor,
    including corners."""
    from climategan_tpu.models.norms import _conv3x3_reflect

    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(2, 10, 14, 5).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 5, 7).astype(np.float32))
    b = jnp.asarray(rng.randn(7).astype(np.float32))

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    want = jax.lax.conv_general_dilated(
        xp, w, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    got = _conv3x3_reflect(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_dot_1x1_opt_in_exact(monkeypatch):
    """The opt-in CLIMATEGAN_DOT_1X1 rewrite (1x1 stride-1 convs as
    reshaped matmuls — measured faster in isolation but an end-to-end
    regression, see BENCH_NOTES "Round 5") is exact in both places it
    gates: ops/s2d.conv_s2d and models/norms.SNConv."""
    from climategan_tpu import ops
    from climategan_tpu.models import norms
    from climategan_tpu.models.norms import SNConv

    rng = np.random.RandomState(7)

    # conv_s2d with a 1x1 kernel: dot form vs default conv form.
    x = jnp.asarray(rng.randn(2, 6, 8, 6).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 1, 6, 5).astype(np.float32))
    b = jnp.asarray(rng.randn(5).astype(np.float32))
    want = conv_s2d(space_to_depth(x), k, b)
    monkeypatch.setattr(ops.s2d, "DOT_1X1", True)
    got = conv_s2d(space_to_depth(x), k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # SNConv 1x1 stride-1 unpadded: dot form vs default conv form.
    mod = SNConv(features=5, kernel_size=(1, 1))
    xs = jnp.asarray(rng.randn(2, 6, 8, 6).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), xs)
    want = mod.apply(variables, xs)
    monkeypatch.setattr(norms, "DOT_1X1", True)
    got = mod.apply(variables, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

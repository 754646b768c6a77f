"""Parity tests for the fused Pallas SPADE conditioning kernel.

The kernel (ops/pallas/spade.py) must match the plain XLA formulation of
the SPADE mlp path (reference climategan/norms.py:146-186): shared 3x3
zero-pad conv + ReLU, then gamma/beta 3x3 zero-pad convs. Runs in
interpreter mode on CPU — the same kernel code path as on TPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climategan_tpu.ops.pallas.spade import spade_cond


def _xla_ref(seg, k1, b1, kg, bg, kb, bb):
    dn = ("NHWC", "HWIO", "NHWC")
    actv = jax.lax.conv_general_dilated(
        seg, k1, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)
    actv = jax.nn.relu(actv + b1)
    gamma = jax.lax.conv_general_dilated(
        actv, kg, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn) + bg
    beta = jax.lax.conv_general_dilated(
        actv, kb, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn) + bb
    return gamma, beta


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32) * 0.3


def test_single_branch_matches_xla():
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    N, H, W, cnc, hid, nc = 2, 32, 48, 3, 16, 8
    seg = _rand(ks[0], (N, H, W, cnc))
    k1, b1 = _rand(ks[1], (3, 3, cnc, hid)), _rand(ks[2], (hid,))
    kg, bg = _rand(ks[3], (3, 3, hid, nc)), _rand(ks[4], (nc,))
    kb, bb = _rand(ks[5], (3, 3, hid, nc)), _rand(ks[6], (nc,))

    out = spade_cond(seg, k1, b1, [(kg, bg, kb, bb)], interpret=True)
    assert out is not None and len(out) == 1
    gamma_ref, beta_ref = _xla_ref(seg, k1, b1, kg, bg, kb, bb)
    np.testing.assert_allclose(np.asarray(out[0][..., :nc]),
                               np.asarray(gamma_ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out[0][..., nc:]),
                               np.asarray(beta_ref), rtol=2e-5, atol=2e-5)


def test_dual_branch_shared_slices():
    """Two branches with concatenated mlp_shared convs (the dual_spade
    layout): branch b must read exactly its slice of the shared
    activation."""
    ks = jax.random.split(jax.random.PRNGKey(1), 16)
    N, H, W, cnc = 1, 16, 32, 3
    hids, ncs = (16, 8), (4, 4)
    k1 = _rand(ks[0], (3, 3, cnc, sum(hids)))
    b1 = _rand(ks[1], (sum(hids),))
    seg = _rand(ks[2], (N, H, W, cnc))
    brs, refs = [], []
    off = 0
    for bi, (hid, nc) in enumerate(zip(hids, ncs)):
        kg, bg = _rand(ks[3 + 4 * bi], (3, 3, hid, nc)), _rand(
            ks[4 + 4 * bi], (nc,))
        kb, bb = _rand(ks[5 + 4 * bi], (3, 3, hid, nc)), _rand(
            ks[6 + 4 * bi], (nc,))
        brs.append((kg, bg, kb, bb))
        refs.append(_xla_ref(seg, k1[..., off:off + hid],
                             b1[off:off + hid], kg, bg, kb, bb))
        off += hid
    outs = spade_cond(seg, k1, b1, brs, interpret=True)
    assert outs is not None and len(outs) == 2
    for out, (gamma_ref, beta_ref), nc in zip(outs, refs, ncs):
        np.testing.assert_allclose(np.asarray(out[..., :nc]),
                                   np.asarray(gamma_ref),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(out[..., nc:]),
                                   np.asarray(beta_ref),
                                   rtol=2e-5, atol=2e-5)


def test_border_zero_padding_semantics():
    """Tiles at the image border must reproduce the XLA convs' zero
    padding: the shared conv pads the conditioning map with zeros and the
    gamma conv pads the *activation* with zeros (NOT relu(b1))."""
    ks = jax.random.split(jax.random.PRNGKey(2), 8)
    N, H, W, cnc, hid, nc = 1, 8, 8, 2, 8, 4  # single tile = all border
    seg = _rand(ks[0], (N, H, W, cnc))
    k1 = _rand(ks[1], (3, 3, cnc, hid))
    b1 = jnp.full((hid,), 3.0)  # large bias => relu(b1) != 0 outside
    kg, bg = _rand(ks[3], (3, 3, hid, nc)), _rand(ks[4], (nc,))
    kb, bb = _rand(ks[5], (3, 3, hid, nc)), _rand(ks[6], (nc,))
    out = spade_cond(seg, k1, b1, [(kg, bg, kb, bb)], interpret=True)
    gamma_ref, beta_ref = _xla_ref(seg, k1, b1, kg, bg, kb, bb)
    np.testing.assert_allclose(np.asarray(out[0][..., :nc]),
                               np.asarray(gamma_ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out[0][..., nc:]),
                               np.asarray(beta_ref), rtol=2e-5, atol=2e-5)


def test_spade_module_pallas_path_matches_xla():
    """models/norms.SPADE + dual_spade s2d branches under the pallas
    switch must match their XLA paths bit-for-tolerance."""
    from flax import linen as nn

    from climategan_tpu.models import norms
    from climategan_tpu.ops.s2d import space_to_depth

    class Wrap(nn.Module):
        @nn.compact
        def __call__(self, x, seg):
            return norms.SPADE("instance", 3, x.shape[-1] // 4, 3,
                               nhidden=16, name="sp")(x, seg, s2d=True)

    rng = jax.random.PRNGKey(3)
    x_full = jax.random.normal(rng, (2, 32, 32, 8), jnp.float32)
    x = space_to_depth(x_full)
    seg = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 16, 3))
    m = Wrap()
    v = m.init(rng, x, seg)
    base = m.apply(v, x, seg)
    with norms.pallas_spade():
        fused = m.apply(v, x, seg)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               rtol=2e-5, atol=2e-5)


def test_dual_spade_pallas_path_matches_xla():
    from flax import linen as nn

    from climategan_tpu.models import norms
    from climategan_tpu.ops.s2d import space_to_depth

    class Wrap(nn.Module):
        @nn.compact
        def __call__(self, x, seg):
            pa = norms.SPADEParamSet(3, x.shape[-1] // 4, 3, nhidden=16,
                                     name="norm_s")()
            pb = norms.SPADEParamSet(3, x.shape[-1] // 4, 3, nhidden=16,
                                     name="norm_0")()
            return norms.dual_spade(x, seg, pa, pb, x.shape[-1] // 4, 3,
                                    s2d=True)

    rng = jax.random.PRNGKey(5)
    x = space_to_depth(jax.random.normal(rng, (2, 32, 32, 8), jnp.float32))
    seg = jax.random.normal(jax.random.PRNGKey(6), (2, 16, 16, 3))
    m = Wrap()
    v = m.init(rng, x, seg)
    base_a, base_b = m.apply(v, x, seg)
    with norms.pallas_spade():
        fused_a, fused_b = m.apply(v, x, seg)
    np.testing.assert_allclose(np.asarray(fused_a), np.asarray(base_a),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fused_b), np.asarray(base_b),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="compiled-TPU kernel path needs a real TPU")
def test_flagship_shape_compiled_on_tpu():
    """ADVICE r3: the compiled (non-interpret) TPU path — pltpu.roll
    semantics, async DMA windows, the hid % 128 lane-alignment guard — at
    the flagship painter shape (nhidden=128), vs the XLA reference.
    Gated on a real TPU backend; CI covers the same kernel code in
    interpreter mode above."""
    ks = jax.random.split(jax.random.PRNGKey(7), 8)
    N, H, W, cnc, hid, nc = 1, 40, 40, 3, 128, 640
    seg = _rand(ks[0], (N, H, W, cnc))
    k1, b1 = _rand(ks[1], (3, 3, cnc, hid)), _rand(ks[2], (hid,))
    kg, bg = _rand(ks[3], (3, 3, hid, nc)), _rand(ks[4], (nc,))
    kb, bb = _rand(ks[5], (3, 3, hid, nc)), _rand(ks[6], (nc,))

    out = spade_cond(seg, k1, b1, [(kg, bg, kb, bb)], interpret=False)
    gamma_ref, beta_ref = _xla_ref(seg, k1, b1, kg, bg, kb, bb)
    np.testing.assert_allclose(np.asarray(out[0][..., :nc]),
                               np.asarray(gamma_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out[0][..., nc:]),
                               np.asarray(beta_ref), rtol=2e-4, atol=2e-4)

"""Event compositing tests: jnp reference path vs fused Pallas kernels
(interpreter mode on CPU), plus torch-semantics golden checks."""
import jax
import jax.numpy as jnp
import numpy as np

from climategan_tpu.events.fire import add_fire, increase_sky_mask
from climategan_tpu.events.smog import add_smog
from climategan_tpu.ops.pallas.events import masked_blend

KEY = jax.random.PRNGKey(0)


def _img(n=1, h=128, w=128, c=3, seed=0):
    return jax.random.uniform(
        jax.random.PRNGKey(seed), (n, h, w, c), minval=-1.0, maxval=1.0
    )


def test_smog_pallas_matches_jnp():
    x = _img()
    d = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 1),
                           minval=0.01, maxval=1.0)
    a = add_smog(x, d, use_pallas=False)
    b = add_smog(x, d, use_pallas=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_fire_pallas_matches_jnp():
    x = _img(seed=2)
    seg = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 32, 11))
    a = add_fire(x, seg, KEY, kernel_size=31, kernel_sigma=15.0,
                 use_pallas=False)
    b = add_fire(x, seg, KEY, kernel_size=31, kernel_sigma=15.0,
                 use_pallas=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-3)


def test_fire_output_range():
    x = _img(seed=4)
    seg = jax.random.normal(jax.random.PRNGKey(5), (1, 32, 32, 11))
    out = np.asarray(add_fire(x, seg, KEY, kernel_size=31, kernel_sigma=15.0))
    assert out.min() >= 0.0 and out.max() <= 255.0
    # range-pinning dummy pixels (reference fire.py:123-126)
    assert np.all(out[:, 0, 0, :] == 255.0)
    assert np.all(out[:, -1, -1, :] == 0.0)


def test_smog_output_range():
    x = _img(seed=6)
    d = jax.random.uniform(jax.random.PRNGKey(7), (1, 32, 32, 1),
                           minval=0.01, maxval=1.0)
    out = np.asarray(add_smog(x, d))
    assert out.min() >= -0.01 and out.max() <= 1.01


def test_increase_sky_mask_equals_reference_shift_loop():
    """The max-pool dilation must equal the reference's shift-accumulate
    loop (fire.py:15-47)."""
    rng = np.random.RandomState(0)
    mask = (rng.rand(1, 24, 24, 1) > 0.9).astype(np.float32)

    def reference_dilate(m, p_w, p_h):
        n_lines = int(p_h * m.shape[1])
        n_cols = int(p_w * m.shape[2])
        temp = m.copy()
        for i in range(1, n_cols):
            temp[:, :, i:, :] += m[:, :, :-i, :]
            temp[:, :, :-i, :] += m[:, :, i:, :]
        new = temp.copy()
        for i in range(1, n_lines):
            new[:, i:, :, :] += temp[:, :-i, :, :]
            new[:, :-i, :, :] += temp[:, i:, :, :]
        new[new >= 1] = 1
        return new

    got = np.asarray(increase_sky_mask(jnp.asarray(mask), 0.18, 0.18))
    want = reference_dilate(mask, 0.18, 0.18)
    np.testing.assert_allclose(got, want)


def test_masked_blend():
    x = _img(seed=8)
    fake = _img(seed=9)
    m = jax.random.uniform(jax.random.PRNGKey(10), (1, 128, 128, 1))
    got = np.asarray(masked_blend(x, fake, m))
    want = np.asarray(x * (1 - m) + fake * m)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

"""FID stack: Inception feature shapes, sqrtm stability, FID sanity."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from climategan_tpu.fid import (
    FIDEvaluator,
    _sqrtm_newton_schulz,
    activation_statistics,
    compute_fid_from_features,
    frechet_distance,
)


def test_sqrtm_newton_schulz():
    rng = np.random.RandomState(0)
    A = rng.randn(16, 16)
    S = A @ A.T + 16 * np.eye(16)  # SPD
    R = _sqrtm_newton_schulz(S)
    np.testing.assert_allclose(R @ R, S, rtol=1e-4, atol=1e-5)


def test_frechet_distance_properties():
    rng = np.random.RandomState(1)
    f1 = rng.randn(200, 8)
    f2 = rng.randn(200, 8) + 2.0
    m1, s1 = activation_statistics(f1)
    m2, s2 = activation_statistics(f2)
    assert frechet_distance(m1, s1, m1, s1) < 1e-4
    d = frechet_distance(m1, s1, m2, s2)
    assert d > 1.0  # shifted distribution is far
    assert compute_fid_from_features(f1, f1.copy()) < 1e-4


def test_inception_features_and_fid():
    ev = FIDEvaluator(rng=jax.random.PRNGKey(0), batch_size=4)
    rng = jax.random.PRNGKey(1)
    real = jax.random.uniform(rng, (4, 64, 64, 3), minval=-1, maxval=1)
    feats = ev.features(real)
    assert feats.shape == (4, 2048)
    ev.set_real(real)
    fake = jax.random.uniform(jax.random.PRNGKey(2), (4, 64, 64, 3),
                              minval=-1, maxval=1)
    fid = ev.fid(fake)
    assert np.isfinite(fid)

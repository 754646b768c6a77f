"""FID evaluation in pure JAX (reference climategan/fid.py, a vendored
pytorch-fid).

Components:
  * InceptionV3 feature extractor (torchvision inception_v3 architecture,
    pool3 2048-d features) in flax/NHWC. FID-calibrated weights load via
    utils/convert.load_inception_weights when a torch checkpoint is
    available (none ships in this offline environment; random-init FID is
    only meaningful for relative comparisons and is flagged as such).
  * activation statistics + Frechet distance with a TPU-friendly matrix
    sqrt: Newton-Schulz iterations in float64 on (sigma1 @ sigma2)
    (replaces scipy.linalg.sqrtm, reference fid.py:437-516).
  * compute_val_fid analog (reference fid.py:334-434): real stats cached
    from the val rf images once; fakes painted by the generator.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class ConvBN(nn.Module):
    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         name="bn")(x)
        return nn.relu(x)


def _pool(x, ks, st, pad=((0, 0), (0, 0)), kind="max"):
    """max / avg pooling; avg divides by the true window size at borders
    (count_include_pad=False), matching pytorch-fid's patched Inception
    blocks (reference fid.py:22-331 vendors FIDInception{A,C,E})."""
    padding = ((0, 0),) + tuple(pad) + ((0, 0),)
    if kind == "max":
        return jax.lax.reduce_window(
            x, -float("inf"), jax.lax.max,
            (1, ks, ks, 1), (1, st, st, 1), padding,
        )
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, ks, ks, 1), (1, st, st, 1), padding
    )
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, ks, ks, 1), (1, st, st, 1), padding
    )
    return s / cnt


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1), name="branch1x1")(x)
        b5 = ConvBN(48, (1, 1), name="branch5x5_1")(x)
        b5 = ConvBN(64, (5, 5), padding=((2, 2), (2, 2)), name="branch5x5_2")(b5)
        b3 = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = ConvBN(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(b3)
        b3 = ConvBN(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_3")(b3)
        bp = _pool(x, 3, 1, ((1, 1), (1, 1)), "avg")
        bp = ConvBN(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(bd)
        bd = ConvBN(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = _pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = ConvBN(192, (1, 1), name="branch1x1")(x)
        b7 = ConvBN(c7, (1, 1), name="branch7x7_1")(x)
        b7 = ConvBN(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7_3")(b7)
        bd = ConvBN(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = ConvBN(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_2")(bd)
        bd = ConvBN(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_3")(bd)
        bd = ConvBN(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_4")(bd)
        bd = ConvBN(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_5")(bd)
        bp = _pool(x, 3, 1, ((1, 1), (1, 1)), "avg")
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(192, (1, 1), name="branch3x3_1")(x)
        b3 = ConvBN(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = ConvBN(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = ConvBN(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = ConvBN(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = _pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    # pytorch-fid: Mixed_7b uses border-corrected avg pool (E_1), Mixed_7c
    # uses max pool (E_2)
    pool_kind: str = "avg"

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(320, (1, 1), name="branch1x1")(x)
        b3 = ConvBN(384, (1, 1), name="branch3x3_1")(x)
        b3a = ConvBN(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3)
        b3b = ConvBN(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = ConvBN(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(384, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(bd)
        bda = ConvBN(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd)
        bdb = ConvBN(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = _pool(x, 3, 1, ((1, 1), (1, 1)), self.pool_kind)
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """torchvision inception_v3 trunk to pool3 (2048-d), NHWC.

    Input: [-1, 1] RGB at 299x299 (callers resize with the exact-torch
    bilinear matmul resize, mirroring pytorch-fid's resize_input).
    """

    @nn.compact
    def __call__(self, x):
        x = ConvBN(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = ConvBN(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = ConvBN(64, (3, 3), padding=((1, 1), (1, 1)), name="Conv2d_2b_3x3")(x)
        x = _pool(x, 3, 2)
        x = ConvBN(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = ConvBN(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _pool(x, 3, 2)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(pool_kind="max", name="Mixed_7c")(x)
        # global average pool -> (N, 2048)
        return jnp.mean(x, axis=(1, 2))


def init_inception(rng):
    model = InceptionV3Features()
    return model, model.init(rng, jnp.zeros((1, 299, 299, 3)))


# ---------------------------------------------------------------------------
# statistics + Frechet distance
# ---------------------------------------------------------------------------


def activation_statistics(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) of (N, D) activations (reference fid.py:437-460)."""
    feats = np.asarray(feats, np.float64)
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def _sqrtm_newton_schulz(A: np.ndarray, iters: int = 30) -> np.ndarray:
    """Matrix square root via Newton-Schulz (float64, host numpy).

    Stable replacement for scipy.linalg.sqrtm on the (possibly slightly
    non-symmetric) product sigma1 @ sigma2.
    """
    A = np.asarray(A, np.float64)
    n = A.shape[0]
    normA = np.linalg.norm(A, "fro")
    if normA < 1e-12:
        return np.zeros_like(A)
    Y = A / normA
    Z = np.eye(n)
    I = np.eye(n)
    for _ in range(iters):
        T = 0.5 * (3.0 * I - Z @ Y)
        Y = Y @ T
        Z = T @ Z
    return Y * np.sqrt(normA)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """FID between two Gaussians (reference fid.py:461-516)."""
    mu1, mu2 = np.asarray(mu1), np.asarray(mu2)
    sigma1, sigma2 = np.asarray(sigma1), np.asarray(sigma2)
    diff = mu1 - mu2

    offset = np.eye(sigma1.shape[0]) * eps
    covmean = _sqrtm_newton_schulz((sigma1 + offset) @ (sigma2 + offset))
    tr_covmean = np.trace(covmean)
    return float(
        diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2.0 * tr_covmean
    )


def compute_fid_from_features(real_feats, fake_feats) -> float:
    m1, s1 = activation_statistics(real_feats)
    m2, s2 = activation_statistics(fake_feats)
    return frechet_distance(m1, s1, m2, s2)


class FIDEvaluator:
    """Painter FID on val rf images (reference fid.py:334-434 semantics):
    real stats cached once; fakes = G.paint(m, x)."""

    def __init__(self, rng=None, variables=None, batch_size: int = 50):
        self.model = InceptionV3Features()
        if variables is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            variables = self.model.init(rng, jnp.zeros((1, 299, 299, 3)))
        self.variables = variables
        self.batch_size = batch_size
        self._real_stats = None
        self._features = jax.jit(
            lambda v, x: self.model.apply(v, x)
        )

    def features(self, images: jax.Array) -> np.ndarray:
        """images: NHWC in [-1, 1], any (H, W); resized to 299."""
        from climategan_tpu.ops.interpolate import resize

        out = []
        for i in range(0, images.shape[0], self.batch_size):
            chunk = images[i: i + self.batch_size]
            chunk = resize(chunk, (299, 299), mode="bilinear",
                           align_corners=False)
            out.append(np.asarray(self._features(self.variables, chunk)))
        return np.concatenate(out, axis=0)

    def set_real(self, images: jax.Array):
        self._real_stats = activation_statistics(self.features(images))

    def fid(self, fake_images: jax.Array) -> float:
        assert self._real_stats is not None, "call set_real first"
        m2, s2 = activation_statistics(self.features(fake_images))
        m1, s1 = self._real_stats
        return frechet_distance(m1, s1, m2, s2)

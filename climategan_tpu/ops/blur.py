"""Large-kernel Gaussian blur as two banded-Toeplitz matmuls (MXU).

The reference blurs the wildfire sky mask with a 281x281 Gaussian
(kornia filter2d, reflect border — reference climategan/fire.py:105-111).
A 281-tap 2-D convolution is bandwidth/ALU-hostile on TPU; but a separable
blur along each axis is a *linear operator*, so for static H, W we fold the
kernel (including reflect boundary handling) into two dense (H,H) / (W,W)
matrices built once on the host, and the blur becomes two systolic-array
matmuls — speed-of-light for 640-px images.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel_1d(kernel_size: int, sigma: float) -> np.ndarray:
    """Matches kornia get_gaussian_kernel1d: normalized gaussian over a
    centered window."""
    x = np.arange(kernel_size, dtype=np.float64) - (kernel_size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float64)


def _reflect_index(i: np.ndarray, n: int) -> np.ndarray:
    """torch/kornia 'reflect' (no edge repeat) index folding."""
    if n == 1:
        return np.zeros_like(i)
    period = 2 * (n - 1)
    i = np.abs(i) % period
    return np.where(i >= n, period - i, i)


@functools.lru_cache(maxsize=None)
def _blur_matrix(size: int, kernel_size: int, sigma: float) -> np.ndarray:
    """(size, size) operator: out = B @ in, reflect-padded gaussian."""
    k = gaussian_kernel_1d(kernel_size, sigma)
    r = (kernel_size - 1) // 2
    B = np.zeros((size, size), dtype=np.float64)
    taps = np.arange(kernel_size) - r
    for out_i in range(size):
        src = _reflect_index(out_i + taps, size)
        np.add.at(B[out_i], src, k)
    return B.astype(np.float32)


def gaussian_blur(x: jax.Array, kernel_size: int, sigma: float) -> jax.Array:
    """Separable reflect-border Gaussian blur of NHWC ``x`` via matmuls."""
    H, W = x.shape[1], x.shape[2]
    Bh = jnp.asarray(_blur_matrix(H, kernel_size, float(sigma)))
    Bw = jnp.asarray(_blur_matrix(W, kernel_size, float(sigma)))
    dtype = x.dtype
    y = x.astype(jnp.float32)
    y = jnp.einsum("hH,NHWC->NhWC", Bh, y, preferred_element_type=jnp.float32)
    y = jnp.einsum("wW,NHWC->NHwC", Bw, y, preferred_element_type=jnp.float32)
    return y.astype(dtype)


@functools.lru_cache(maxsize=None)
def _band_matrix(size: int, radius: int) -> np.ndarray:
    """(size, size) ones-band operator: out_i = sum(in[i-radius..i+radius])
    with zero boundary."""
    B = np.zeros((size, size), dtype=np.float32)
    for i in range(size):
        B[i, max(0, i - radius):min(size, i + radius + 1)] = 1.0
    return B


def box_dilate(mask: jax.Array, radius_h: int, radius_w: int) -> jax.Array:
    """Binary box dilation of an NHWC 0/1 mask with zero boundary.

    For a 0/1 mask, max over a (2r+1) box == (sum over the box > 0); the
    separable box sums run as two banded-Toeplitz matmuls on the MXU —
    the same trick as the blur above, replacing a (2r+1)^2-comparison
    reduce_window (52k ops/px at r=114, 640^2) with two systolic matmuls.
    """
    if radius_h <= 0 and radius_w <= 0:
        return mask
    H, W = mask.shape[1], mask.shape[2]
    y = mask.astype(jnp.float32)
    if radius_h > 0:
        Bh = jnp.asarray(_band_matrix(H, radius_h))
        y = jnp.einsum("hH,NHWC->NhWC", Bh, y,
                       preferred_element_type=jnp.float32)
    if radius_w > 0:
        Bw = jnp.asarray(_band_matrix(W, radius_w))
        y = jnp.einsum("wW,NHWC->NHwC", Bw, y,
                       preferred_element_type=jnp.float32)
    return (y > 0.0).astype(mask.dtype)

"""Interpolation as MXU matmuls.

TPU-native replacement for every ``F.interpolate`` in the reference
(bilinear align_corners True/False, bicubic, nearest — see reference
climategan/blocks.py:11-43, climategan/depth.py:142-153,
climategan/deeplab/deeplab_v3.py:262-264, climategan/trainer.py:1915-1919).

Design: a 1-D resize is a linear operator, so a 2-D separable resize is
``Y = A_h · X · A_wᵀ`` with small static matrices built on the host at trace
time. On TPU this runs on the 128×128 systolic array instead of the gather
units, keeps shapes static for XLA, and gives *exact* PyTorch semantics
(align_corners, half-pixel, cubic a=-0.75) that ``jax.image.resize`` does not
implement. Integer-ratio nearest resizes take cheap repeat/slice fast paths.

Layout: NHWC everywhere (TPU conv-native).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _source_positions(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Fractional source coordinates for each output index (torch semantics)."""
    i = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            return np.zeros(1, dtype=np.float64)
        return i * (in_size - 1) / (out_size - 1)
    scale = in_size / out_size
    return (i + 0.5) * scale - 0.5


@functools.lru_cache(maxsize=None)
def _linear_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) bilinear interpolation matrix, torch-exact."""
    src = _source_positions(in_size, out_size, align_corners)
    if not align_corners:
        src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    t = src - lo
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    np.add.at(mat, (rows, lo), (1.0 - t).astype(np.float32))
    np.add.at(mat, (rows, hi), t.astype(np.float32))
    return mat


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (Keys), a=-0.75 to match torch bicubic."""
    at = np.abs(t)
    at2, at3 = at * at, at * at * at
    w = np.where(
        at <= 1.0,
        (a + 2.0) * at3 - (a + 3.0) * at2 + 1.0,
        np.where(at < 2.0, a * at3 - 5.0 * a * at2 + 8.0 * a * at - 4.0 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=None)
def _cubic_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) bicubic matrix with edge replication, torch-exact."""
    src = _source_positions(in_size, out_size, align_corners)
    lo = np.floor(src).astype(np.int64)
    t = src - lo
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    for tap in (-1, 0, 1, 2):
        idx = np.clip(lo + tap, 0, in_size - 1)
        w = _cubic_kernel(t - tap)
        np.add.at(mat, (rows, idx), w)
    return mat.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _nearest_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) 0/1 selection matrix, torch 'nearest' (floor)."""
    src = np.floor(np.arange(out_size, dtype=np.float64) * in_size / out_size)
    src = np.clip(src.astype(np.int64), 0, in_size - 1)
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    mat[np.arange(out_size), src] = 1.0
    return mat


def _axis_matrix(in_size: int, out_size: int, mode: str, align_corners: bool):
    if mode == "bilinear":
        return _linear_matrix(in_size, out_size, align_corners)
    if mode == "bicubic":
        return _cubic_matrix(in_size, out_size, align_corners)
    if mode == "nearest":
        return _nearest_matrix(in_size, out_size)
    raise ValueError(f"Unsupported interpolation mode: {mode}")


def resize(x: jax.Array, size, mode: str = "bilinear", align_corners: bool = False):
    """Resize NHWC ``x`` to spatial ``size=(H, W)`` with torch semantics.

    Every mode lowers to two matmuls (MXU) except integer-ratio nearest,
    which lowers to repeat (upsample) or strided slice (downsample).
    """
    H, W = x.shape[1], x.shape[2]
    h, w = int(size[0]), int(size[1])
    if (H, W) == (h, w):
        return x

    if mode == "nearest":
        # Fast paths: integer scale factors avoid the matmul entirely.
        if h % H == 0 and w % W == 0:
            return upsample_nearest(x, h // H, w // W)
        if H % h == 0 and W % w == 0:
            # reshape + unit slice, NOT x[:, ::s, ::s]: XLA lowers the
            # strided spatial slice to gather+transpose on TPU (profiled
            # 2.5 ms at 640^2 b32; this form is a free slice+reshape)
            sh, sw = H // h, W // w
            N, _, _, C = x.shape
            return x.reshape(N, h, sh, w, sw, C)[:, :, 0, :, 0, :]

    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if h != H:
        A = jnp.asarray(_axis_matrix(H, h, mode, align_corners))
        # (h,H) x (N,H,W,C) over H
        xf = jnp.einsum("hH,NHWC->NhWC", A, xf, preferred_element_type=jnp.float32)
    if w != W:
        B = jnp.asarray(_axis_matrix(W, w, mode, align_corners))
        xf = jnp.einsum("wW,NHWC->NHwC", B, xf, preferred_element_type=jnp.float32)
    return xf.astype(dtype)


def upsample_nearest(x: jax.Array, fh: int = 2, fw: int | None = None) -> jax.Array:
    """Integer-factor nearest upsample (reference InterpolateNearest2d,
    climategan/blocks.py:11-43). Pure reshape/broadcast — no gather."""
    if fw is None:
        fw = fh
    N, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (N, H, fh, W, fw, C))
    return x.reshape(N, H * fh, W * fw, C)


def resize_like(x: jax.Array, ref: jax.Array, mode="bilinear", align_corners=False):
    return resize(x, (ref.shape[1], ref.shape[2]), mode, align_corners)

"""Elementwise image ops, NHWC jnp (reference: climategan/tutils.py).

These are the pure-math helpers the event compositing stack leans on:
min-max normalize (tutils.py:567-576), sRGB<->linear (tutils.py:534-564),
sky-mask extraction (tutils.py:579-596). All are jit-friendly and fuse into
the surrounding XLA graphs; the fully fused event kernels live in
ops/pallas/events.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(t: jax.Array, mini: float = 0.0, maxi: float = 1.0) -> jax.Array:
    """Per-sample min-max rescale to [mini, maxi] over all non-batch dims.

    Mirrors reference tutils.normalize: for 4-D input the min is subtracted
    first, then the (shifted) max divides — identical up to fp assoc.
    """
    if t.ndim == 3:
        lo = t.min()
        hi = t.max()
        return mini + (maxi - mini) * (t - lo) / (hi - lo)
    n = t.shape[0]
    flat = t.reshape(n, -1)
    lo = flat.min(axis=1).reshape((n,) + (1,) * (t.ndim - 1))
    t = t - lo
    hi = t.reshape(n, -1).max(axis=1).reshape((n,) + (1,) * (t.ndim - 1))
    t = t / hi
    return mini + (maxi - mini) * t


def srgb2lrgb(x: jax.Array) -> jax.Array:
    """sRGB -> linear RGB. Input any range (min-max normalized to [0,1] first,
    as the reference does — tutils.py:534-538)."""
    x = normalize(x)
    lin = ((x + 0.055) / 1.055) ** 2.4
    return jnp.where(x <= 0.04045, x / 12.92, lin)


def lrgb2srgb(x: jax.Array) -> jax.Array:
    """Linear RGB -> sRGB (tutils.py:541-564), vectorized over NHWC."""
    low = 12.92 * x
    high = 1.055 * jnp.power(jnp.maximum(x, 1e-12), 1.0 / 2.4) - 0.055
    return jnp.where(x <= 0.0031308, low, high)


def retrieve_sky_mask(seg: jax.Array, sky_idx: int = 9) -> jax.Array:
    """Binary sky mask from segmentation logits (N,H,W,C) or labels (N,H,W).

    Reference tutils.py:579-596 (sky class index 9).
    """
    if seg.ndim == 4:
        seg = jnp.argmax(seg, axis=-1)
    return seg == sky_idx


def uint8_to_unit_range(x: jax.Array) -> jax.Array:
    """[0,255] uint8 -> [-1,1] float input range."""
    return x.astype(jnp.float32) / 127.5 - 1.0


def unit_range_to_uint8(x: jax.Array) -> jax.Array:
    """Min-max normalize then quantize to uint8 (trainer.py:311-326)."""
    return (normalize(x) * 255.0).astype(jnp.uint8)

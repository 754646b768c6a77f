"""Perlin noise (jnp), used by paint_cloudy's synthetic cloud sky.

Re-design of reference climategan/tutils.py:647-694 (rand_perlin_2d,
mix_noise) as pure functions of an explicit PRNG key — static shapes,
no data-dependent control flow, jit/vmap friendly.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def _fade(t: jax.Array) -> jax.Array:
    return 6 * t ** 5 - 15 * t ** 4 + 10 * t ** 3


def rand_perlin_2d(
    key: jax.Array, shape: Tuple[int, int], res: Tuple[int, int]
) -> jax.Array:
    """(H, W) Perlin noise with gradient grid resolution ``res``.

    shape must be divisible by res (same constraint as the reference).
    """
    H, W = shape
    rh, rw = res
    d0, d1 = H // rh, W // rw

    gy = (jnp.arange(H, dtype=jnp.float32) * (rh / H)) % 1.0
    gx = (jnp.arange(W, dtype=jnp.float32) * (rw / W)) % 1.0
    grid_y = jnp.broadcast_to(gy[:, None], (H, W))
    grid_x = jnp.broadcast_to(gx[None, :], (H, W))

    angles = 2 * math.pi * jax.random.uniform(key, (rh + 1, rw + 1))
    gradients = jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=-1)

    def tile_grads(sy, sx):
        g = gradients[sy[0]:sy[1], sx[0]:sx[1]]
        g = jnp.repeat(g, d0, axis=0)
        g = jnp.repeat(g, d1, axis=1)
        return g[:H, :W]

    def dot(grad, shift):
        return (grid_y + shift[0]) * grad[..., 0] + (grid_x + shift[1]) * grad[..., 1]

    n00 = dot(tile_grads((0, -1), (0, -1)), (0.0, 0.0))
    n10 = dot(tile_grads((1, None), (0, -1)), (-1.0, 0.0))
    n01 = dot(tile_grads((0, -1), (1, None)), (0.0, -1.0))
    n11 = dot(tile_grads((1, None), (1, None)), (-1.0, -1.0))

    ty = _fade(grid_y)
    tx = _fade(grid_x)
    lerp = lambda a, b, t: a + t * (b - a)  # noqa: E731
    return math.sqrt(2.0) * lerp(lerp(n00, n10, ty), lerp(n01, n11, ty), tx)


def mix_noise(
    key: jax.Array,
    x: jax.Array,
    mask: jax.Array,
    res: Tuple[int, int] = (8, 3),
    weight: float = 0.1,
) -> jax.Array:
    """Blend Perlin noise into ``x`` (NHWC) where ``mask`` is 1.

    Reference tutils.py:689-694: noise is min-shifted (not max-scaled), the
    same noise field is shared across the batch.
    """
    noise = rand_perlin_2d(key, (x.shape[1], x.shape[2]), res)
    noise = noise - noise.min()
    noise = noise[None, :, :, None].astype(x.dtype)
    mask = mask.astype(x.dtype)
    if mask.ndim == 3:
        mask = mask[..., None]
    return mask * (weight * noise + (1 - weight) * x) + (1 - mask) * x

"""DiffAugment-style differentiable augmentations for the painter's
discriminator (reference climategan/transforms.py:494-626, adapted from
data-efficient-gans). NHWC, jit-friendly, randomness via explicit keys.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rand_brightness(key, x):
    r = jax.random.uniform(key, (x.shape[0], 1, 1, 1), dtype=x.dtype)
    return x + (r - 0.5)


def rand_saturation(key, x):
    r = jax.random.uniform(key, (x.shape[0], 1, 1, 1), dtype=x.dtype)
    mean = x.mean(axis=-1, keepdims=True)
    return (x - mean) * (r * 2.0) + mean


def rand_contrast(key, x):
    r = jax.random.uniform(key, (x.shape[0], 1, 1, 1), dtype=x.dtype)
    mean = x.mean(axis=(1, 2, 3), keepdims=True)
    return (x - mean) * (r + 0.5) + mean


def rand_translation(key, x, ratio: float = 0.125):
    """Random per-sample integer translation with zero padding
    (reference transforms.py:583-607)."""
    n, h, w, c = x.shape
    sh = int(h * ratio + 0.5)
    sw = int(w * ratio + 0.5)
    k1, k2 = jax.random.split(key)
    tx = jax.random.randint(k1, (n, 1, 1), -sh, sh + 1)
    ty = jax.random.randint(k2, (n, 1, 1), -sw, sw + 1)
    grid_b = jnp.arange(n)[:, None, None]
    grid_x = jnp.arange(h)[None, :, None]
    grid_y = jnp.arange(w)[None, None, :]
    gx = jnp.clip(grid_x + tx + 1, 0, h + 1)
    gy = jnp.clip(grid_y + ty + 1, 0, w + 1)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return xp[grid_b, gx, gy]


def rand_cutout(key, x, ratio: float = 0.5):
    """Random per-sample cutout (reference transforms.py:544-580)."""
    n, h, w, c = x.shape
    ch = int(h * ratio + 0.5)
    cw = int(w * ratio + 0.5)
    k1, k2 = jax.random.split(key)
    ox = jax.random.randint(k1, (n, 1, 1), 0, h + (1 - ch % 2))
    oy = jax.random.randint(k2, (n, 1, 1), 0, w + (1 - cw % 2))
    gx = jnp.arange(h)[None, :, None]
    gy = jnp.arange(w)[None, None, :]
    in_x = (gx >= ox - ch // 2) & (gx < ox - ch // 2 + ch)
    in_y = (gy >= oy - cw // 2) & (gy < oy - cw // 2 + cw)
    mask = 1.0 - (in_x & in_y).astype(x.dtype)
    return x * mask[..., None]


class DiffTransforms:
    """reference transforms.py:609-626."""

    def __init__(self, diff_aug_opts):
        self.do_color_jittering = bool(diff_aug_opts.get("do_color_jittering"))
        self.do_cutout = bool(diff_aug_opts.get("do_cutout"))
        self.do_translation = bool(diff_aug_opts.get("do_translation"))
        self.cutout_ratio = float(diff_aug_opts.get("cutout_ratio", 0.5))
        self.translation_ratio = float(
            diff_aug_opts.get("translation_ratio", 0.125)
        )

    def __call__(self, key, x):
        keys = jax.random.split(key, 5)
        if self.do_color_jittering:
            x = rand_brightness(keys[0], x)
            x = rand_contrast(keys[1], x)
            x = rand_saturation(keys[2], x)
        if self.do_translation:
            x = rand_translation(keys[3], x, self.translation_ratio)
        if self.do_cutout:
            x = rand_cutout(keys[4], x, self.cutout_ratio)
        return x

"""Wildfire event compositing (NHWC jnp).

Re-design of reference climategan/fire.py:68-127 (add_fire):
  1. min-max rescale to [0,255], warm color shift (+40R,-10G,-20B), quantize
  2. contrast x1.5 around the batch grayscale mean, brightness x0.73
     (torchvision semantics on uint8: truncating quantization after blends)
  3. sky mask from seg argmax==9, optional bottom-third crop, nearest resize
     to image size, box-dilation by 18% (fire.py:15-47 increase_sky_mask —
     here a single max-pool reduce_window instead of the O(n) shift loop)
  4. 281-tap Gaussian blur (here: two Toeplitz matmuls, ops/blur.py)
  5. paste a red-orange filter (G ~ U{100..150}) at transparency 200/255
  6. brightness x0.8, dummy range-pinning pixels
Output range [0, 255] float, like the reference.

The pure-elementwise stages run as fused Pallas kernels when enabled
(ops/pallas/events.py); the jnp path below is the always-available
reference implementation (XLA fuses it into a handful of kernels too).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from climategan_tpu.ops.blur import gaussian_blur
from climategan_tpu.ops.image import normalize, retrieve_sky_mask
from climategan_tpu.ops.interpolate import resize


def _quantize_u8(x: jax.Array) -> jax.Array:
    """torch `.to(torch.uint8)` semantics on [0,255]: truncate toward zero."""
    return jnp.floor(jnp.clip(x, 0.0, 255.0))


def _grayscale(x: jax.Array) -> jax.Array:
    """torchvision rgb_to_grayscale on uint8: weighted sum then truncation."""
    g = 0.2989 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
    return jnp.floor(g)


def _adjust_contrast(x: jax.Array, factor: float) -> jax.Array:
    mean = jnp.mean(_grayscale(x))
    return _quantize_u8(factor * x + (1.0 - factor) * mean)


def _adjust_brightness(x: jax.Array, factor: float) -> jax.Array:
    return _quantize_u8(factor * x)


def increase_sky_mask(mask: jax.Array, p_w: float, p_h: float) -> jax.Array:
    """Box-dilate a 0/1 NHWC mask by (p_h*H, p_w*W) in each direction.

    The reference's shift-accumulate loops (fire.py:15-47) OR the mask over
    offsets 1..n-1 in both directions per axis; that is exactly a max-pool
    with window (2n-1) — one reduce_window instead of ~230 shifted adds.
    """
    n_h = int(p_h * mask.shape[1])
    n_w = int(p_w * mask.shape[2])
    if n_h <= 0 and n_w <= 0:
        return mask
    # 0/1 mask: dilation == box-sum > 0, run as two banded matmuls on the
    # MXU (ops/blur.box_dilate) instead of a (2n-1)^2 reduce_window
    from climategan_tpu.ops.blur import box_dilate

    return box_dilate(mask, max(n_h - 1, 0), max(n_w - 1, 0))


def paste_tensor(source, filter_, mask, transparency: float):
    """reference fire.py:130-133."""
    m = (transparency / 255.0) * mask
    return m * filter_ + (1.0 - m) * source


def add_fire(
    x: jax.Array,
    seg_preds: jax.Array,
    rng: jax.Array,
    kernel_size: int = 281,
    kernel_sigma: float = 140.5,
    crop_bottom_sky_mask: bool = True,
    transparency: float = 200.0,
    use_pallas: bool | None = None,
) -> jax.Array:
    """Wildfire rendering. x: NHWC [-1,1]-ish, seg_preds: NHWC logits."""
    if use_pallas is None:
        use_pallas = x.shape[2] % 128 == 0

    wf = normalize(x, 0.0, 255.0)

    # warm shift (RGB channel order; reference indexes NCHW channels 0/1/2)
    shift = jnp.array([40.0, -10.0, -20.0], dtype=wf.dtype)
    wf = _quantize_u8(wf + shift)

    if use_pallas:
        from climategan_tpu.ops.pallas.events import fire_color_grade

        gray_mean = jnp.mean(_grayscale(wf))
        wf = fire_color_grade(wf, gray_mean, 1.5, 0.73)
    else:
        wf = _adjust_contrast(wf, 1.5)
        wf = _adjust_brightness(wf, 0.73)

    sky = retrieve_sky_mask(seg_preds).astype(jnp.float32)[..., None]
    if crop_bottom_sky_mask:
        i = 2 * sky.shape[1] // 3
        row = jnp.arange(sky.shape[1])[None, :, None, None]
        sky = jnp.where(row >= i, 0.0, sky)

    sky = resize(sky, (x.shape[1], x.shape[2]), mode="nearest")
    sky = increase_sky_mask(sky, 0.18, 0.18)
    sky = gaussian_blur(sky, kernel_size, kernel_sigma)

    g_value = jax.random.randint(rng, (), 100, 151).astype(wf.dtype)

    if use_pallas:
        from climategan_tpu.ops.pallas.events import fire_paste

        wf = fire_paste(wf, sky, g_value, transparency, 0.8)
    else:
        filter_ = jnp.stack(
            [
                jnp.full(wf.shape[:3], 255.0, wf.dtype),
                jnp.full(wf.shape[:3], 1.0, wf.dtype) * g_value,
                jnp.zeros(wf.shape[:3], wf.dtype),
            ],
            axis=-1,
        )
        wf = paste_tensor(wf, filter_, sky, transparency)
        wf = _adjust_brightness(_quantize_u8(wf), 0.8)

    # dummy pixels to pin the [0,255] range for downstream min-max scaling
    wf = wf.at[:, 0, 0, :].set(255.0)
    wf = wf.at[:, -1, -1, :].set(0.0)
    return wf

"""Smog event: HazeRD distance-scaled haze filter (NHWC jnp).

Re-design of reference climategan/trainer.py:1879-1938 (compute_smog):
transmission = exp(-(beta/vr) * d_norm); smog = t * linearRGB(x) +
(1 - t) * airlight; back to sRGB; yellow tint alpha/255.

TPU notes: the depth normalize -> invert -> normalize chain is elementwise
with *analytically known* second-stage bounds (after min-max to [0.3, 1],
1/d spans exactly [1, 10/3]), so the whole chain fuses; the upsample to
image size is an exact-torch bilinear (align_corners=True) matmul resize.
The elementwise tail runs as one fused Pallas kernel when enabled.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from climategan_tpu.ops.image import lrgb2srgb, normalize
from climategan_tpu.ops.interpolate import resize


def add_smog(
    x: jax.Array,
    d: jax.Array,
    airlight: float = 0.76,
    beta: float = 2.0,
    vr: float = 1.0,
    yellow_color=(224, 192, 29),
    alpha: float = 20.0,
    use_pallas: bool | None = None,
) -> jax.Array:
    """x: NHWC image, d: NHWC(1) raw depth prediction. Returns [0,1] sRGB."""
    x01 = normalize(x)

    dd = normalize(d, 0.3, 1.0)
    dd = 1.0 / dd
    dd = normalize(dd, 0.1, 1.0)

    dd = resize(dd, (x.shape[1], x.shape[2]), mode="bilinear", align_corners=True)

    b = beta / vr
    if use_pallas is None:
        use_pallas = x.shape[2] % 128 == 0
    if use_pallas:
        from climategan_tpu.ops.pallas.events import smog_tail

        return smog_tail(x01, dd, airlight, b, tuple(yellow_color), alpha)

    transmission = jnp.exp(dd * -b)
    lin = jnp.where(x01 <= 0.04045, x01 / 12.92, ((x01 + 0.055) / 1.055) ** 2.4)
    smogged = transmission * lin + (1.0 - transmission) * airlight
    smogged = lrgb2srgb(smogged)

    a = alpha / 255.0
    yellow = jnp.asarray(yellow_color, dtype=smogged.dtype) / 255.0
    return smogged * (1.0 - a) + yellow * a

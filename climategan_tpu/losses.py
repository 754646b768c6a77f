"""Losses (pure jnp functions + a Flax VGG19 for the perceptual loss).

Re-design of reference climategan/losses.py. Stateless/pure: randomness
(label flipping/smoothing) comes in through explicit PRNG keys; every loss
is jit/grad-safe with static shapes. Reference anchors:
  * GANLoss (losses.py:13-83) — LSGAN/BCE + one-sided label smoothing +
    label flipping
  * FeatMatchLoss (:86-103), CrossEntropy (:106-112), TVLoss (:142-169),
    MinentLoss v1/v2 (:172-196), SIMSE (:224-233), SIGMLoss (:237-278),
    Context/Reconstruction (:281-296), VGG19/VGGLoss (:304-350),
    GroundIntersection (:444-450), prob_2_entropy (:453-458),
    CustomBCELoss (:461-477), ADVENTAdversarialLoss (:480-524),
    HingeLoss (:550-593), DADADepthLoss (:596-620), get_losses (:353-441).
"""
from __future__ import annotations

import math
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from climategan_tpu.ops.interpolate import resize

Array = jax.Array

# --------------------------------------------------------------------------
# elementary criteria
# --------------------------------------------------------------------------


def mse_loss(pred: Array, target: Array) -> Array:
    return jnp.mean((pred - target) ** 2)


def l1_loss(pred: Array, target: Array) -> Array:
    return jnp.mean(jnp.abs(pred - target))


def bce_with_logits(logits: Array, target: Array) -> Array:
    """torch BCEWithLogitsLoss (mean reduction)."""
    neg_abs = -jnp.abs(logits)
    loss = jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(neg_abs))
    return jnp.mean(loss)


def cross_entropy(logits: Array, target: Array) -> Array:
    """torch CrossEntropyLoss over NHWC logits and NHW int targets."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, target[..., None].astype(jnp.int32), axis=-1)
    return -jnp.mean(picked)


# --------------------------------------------------------------------------
# GAN losses
# --------------------------------------------------------------------------


def _final_preds(pred) -> List[Array]:
    """Extract final-layer outputs from a (multiscale) discriminator result."""
    if isinstance(pred, (list, tuple)):
        return [p[-1] if isinstance(p, (list, tuple)) else p for p in pred]
    return [pred]


def gan_loss(
    pred,
    target_is_real: bool,
    rng: Optional[Array] = None,
    use_lsgan: bool = False,
    soft_shift: float = 0.0,
    flip_prob: float = 0.0,
    real_label: float = 1.0,
    fake_label: float = 0.0,
) -> Array:
    """LSGAN (MSE) or vanilla (BCE-with-logits) GAN loss with one-sided
    label smoothing and label flipping (reference losses.py:13-83).

    Deliberate divergences from the reference's sampling quirks: the
    reference re-toggles `target_is_real` inside its per-scale loop (so a
    triggered flip alternates across scales — losses.py:72-75) and draws a
    fresh soft-shift per scale; here one flip decision and one soft shift
    apply to all scales of the call, which is the evident intent."""
    preds = _final_preds(pred)
    target = real_label if target_is_real else fake_label

    soft = 0.0
    flip = jnp.array(False)
    if rng is not None and (soft_shift > 0 or flip_prob > 0):
        k1, k2 = jax.random.split(rng)
        soft = jax.random.uniform(k1, ()) * soft_shift
        flip = jax.random.uniform(k2, ()) < flip_prob

    total = 0.0
    for p in preds:
        t = jnp.where(
            flip,
            (fake_label + soft) if target_is_real else (real_label - soft),
            (real_label - soft) if target_is_real else (fake_label + soft),
        ).astype(jnp.float32)
        tgt = jnp.broadcast_to(t, p.shape)
        pf = p.astype(jnp.float32)
        total = total + (mse_loss(pf, tgt) if use_lsgan else bce_with_logits(pf, tgt))
    return total / len(preds)


def hinge_loss(pred, target_is_real: bool, for_discriminator: bool = True) -> Array:
    """SPADE hinge loss (reference losses.py:550-593)."""
    preds = _final_preds(pred)
    total = 0.0
    for p in preds:
        p = p.astype(jnp.float32)
        if for_discriminator:
            if target_is_real:
                total += -jnp.mean(jnp.minimum(p - 1.0, 0.0))
            else:
                total += -jnp.mean(jnp.minimum(-p - 1.0, 0.0))
        else:
            assert target_is_real, "generator hinge loss must aim for real"
            total += -jnp.mean(p)
    return total / len(preds)


def feat_match_loss(pred_real, pred_fake) -> Array:
    """pix2pixHD feature matching: L1 over all intermediate features,
    real side detached (reference losses.py:86-103)."""
    num_D = len(pred_fake)
    total = 0.0
    for i in range(num_D):
        for j in range(len(pred_fake[i]) - 1):
            real = jax.lax.stop_gradient(pred_real[i][j]).astype(jnp.float32)
            total += l1_loss(pred_fake[i][j].astype(jnp.float32), real) / num_D
    return total


# --------------------------------------------------------------------------
# task losses
# --------------------------------------------------------------------------


def tv_loss(x: Array) -> Array:
    """Total variation (reference losses.py:142-169), NHWC."""
    n, h, w, c = x.shape
    count_h = (h - 1) * w * c
    count_w = h * (w - 1) * c
    h_tv = jnp.sum((x[:, 1:, :, :] - x[:, :-1, :, :]) ** 2)
    w_tv = jnp.sum((x[:, :, 1:, :] - x[:, :, :-1, :]) ** 2)
    return 2.0 * (h_tv / count_h + w_tv / count_w) / n


def entropy_map(prob: Array) -> Array:
    """Weighted self-information map from probabilities; NHWC
    (reference prob_2_entropy, losses.py:453-458)."""
    c = prob.shape[-1]
    return -prob * jnp.log2(prob + 1e-30) / math.log2(c)


def minent_loss(prob: Array, version: int = 1, lambda_var: float = 0.1) -> Array:
    """Entropy minimization, v2 adds entropy-map variance
    (reference losses.py:172-196). prob: NHWC probabilities."""
    n, h, w, c = prob.shape
    ent = entropy_map(prob)
    if version == 1:
        return jnp.sum(ent) / (n * h * w)
    demean = ent - jnp.sum(ent) / (n * h * w)
    return jnp.sum(ent + lambda_var * demean * demean) / (n * h * w)


def simse_loss(pred: Array, target: Array) -> Array:
    d = pred - target
    return jnp.mean(d * d) - jnp.mean(d) ** 2


_SOBEL_X = jnp.array([[1.0, 0.0, -1.0], [2.0, 0.0, -2.0], [1.0, 0.0, -1.0]])
_SOBEL_Y = jnp.array([[1.0, 2.0, 1.0], [0.0, 0.0, 0.0], [-1.0, -2.0, -1.0]])


def _sobel(x: Array, k: Array) -> Array:
    """valid 3x3 conv of NHW1 by kernel k."""
    kern = k[:, :, None, None].astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, kern, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def sigm_loss(pred: Array, target: Array, gmweight: float = 0.5,
              scale: int = 4) -> Array:
    """MiDaS scale-invariant + Sobel gradient-matching loss
    (reference losses.py:237-278). pred/target: NHW1."""
    t_pred = jnp.median(pred)
    t_targ = jnp.median(target)
    s_pred = jnp.mean(jnp.abs(pred - t_pred))
    s_targ = jnp.mean(jnp.abs(target - t_targ))
    R = (pred - t_pred) / s_pred - (target - t_targ) / s_targ

    num_pix = pred.shape[1] * pred.shape[2]
    gm = 0.0
    Rk = R
    for k in range(scale):
        if k > 0:
            # torch F.interpolate(scale_factor=1/2**k) from the base map
            h = int(R.shape[1] * (1 / 2 ** k))
            w = int(R.shape[2] * (1 / 2 ** k))
            Rk = resize(R, (h, w), mode="nearest")
        gm += jnp.sum(jnp.abs(_sobel(Rk, _SOBEL_X)) + jnp.abs(_sobel(Rk, _SOBEL_Y)))
    # the reference expands each Sobel kernel to batch_size identical output
    # channels (losses.py:264-271), so its gradient term is summed
    # batch_size times — reproduced exactly (verified against
    # climategan.losses.SIGMLoss in tests/test_reference_parity.py)
    gm = gm * pred.shape[0]
    return 0.5 / num_pix * jnp.sum(jnp.abs(R)) + gmweight / num_pix * gm


def dada_depth_loss(pred: Array, label: Array) -> Array:
    """berHu reverse-Huber loss (reference losses.py:596-620)."""
    adiff = jnp.abs(pred - label)
    batch_max = 0.2 * jnp.max(adiff)
    t1 = jnp.where(adiff <= batch_max, adiff, 0.0)
    t2 = jnp.where(
        adiff > batch_max,
        (adiff * adiff + batch_max * batch_max) / (2.0 * batch_max + 1e-12),
        0.0,
    )
    return (jnp.sum(t1) + jnp.sum(t2)) / pred.size


def context_loss(input: Array, target: Array, mask: Array) -> Array:
    """Masked L1 outside the mask (reference losses.py:281-287)."""
    return jnp.mean(jnp.abs((input - target) * (1.0 - mask)))


def reconstruction_loss(input: Array, target: Array, mask: Array) -> Array:
    """Masked L1 inside the mask (reference losses.py:290-296)."""
    return jnp.mean(jnp.abs((input - target) * mask))


def ground_intersection_loss(pred: Array, pseudo_ground: Array) -> Array:
    """Penalize ground pixels missing from the flood mask
    (reference losses.py:444-450)."""
    return jnp.mean(((pseudo_ground - pred) > 0.5).astype(jnp.float32))


# --------------------------------------------------------------------------
# ADVENT adversarial loss
# --------------------------------------------------------------------------


def custom_bce(prediction: Array, target: float) -> Array:
    """BCE-with-logits against a constant domain label
    (reference losses.py:461-477)."""
    return bce_with_logits(
        prediction, jnp.full(prediction.shape, target, prediction.dtype)
    )


def wgan_domain_loss(x: Array, y: float) -> Array:
    """-mean(y*x + (1-y)*(1-x)) (reference losses.py:497 lambda)."""
    return -jnp.mean(y * x + (1.0 - y) * (1.0 - x))


def advent_loss(
    prob: Array,
    target: float,
    disc_fn: Callable[[Array], Array],
    gan_type: str = "WGAN_norm",
    depth_preds: Optional[Array] = None,
) -> Array:
    """ADVENT adversarial loss: entropy map (optionally depth-weighted, DADA)
    -> domain discriminator -> domain loss (reference losses.py:480-524)."""
    d_in = entropy_map(prob)
    if depth_preds is not None:
        d_in = d_in * depth_preds
    d_out = disc_fn(d_in)
    if gan_type == "GAN":
        return custom_bce(d_out, target)
    return wgan_domain_loss(d_out, target)


# --------------------------------------------------------------------------
# VGG19 perceptual loss
# --------------------------------------------------------------------------

_VGG19_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M")
# feature indices after which the reference slices (relu1_1 .. relu5_2):
# slices end after features[1], [6], [11], [20], [29] (losses.py:313-323)


class VGG19Features(nn.Module):
    """VGG19 feature extractor returning the 5 relu slices used by pix2pixHD.

    Weights are expected to be converted from torchvision's vgg19 via
    utils/convert.py; random init is functional but the perceptual loss is
    then untrained (documented limitation — no pretrained weights ship in
    this environment).
    """

    @nn.compact
    def __call__(self, x):
        outs = []
        conv_i = 0
        relu_count = 0
        # torchvision vgg19.features relu indices after which the reference
        # slices end: relu1_1(#0), relu2_1(#2), relu3_1(#4), relu4_1(#8),
        # relu5_1(#12) — losses.py:313-323.
        slice_marks = {0, 2, 4, 8, 12}
        for v in _VGG19_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(int(v), (3, 3), padding=1, name=f"conv{conv_i}")(x)
                x = nn.relu(x)
                if relu_count in slice_marks:
                    outs.append(x)
                if relu_count == 12:
                    break
                relu_count += 1
                conv_i += 1
        return outs


_VGG_WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)


def vgg_loss(vgg_variables, x: Array, y: Array) -> Array:
    """pix2pixHD perceptual loss (reference losses.py:338-350)."""
    model = VGG19Features()
    fx = model.apply(vgg_variables, x)
    fy = model.apply(vgg_variables, y)
    total = 0.0
    for w, a, b in zip(_VGG_WEIGHTS, fx, fy):
        total += w * l1_loss(
            a.astype(jnp.float32), jax.lax.stop_gradient(b).astype(jnp.float32)
        )
    return total


def init_vgg(rng, image_size: int = 64):
    model = VGG19Features()
    return model.init(rng, jnp.zeros((1, image_size, image_size, 3)))

"""Normalization layers (TPU-native, NHWC).

Re-designs of the reference normalizations (climategan/norms.py):
  * spectral normalization — power-iteration state lives in a dedicated
    ``spectral`` variable collection so it can be threaded through ``jit``
    functionally instead of mutating module attributes like the reference
    (norms.py:84-143).
  * instance / layer norm — pure jnp reductions over NHWC.
  * SPADE — conditional affine from a conditioning map (norms.py:146-186).
"""
from __future__ import annotations

import os
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from climategan_tpu.ops.interpolate import resize


def _l2normalize(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    # reference norms.py:80-81 — divide by (norm + eps), not rsqrt(sq+eps)
    return v / (jnp.linalg.norm(v) + eps)


_SPECTRAL_FROZEN = False
_PALLAS_SPADE = False

# trace-time switch for blocks.Conv2dBlock: True fuses 3x3 reflect convs
# (zero-pad conv + border fixes) instead of materializing the padded
# tensor. A/B on v5e flood b32: fused 64.2 img/s vs materialized 63.2 —
# the border-strip ops trace at ~23 ms/iter but overlap other work,
# while the pad copies serialize; fused wins end to end.
FUSED_REFLECT = True

# Trace-time switch: run plain 1x1 stride-1 unpadded convs as reshaped
# matmuls. Default OFF: the isolated microbench wins 3.1x (XLA picks a
# batch-in-sublanes conv emitter at the painter tail's shapes; the dot
# form hits the MXU matmul emitter — 15.2 -> 4.9 ms for up_spade4's
# conv_s with its stats epilogue), but the END-TO-END flood bench
# MEASURED the rewrite as a 19% regression (52.4 vs 64.3 img/s/chip,
# same-session A/B) — the reshape around the dot is a fusion barrier
# that re-materializes full-res activations (+1.9 GB/image of HBM
# traffic by XLA cost analysis). See BENCH_NOTES "Round 5".
# CLIMATEGAN_DOT_1X1=1 opts in (same knob gates ops/s2d.DOT_1X1).
DOT_1X1 = os.environ.get("CLIMATEGAN_DOT_1X1", "0") == "1"


class pallas_spade:
    """Trace-time switch: inside this context the s2d-stage SPADE
    conditioning MLPs (mlp_shared + mlp_gamma/mlp_beta) run as the fused
    Pallas kernel (ops/pallas/spade.py) instead of the XLA packed-conv
    path — exact math, no structural-zero FLOPs, no HBM round trip of the
    shared activation. Enabled by build_infer_fn on TPU
    (opts.tpu.pallas_spade); inference-only (the kernel defines no VJP)."""

    def __enter__(self):
        global _PALLAS_SPADE
        self._prev = _PALLAS_SPADE
        _PALLAS_SPADE = True

    def __exit__(self, *exc):
        global _PALLAS_SPADE
        _PALLAS_SPADE = self._prev
        return False


class frozen_spectral:
    """Trace-time switch: inside this context SNConv uses its kernel as-is
    (no power iteration / sigma divide). Pair with
    utils.bn_fold.bake_spectral_norm, which divides every spectral kernel by
    its sigma once — the runtime sigma of a baked kernel is exactly 1, so
    skipping the computation is a pure-win graph simplification for
    inference."""

    def __enter__(self):
        global _SPECTRAL_FROZEN
        self._prev = _SPECTRAL_FROZEN
        _SPECTRAL_FROZEN = True

    def __exit__(self, *exc):
        global _SPECTRAL_FROZEN
        _SPECTRAL_FROZEN = self._prev
        return False


def spectral_normalize(
    kernel: jax.Array,
    u: jax.Array,
    v: jax.Array,
    power_iterations: int = 1,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One (or more) power-iteration spectral normalization steps.

    ``kernel`` is HWIO; the estimate matrix is flattened to (O, I*KH*KW) in
    torch's OIHW order so converted checkpoints keep identical u/v vectors
    (reference norms.py:100-112). Power iterations do not carry gradient;
    sigma does (w_bar participates in the final contraction), matching the
    reference where u/v are buffers but w_bar requires grad.
    """
    sigma, u, v = spectral_sigma(kernel, u, v, power_iterations)
    w = kernel / sigma.astype(kernel.dtype)
    return w, u, v


def spectral_sigma(
    kernel: jax.Array,
    u: jax.Array,
    v: jax.Array,
    power_iterations: int = 1,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Power-iteration sigma estimate WITHOUT scaling the kernel.

    The live SNConv path applies 1/sigma to the conv OUTPUT instead of the
    kernel: mathematically identical (conv is linear in the kernel), but it
    dodges an XLA Shardy partitioner miscompilation where a conv whose
    kernel is scaled by any traced scalar returns outputs multiplied by the
    spatial-shard count when its input is spatially sharded on a multi-axis
    mesh (repro: tests/test_shardy_workaround.py; observed on jax 0.9.0,
    exact on the legacy GSPMD partitioner)."""
    kh, kw, ci, co = kernel.shape
    w_mat = kernel.astype(jnp.float32).transpose(3, 2, 0, 1).reshape(co, -1)
    w_ng = jax.lax.stop_gradient(w_mat)
    for _ in range(power_iterations):
        v = _l2normalize(w_ng.T @ u)
        u = _l2normalize(w_ng @ v)
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    sigma = u @ (w_mat @ v)
    return sigma, u, v


class InstanceNorm(nn.Module):
    """InstanceNorm2d, no affine, no running stats (torch defaults).

    Stats accumulate in f32 directly from the (possibly bf16) input —
    no materialized f32 copy, halving the HBM traffic of the stats pass
    (profiling showed the convert+reduce fusions on the painter's 640^2
    activations were ~13% of flood inference time).
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return _instance_norm(x, self.epsilon)


class LayerNormRef(nn.Module):
    """The reference's custom LayerNorm (climategan/norms.py:49-77).

    Normalizes each sample over *all* of C,H,W with an unbiased std and a
    ``(x - mean) / (std + eps)`` form (not rsqrt of var+eps), then applies a
    per-channel affine. Matching those exact quirks matters for parity.
    """

    num_features: int
    epsilon: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        xf = x.astype(jnp.float32)
        n = x.shape[0]
        flat = xf.reshape(n, -1)
        mean = flat.mean(axis=1).reshape(n, 1, 1, 1)
        std = flat.std(axis=1, ddof=1).reshape(n, 1, 1, 1)
        y = (xf - mean) / (std + self.epsilon)
        if self.affine:
            gamma = self.param(
                "gamma", nn.initializers.uniform(scale=1.0), (self.num_features,)
            )
            beta = self.param("beta", nn.initializers.zeros, (self.num_features,))
            y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
        return y.astype(x.dtype)


class AdaptiveInstanceNorm(nn.Module):
    """AdaIN (climategan/norms.py:8-46): instance norm with externally
    assigned per-channel weight/bias, passed as call arguments (the functional
    equivalent of the reference's dynamically-assigned attributes)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, weight: jax.Array, bias: jax.Array) -> jax.Array:
        y = InstanceNorm(epsilon=self.epsilon)(x)
        return y * weight.reshape(1, 1, 1, -1) + bias.reshape(1, 1, 1, -1)


class BatchNorm(nn.Module):
    """BatchNorm2d with torch-compatible defaults (momentum 0.1, eps 1e-5).

    Thin wrapper over linen BatchNorm: running stats live in ``batch_stats``;
    ``train=False`` uses running averages (inference graphs constant-fold the
    whole affine — the XLA equivalent of the reference's bn_fusion.py).
    """

    use_scale_bias: bool = True
    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.momentum,
            epsilon=self.epsilon,
            use_bias=self.use_scale_bias,
            use_scale=self.use_scale_bias,
            dtype=x.dtype,
            param_dtype=jnp.float32,
        )(x)


def _conv3x3_reflect(x: jax.Array, w: jax.Array, bias) -> jax.Array:
    """3x3 stride-1 conv with reflect padding, WITHOUT materializing the
    (H+2, W+2) padded tensor (profiled ~10 ms/iter of pad copies in the
    mask decoder at 640^2): zero-padded conv + four exact 1-px border
    strip corrections. Reflect(-1) = row/col 1, so the only difference
    from zero padding is the kernel row/col that read the pad ring:
      top:    out[0]   += K[0] * x[1]      (reflect-W inside the strip)
      bottom: out[H-1] += K[2] * x[H-2]
      left:   out[:,0] += K[:,0] * x[:,1]  (zero-H: corner taps with
      right:  symmetric                     dy=+-1 live in top/bottom)
    """
    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
        preferred_element_type=x.dtype,
    )

    def row_fix(strip, wrow):
        # strip (N,1,W,C); reflect in W via 2 tiny concats
        s = jnp.concatenate(
            [strip[:, :, 1:2], strip, strip[:, :, -2:-1]], axis=2)
        return jax.lax.conv_general_dilated(
            s, wrow, (1, 1), [(0, 0), (0, 0)], dimension_numbers=dn,
            preferred_element_type=x.dtype,
        )

    def col_fix(strip, wcol):
        # strip (N,H,1,C); zero boundary in H
        return jax.lax.conv_general_dilated(
            strip, wcol, (1, 1), [(1, 1), (0, 0)], dimension_numbers=dn,
            preferred_element_type=x.dtype,
        )

    y = y.at[:, 0:1].add(row_fix(x[:, 1:2], w[0:1]))
    y = y.at[:, -1:].add(row_fix(x[:, -2:-1], w[2:3]))
    y = y.at[:, :, 0:1].add(col_fix(x[:, :, 1:2], w[:, 0:1]))
    y = y.at[:, :, -1:].add(col_fix(x[:, :, -2:-1], w[:, 2:3]))
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


class SNConv(nn.Module):
    """2-D convolution with optional spectral normalization.

    NHWC x HWIO -> NHWC via ``lax.conv_general_dilated`` (MXU path).
    Spectral u/v state lives in the ``spectral`` collection; pass
    ``update_sn=True`` (with the collection mutable) during training steps.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)  # symmetric zero padding
    use_bias: bool = True
    spectral: bool = False
    groups: int = 1
    power_iterations: int = 1
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jax.Array, update_sn: bool = False,
                 s2d: str = "", reflect_pad: bool = False) -> jax.Array:
        """``s2d``: "" (plain), "s2d" (x is space-to-depth packed; apply the
        equivalent structured conv — ops/s2d.py), or "pack" (x is full-res;
        emit the s2d-packed output via a stride-2 packed kernel).
        ``reflect_pad``: 3x3 stride-1 reflect-padded conv via zero-pad conv
        + border corrections (no padded-tensor materialization)."""
        kh, kw = self.kernel_size
        ci = x.shape[-1] // self.groups
        if s2d == "s2d":
            ci = x.shape[-1] // 4
        kernel = self.param("kernel", self.kernel_init, (kh, kw, ci, self.features))

        inv_sigma = None
        if self.spectral and not _SPECTRAL_FROZEN:
            fan_in = ci * kh * kw
            u_var = self.variable(
                "spectral", "u",
                lambda: _l2normalize(
                    jax.random.normal(jax.random.PRNGKey(0), (self.features,))),
            )
            v_var = self.variable(
                "spectral", "v",
                lambda: _l2normalize(
                    jax.random.normal(jax.random.PRNGKey(1), (fan_in,))),
            )
            # sigma scales the conv OUTPUT, not the kernel — same math
            # (conv is linear in the kernel), but a traced-scalar-scaled
            # kernel triggers a Shardy partitioner miscompilation under
            # spatial sharding on a multi-axis mesh (spectral_sigma doc)
            sigma, u_new, v_new = spectral_sigma(
                kernel, u_var.value, v_var.value, self.power_iterations
            )
            inv_sigma = (1.0 / sigma)
            if update_sn and not self.is_initializing():
                u_var.value = u_new
                v_var.value = v_new
        w = kernel

        def _finish(y, bias):
            # 1/sigma BEFORE bias: y = conv(x, w)/sigma + b == the
            # reference's conv(x, w/sigma) + b; XLA fuses the scalar
            # multiply into the conv epilogue
            if inv_sigma is not None:
                y = y * inv_sigma.astype(y.dtype)
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y

        if s2d:
            assert self.groups == 1 and self.strides == (1, 1) \
                and self.dilation == (1, 1), "s2d conv: plain stride-1 only"
            from climategan_tpu.ops.s2d import conv_pack_s2d, conv_s2d

            bias = (self.param("bias", nn.initializers.zeros,
                               (self.features,))
                    if self.use_bias else None)
            helper = conv_s2d if s2d == "s2d" else conv_pack_s2d
            if inv_sigma is None:
                return helper(x, w.astype(x.dtype), bias)
            # packed outputs carry 4x channels — tile the bias like the
            # helpers do internally (ops/s2d.py:123-124)
            packed_bias = None if bias is None else jnp.tile(bias, 4)
            return _finish(helper(x, w.astype(x.dtype), None), packed_bias)

        if reflect_pad:
            assert self.groups == 1 and self.strides == (1, 1) \
                and self.dilation == (1, 1) and (kh, kw) == (3, 3), \
                "reflect_pad conv: plain 3x3 stride-1 only"
            bias = (self.param("bias", nn.initializers.zeros,
                               (self.features,))
                    if self.use_bias else None)
            if inv_sigma is None:
                return _conv3x3_reflect(x, w.astype(x.dtype), bias)
            return _finish(_conv3x3_reflect(x, w.astype(x.dtype), None), bias)

        if (DOT_1X1 and (kh, kw) == (1, 1) and self.strides == (1, 1)
                and self.padding == (0, 0) and self.dilation == (1, 1)
                and self.groups == 1):
            # 1x1 stride-1 conv == matmul over flattened pixels (see the
            # DOT_1X1 note above)
            n, hh, ww, c = x.shape
            y = jnp.dot(x.reshape(-1, c), w[0, 0].astype(x.dtype),
                        preferred_element_type=x.dtype)
            y = y.reshape(n, hh, ww, self.features)
        else:
            y = jax.lax.conv_general_dilated(
                x,
                w.astype(x.dtype),
                window_strides=self.strides,
                padding=[(self.padding[0], self.padding[0]),
                         (self.padding[1], self.padding[1])],
                rhs_dilation=self.dilation,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups,
                preferred_element_type=x.dtype,
            )
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return _finish(y, bias)


class ConvParams(nn.Module):
    """Declares conv kernel+bias params without executing the conv —
    lets SPADE fuse the gamma/beta convs into one MXU call while keeping
    the checkpoint path layout (mlp_gamma/kernel, mlp_beta/kernel)."""

    features: int
    kernel_size: Tuple[int, int]
    in_features: int
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self):
        kh, kw = self.kernel_size
        k = self.param("kernel", self.kernel_init,
                       (kh, kw, self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class SPADEParamSet(nn.Module):
    """Param container matching SPADE's checkpoint layout
    (mlp_shared/mlp_gamma/mlp_beta kernels+biases) without executing —
    used by DualSPADE to run two SPADEs' convs as batched MXU calls."""

    kernel_size: int
    norm_nc: int
    cond_nc: int
    nhidden: int = 128

    @nn.compact
    def __call__(self):
        ks = (self.kernel_size, self.kernel_size)
        shared = ConvParams(self.nhidden, ks, self.cond_nc,
                            name="mlp_shared")()
        gamma = ConvParams(self.norm_nc, ks, self.nhidden, name="mlp_gamma")()
        beta = ConvParams(self.norm_nc, ks, self.nhidden, name="mlp_beta")()
        return shared, gamma, beta


def dual_spade(x, segmap, params_a, params_b, norm_nc: int,
               kernel_size: int, s2d: bool = False):
    """Two instance-norm SPADEs over the SAME (x, segmap) executed jointly
    (the SRB's parallel norm_s/norm_0 pair): the param-free instance norm
    runs once, the two mlp_shared convs run as one output-concat conv, and
    each branch's gamma/beta convs run as one dense output-concat conv
    (grouped convs lower poorly on the MXU — measured 10% slower end-to-end,
    commit 3b30510). Exact math, fewer MXU launches and far less
    output-channel padding at the painter's small norm_nc.
    params_{a,b}: SPADEParamSet() results."""
    (sk_a, sb_a), (gk_a, gb_a), (bk_a, bb_a) = params_a
    (sk_b, sb_b), (gk_b, gb_b), (bk_b, bb_b) = params_b

    pw = kernel_size // 2
    pad = [(pw, pw), (pw, pw)]
    if s2d:
        # x is space-to-depth packed; the conditioning convs run at FULL
        # resolution and the gamma/beta convs emit s2d output directly
        # (ops/s2d.py strided-packed kernels — no relayout pass)
        from climategan_tpu.ops.s2d import instance_norm_s2d

        normalized = instance_norm_s2d(x)
        seg = resize(segmap, (2 * x.shape[1], 2 * x.shape[2]), mode="nearest")
        if _PALLAS_SPADE and kernel_size == 3:
            from climategan_tpu.ops.pallas.spade import spade_cond
            from climategan_tpu.ops.s2d import space_to_depth

            dt = x.dtype
            gbs = spade_cond(
                seg.astype(dt),
                jnp.concatenate([sk_a, sk_b], axis=-1),
                jnp.concatenate([sb_a, sb_b]),
                [(gk_a, gb_a, bk_a, bb_a), (gk_b, gb_b, bk_b, bb_b)],
            )
            if gbs is not None:
                outs = []
                for gb in gbs:
                    nc = gb.shape[-1] // 2
                    gamma = space_to_depth(gb[..., :nc])
                    beta = space_to_depth(gb[..., nc:])
                    outs.append(normalized * (1.0 + gamma) + beta)
                return tuple(outs)
    else:
        normalized = _instance_norm(x)
        seg = resize(segmap, (x.shape[1], x.shape[2]), mode="nearest")

    dt = x.dtype
    # one conv for both mlp_shared branches (same input)
    sk = jnp.concatenate([sk_a, sk_b], axis=-1).astype(dt)
    sb = jnp.concatenate([sb_a, sb_b]).astype(dt)
    actv = jax.lax.conv_general_dilated(
        seg.astype(dt), sk, (1, 1), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dt,
    ) + sb
    actv = nn.relu(actv)

    # per-branch gamma|beta convs (dense; grouped convs lower poorly on
    # the MXU — measured 10% slower end-to-end)
    nhidden = sk_a.shape[3]  # HWIO output features of branch a's shared conv
    actv_a = actv[..., :nhidden]
    actv_b = actv[..., nhidden:]
    nc = norm_nc

    if s2d:
        from climategan_tpu.ops.s2d import conv_pack_s2d_pair

        gamma_a, beta_a = conv_pack_s2d_pair(
            actv_a, gk_a.astype(dt), bk_a.astype(dt), gb_a, bb_a)
        gamma_b, beta_b = conv_pack_s2d_pair(
            actv_b, gk_b.astype(dt), bk_b.astype(dt), gb_b, bb_b)
        return (normalized * (1.0 + gamma_a) + beta_a,
                normalized * (1.0 + gamma_b) + beta_b)

    def gb_conv(a, gk, bk, gbias, bbias):
        kernel = jnp.concatenate([gk, bk], axis=-1).astype(dt)
        bias = jnp.concatenate([gbias, bbias]).astype(dt)
        out = jax.lax.conv_general_dilated(
            a, kernel, (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dt,
        ) + bias
        return out[..., :nc], out[..., nc:]

    gamma_a, beta_a = gb_conv(actv_a, gk_a, bk_a, gb_a, bb_a)
    gamma_b, beta_b = gb_conv(actv_b, gk_b, bk_b, gb_b, bb_b)

    return (normalized * (1.0 + gamma_a) + beta_a,
            normalized * (1.0 + gamma_b) + beta_b)


def _instance_norm(x, epsilon: float = 1e-5):
    mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    diff = x - mean.astype(x.dtype)
    var = jnp.mean(diff * diff, axis=(1, 2), keepdims=True,
                   dtype=jnp.float32)
    return diff * jax.lax.rsqrt(var + epsilon).astype(x.dtype)


class SPADE(nn.Module):
    """Spatially-adaptive (de)normalization (climategan/norms.py:146-186).

    gamma/beta are produced from the conditioning map by a small conv MLP;
    the conditioning map is resized to x's spatial dims with *nearest*
    interpolation, exactly as the reference. TPU note: the gamma and beta
    convs share an input, so they run as ONE conv with concatenated output
    channels (identical math, better MXU fill for small norm_nc).
    """

    param_free_norm: str  # "instance" | "batch"
    kernel_size: int
    norm_nc: int
    cond_nc: int
    nhidden: int = 128

    @nn.compact
    def __call__(self, x, segmap, train: bool = False,
                 update_sn: bool = False, s2d: bool = False):
        if s2d:
            # x is space-to-depth packed (ops/s2d.py); instance norm pools
            # phases per original channel, the conditioning convs run at
            # full resolution, and gamma/beta come out s2d-packed
            assert self.param_free_norm == "instance"
            from climategan_tpu.ops.s2d import (
                conv_pack_s2d_pair,
                instance_norm_s2d,
            )

            normalized = instance_norm_s2d(x)
            pw = self.kernel_size // 2
            ks = (self.kernel_size, self.kernel_size)
            seg = resize(segmap, (2 * x.shape[1], 2 * x.shape[2]),
                         mode="nearest")
            kg, bg = ConvParams(self.norm_nc, ks, self.nhidden,
                                name="mlp_gamma")()
            kb, bb = ConvParams(self.norm_nc, ks, self.nhidden,
                                name="mlp_beta")()
            if _PALLAS_SPADE and self.kernel_size == 3:
                # fused Pallas conditioning path (ops/pallas/spade.py);
                # params keep the mlp_shared checkpoint layout
                from climategan_tpu.ops.pallas.spade import spade_cond
                from climategan_tpu.ops.s2d import space_to_depth

                ks1, bs1 = ConvParams(self.nhidden, ks, seg.shape[-1],
                                      name="mlp_shared")()
                gbs = spade_cond(seg.astype(x.dtype), ks1, bs1,
                                 [(kg, bg, kb, bb)])
                if gbs is not None:
                    nc = self.norm_nc
                    gamma = space_to_depth(gbs[0][..., :nc])
                    beta = space_to_depth(gbs[0][..., nc:])
                    return normalized * (1.0 + gamma) + beta
                # no tile config for this shape: shared conv from the
                # declared params, then the packed-conv path below
                actv = jax.lax.conv_general_dilated(
                    seg.astype(x.dtype), ks1.astype(x.dtype), (1, 1),
                    [(pw, pw), (pw, pw)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=x.dtype,
                ) + bs1.astype(x.dtype)
                actv = nn.relu(actv)
            else:
                actv = SNConv(self.nhidden, ks, padding=(pw, pw),
                              name="mlp_shared")(seg)
                actv = nn.relu(actv)
            gamma, beta = conv_pack_s2d_pair(
                actv, kg.astype(actv.dtype), kb.astype(actv.dtype), bg, bb)
            return normalized * (1.0 + gamma) + beta

        if self.param_free_norm == "instance":
            normalized = InstanceNorm()(x)
        elif self.param_free_norm == "batch":
            normalized = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                use_bias=False,
                use_scale=False,
                dtype=x.dtype,
                param_dtype=jnp.float32,
                name="param_free_norm",
            )(x)
        else:
            raise ValueError(f"Unknown SPADE param-free norm {self.param_free_norm}")

        pw = self.kernel_size // 2
        ks = (self.kernel_size, self.kernel_size)
        seg = resize(segmap, (x.shape[1], x.shape[2]), mode="nearest")
        actv = SNConv(self.nhidden, ks, padding=(pw, pw),
                      name="mlp_shared")(seg)
        actv = nn.relu(actv)

        kg, bg = ConvParams(self.norm_nc, ks, self.nhidden,
                            name="mlp_gamma")()
        kb, bb = ConvParams(self.norm_nc, ks, self.nhidden,
                            name="mlp_beta")()
        kernel = jnp.concatenate([kg, kb], axis=-1).astype(actv.dtype)
        bias = jnp.concatenate([bg, bb]).astype(actv.dtype)
        gb = jax.lax.conv_general_dilated(
            actv, kernel, (1, 1), [(pw, pw), (pw, pw)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=actv.dtype,
        ) + bias
        gamma = gb[..., : self.norm_nc]
        beta = gb[..., self.norm_nc:]
        return normalized * (1.0 + gamma) + beta

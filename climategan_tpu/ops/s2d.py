"""Space-to-depth execution of the painter's full-resolution stage.

Motivation (profiled on v5e, batch 24 @ 640^2): the painter tail runs with
3-40 channels, but TPU tiling pads the lane (channel) dimension to 128, so
every conv/elementwise/reduce at 640^2 pays up to 6.4x the bytes and the
MXU runs at <=31% output fill. Packing 2x2 spatial blocks into channels
(s2d) executes the same math at 320^2 with 4x the channels: measured 2.3x
on the SRB conv+instance-norm family and ~1.5x on the SPADE gamma/beta
convs (which use the strided-packed form below to emit s2d output with no
relayout).

All transforms here are EXACT rewrites of stride-1 zero-padded convs
(verified against the plain path in tests/test_s2d.py):

* ``s2d_conv_kernel``: K (kh,kw,C,O) -> K2 (kh,kw,4C,4O) such that
  conv(X_s2d, K2, pad) == s2d(conv(x, K, pad)). Entry [u,v, q*C+c, p*O+o]
  equals K[dy+1, dx+1, c, o] with dy = 2(u-1) + qy - py (zero when dy or dx
  falls outside the kernel) — each output phase reads a 2x2 effective
  footprint inside the 3x3 s2d window.
* ``s2d_pack_kernel``: K (3,3,C,O) -> K4 (4,4,C,4O) for a stride-2 conv on
  the FULL-RES input that directly produces the s2d-packed output
  (used for SPADE gamma/beta: input is the 128-ch mlp activation at 640^2,
  output lands at 320^2 x 4O).

Phase convention: channel block p = py*2 + px holds pixel (2i+py, 2j+px).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def space_to_depth(x: jax.Array) -> jax.Array:
    """(N,H,W,C) -> (N,H/2,W/2,4C), phase-major channel blocks."""
    n, h, w, c = x.shape
    y = x.reshape(n, h // 2, 2, w // 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)  # n, h/2, w/2, py, px, c
    return y.reshape(n, h // 2, w // 2, 4 * c)


def depth_to_space(x: jax.Array) -> jax.Array:
    """(N,h,w,4C) -> (N,2h,2w,C)."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    y = x.reshape(n, h, w, 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)  # n, h, py, w, px, c
    return y.reshape(n, 2 * h, 2 * w, c)


def upsample2x_s2d(x: jax.Array) -> jax.Array:
    """s2d(nearest-2x-upsample(x)) == channel-concat of x with itself 4x
    (every phase of an upsampled 2x2 block equals the source pixel) —
    replaces the reference InterpolateNearest2d at zero memory-movement
    cost in the s2d stage."""
    return jnp.concatenate([x, x, x, x], axis=-1)


def s2d_conv_kernel(kernel: jax.Array) -> jax.Array:
    """Stride-1 conv kernel (kh,kw,C,O), kh/kw odd <=3 -> s2d-space kernel
    (kh',kw',4C,4O). kh'==3 for kh==3, 1 for kh==1."""
    kh, kw, c, o = kernel.shape
    assert kh in (1, 3) and kw in (1, 3), (kh, kw)

    def taps(k):
        # s2d offsets u-1 in {-1,0,1} for k=3, {0} for k=1
        return (0, 1, 2) if k == 3 else (0,)

    k2 = jnp.zeros((3 if kh == 3 else 1, 3 if kw == 3 else 1,
                    4 * c, 4 * o), kernel.dtype)
    for u in taps(kh):
        for v in taps(kw):
            for py in (0, 1):
                for px in (0, 1):
                    for qy in (0, 1):
                        for qx in (0, 1):
                            du = (u - 1) if kh == 3 else 0
                            dv = (v - 1) if kw == 3 else 0
                            dy = 2 * du + qy - py
                            dx = 2 * dv + qx - px
                            ry = dy + kh // 2
                            rx = dx + kw // 2
                            if 0 <= ry < kh and 0 <= rx < kw:
                                q = qy * 2 + qx
                                p = py * 2 + px
                                k2 = k2.at[
                                    u, v, q * c:(q + 1) * c,
                                    p * o:(p + 1) * o,
                                ].set(kernel[ry, rx])
    return k2


def s2d_pack_kernel(kernel: jax.Array) -> jax.Array:
    """Stride-1 3x3 kernel (3,3,C,O) -> (4,4,C,4O) for a STRIDE-2 conv on
    the full-res input, pad (1,1), producing the s2d-packed conv output:
    window tap (u,v) covers full-res pixel (2i+u-1, 2j+v-1); output phase
    (py,px) needs taps dy=u-1-py in {-1,0,1}."""
    kh, kw, c, o = kernel.shape
    assert kh == 3 and kw == 3, (kh, kw)
    k4 = jnp.zeros((4, 4, c, 4 * o), kernel.dtype)
    for u in range(4):
        for v in range(4):
            for py in (0, 1):
                for px in (0, 1):
                    dy = u - 1 - py
                    dx = v - 1 - px
                    if -1 <= dy <= 1 and -1 <= dx <= 1:
                        p = py * 2 + px
                        k4 = k4.at[u, v, :, p * o:(p + 1) * o].set(
                            kernel[dy + 1, dx + 1])
    return k4


# Trace-time switch (opt-in knob, also honored by models.norms.DOT_1X1):
# run 1x1 stride-1 convs as reshaped matmuls instead of lax.conv. Same
# math; picks the MXU dot emitter over XLA's batch-in-sublanes conv
# emitter — 3.1x faster in isolation, but a measured 19% END-TO-END
# regression (52.4 vs 64.3 img/s/chip, same-session A/B: the reshape is
# a fusion barrier that costs +1.9 GB/image of HBM traffic). Default
# OFF; see the DOT_1X1 note in models/norms.py and BENCH_NOTES "Round 5".
DOT_1X1 = os.environ.get("CLIMATEGAN_DOT_1X1", "0") == "1"


def conv_s2d(x_s2d: jax.Array, kernel: jax.Array, bias=None) -> jax.Array:
    """Apply a stride-1 full-res conv (kernel in ORIGINAL (kh,kw,C,O) form)
    to an s2d input, returning the s2d output."""
    k2 = s2d_conv_kernel(kernel).astype(x_s2d.dtype)
    if DOT_1X1 and k2.shape[:2] == (1, 1):
        # 1x1 s2d conv == one matmul with the (4C, 4O) phase-block-diagonal
        # kernel. XLA's conv path picks the EmitOutputBatchInSublanes
        # emitter at the painter tail's shapes (batch 32, <=80 lanes) and
        # runs ~3x slower than the MXU matmul form: measured 15.2 ms conv
        # vs 4.9 ms dot for up_spade4's conv_s (1x1 160->80 at 320^2 b32,
        # v5e, stats epilogue included in both).
        n, h, w, c4 = x_s2d.shape
        y = jnp.dot(x_s2d.reshape(-1, c4), k2[0, 0],
                    preferred_element_type=x_s2d.dtype)
        y = y.reshape(n, h, w, k2.shape[-1])
    else:
        pad = (k2.shape[0] // 2, k2.shape[1] // 2)
        y = jax.lax.conv_general_dilated(
            x_s2d, k2, (1, 1), [(pad[0], pad[0]), (pad[1], pad[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x_s2d.dtype,
        )
    if bias is not None:
        y = y + jnp.tile(bias, 4).astype(y.dtype)
    return y


# Trace-time switch for the structural-zero phase decomposition below.
# Default OFF: the end-to-end flood bench MEASURED the decomposition as a
# 23% REGRESSION on v5e (49.5 vs 64.0 img/s/chip at b32 640^2, same-session A/B) despite
# cutting analytic FLOPs 1653 -> 1444 GFLOP/image — the multi-conv
# variants re-read the full-res input from HBM per phase conv, and
# rebuilding gamma/beta from per-phase slices relayouts the output where
# the single 4x4 kernel emits them as two contiguous lane slices that
# XLA fuses straight into the SPADE epilogue. Counted-MXU-work cost
# models miss both effects; see BENCH_NOTES "Round 4 (cont. 2)".
PACK_DECOMP = False


def _pack_cost(taps: int, out_ch: int) -> int:
    """MXU cost model for one packed-conv decomposition: taps x padded
    output-lane tiles (input channels are the same across variants)."""
    return taps * -(-out_ch // 128) * 128


def _phase_outputs(x_full: jax.Array, k: jax.Array) -> list:
    """The stride-2 packed conv, decomposed to skip structural zeros.
    OPT-IN (PACK_DECOMP): measured slower end-to-end than the single
    4x4 pack kernel on v5e — see the PACK_DECOMP note above.

    Returns the four phase outputs [p0, p1, p2, p3] (p = py*2 + px, each
    (N, H/2, W/2, O)) of the full-res stride-1 3x3 conv — i.e. the
    channel blocks of the s2d-packed result BEFORE concatenation (the
    consumers slice/concat these; XLA fuses that into their epilogues).

    Three exact decompositions, chosen by an MXU cost model
    (taps x padded-lane tiles — counted MXU work only; it ignores the
    per-conv HBM re-read of x_full and the output relayout, which is
    why the decomposition loses end-to-end):
      * 1 conv : 4x4 stride-2 kernel, 16 taps of which 9 are semantically
        nonzero per phase (s2d_pack_kernel) — best when 4O fits one tile.
      * 2 convs: one per px phase, 4x3 kernel (12 taps, 9 nonzero), both
        py phases as output-channel blocks — best at small O (the lane
        padding of narrower outputs dominates).
      * 4 convs: one per (py, px) phase, the ORIGINAL 3x3 kernel with
        asymmetric padding ((1-py, py), (1-px, px)) — zero structural
        waste; best when O alone still fills an output tile.
    Phase (py,px) output[i,j] = sum_{u,v} x[2i+py+u-1, 2j+px+v-1] K[u,v],
    exactly full-res-conv pixel (2i+py, 2j+px).
    """
    assert k.shape[0] == 3 and k.shape[1] == 3, k.shape
    o = k.shape[-1]
    dn = ("NHWC", "HWIO", "NHWC")
    dt = x_full.dtype
    c1 = _pack_cost(16, 4 * o)
    c2 = _pack_cost(2 * 12, 2 * o)
    c4 = _pack_cost(4 * 9, o)
    best = min(c1, c2, c4)
    if best == c1:
        y = jax.lax.conv_general_dilated(
            x_full, s2d_pack_kernel(k).astype(dt), (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=dn, preferred_element_type=dt,
        )
        return [y[..., p * o:(p + 1) * o] for p in range(4)]
    if best == c2:
        # kernel (4,3,C,2O): rows 0..2 = phase py=0, rows 1..3 = py=1
        kp = jnp.zeros((4, 3) + k.shape[2:3] + (2 * o,), k.dtype)
        kp = kp.at[0:3, :, :, :o].set(k)
        kp = kp.at[1:4, :, :, o:].set(k)
        kp = kp.astype(dt)
        by_px = [
            jax.lax.conv_general_dilated(
                x_full, kp, (2, 2), [(1, 1), (1 - px, px)],
                dimension_numbers=dn, preferred_element_type=dt,
            )
            for px in (0, 1)
        ]
        return [by_px[0][..., :o], by_px[1][..., :o],
                by_px[0][..., o:], by_px[1][..., o:]]
    kd = k.astype(dt)
    return [
        jax.lax.conv_general_dilated(
            x_full, kd, (2, 2), [(1 - py, py), (1 - px, px)],
            dimension_numbers=dn, preferred_element_type=dt,
        )
        for py in (0, 1) for px in (0, 1)
    ]


def conv_pack_s2d(x_full: jax.Array, kernel: jax.Array,
                  bias=None) -> jax.Array:
    """Apply a stride-1 full-res 3x3 conv to a FULL-RES input, producing
    the s2d-packed output directly (stride-2 4x4 packed kernel; the
    phase-decomposed form behind PACK_DECOMP — measured slower)."""
    if PACK_DECOMP:
        y = jnp.concatenate(_phase_outputs(x_full, kernel), axis=-1)
    else:
        k4 = s2d_pack_kernel(kernel).astype(x_full.dtype)
        y = jax.lax.conv_general_dilated(
            x_full, k4, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x_full.dtype,
        )
    if bias is not None:
        y = y + jnp.tile(bias, 4).astype(y.dtype)
    return y


def conv_pack_s2d_pair(x_full: jax.Array, kg: jax.Array, kb: jax.Array,
                       bg=None, bb=None):
    """One stride-2 packed conv emitting BOTH SPADE maps with the output
    lanes ordered [gamma_s2d (4O) | beta_s2d (4O)] — the two kernels share
    the input, and the maps come out as two contiguous lane slices XLA
    fuses into the SPADE epilogue. (The phase-decomposed form behind
    PACK_DECOMP rebuilds each map from four phase slices — measured
    slower end-to-end; see the PACK_DECOMP note.)"""
    assert (bg is None) == (bb is None), (
        "conv_pack_s2d_pair: pass both biases or neither"
    )
    o = kg.shape[-1]
    if PACK_DECOMP:
        k = jnp.concatenate([kg, kb], axis=-1)  # (kh, kw, C, 2O)
        phases = _phase_outputs(x_full, k)      # each (N, h, w, 2O)
        gamma = jnp.concatenate([p[..., :o] for p in phases], axis=-1)
        beta = jnp.concatenate([p[..., o:] for p in phases], axis=-1)
        if bg is not None:
            gamma = gamma + jnp.tile(bg, 4).astype(gamma.dtype)
            beta = beta + jnp.tile(bb, 4).astype(beta.dtype)
        return gamma, beta
    k4 = jnp.concatenate(
        [s2d_pack_kernel(kg), s2d_pack_kernel(kb)], axis=-1
    ).astype(x_full.dtype)
    y = jax.lax.conv_general_dilated(
        x_full, k4, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x_full.dtype,
    )
    if bg is not None:
        bias = jnp.concatenate([jnp.tile(bg, 4), jnp.tile(bb, 4)])
        y = y + bias.astype(y.dtype)
    return y[..., : 4 * o], y[..., 4 * o:]


def instance_norm_s2d(x_s2d: jax.Array, epsilon: float = 1e-5) -> jax.Array:
    """InstanceNorm over the ORIGINAL (H,W) of an s2d tensor: per original
    channel c the stats pool spans all 4 phase blocks. Two big reductions
    (like the plain path) + tiny (N,4,C) phase-combines."""
    n, h, w, c4 = x_s2d.shape
    c = c4 // 4
    s1 = jnp.sum(x_s2d, axis=(1, 2), dtype=jnp.float32)        # (N, 4C)
    s2 = jnp.sum(jnp.square(x_s2d.astype(jnp.float32)), axis=(1, 2))
    cnt = 4.0 * h * w
    mean = jnp.sum(s1.reshape(n, 4, c), axis=1) / cnt           # (N, C)
    ex2 = jnp.sum(s2.reshape(n, 4, c), axis=1) / cnt
    var = ex2 - mean * mean
    scale = jax.lax.rsqrt(var + epsilon)
    mean4 = jnp.tile(mean, (1, 4))[:, None, None, :]
    scale4 = jnp.tile(scale, (1, 4))[:, None, None, :]
    return (x_s2d - mean4.astype(x_s2d.dtype)) * scale4.astype(x_s2d.dtype)

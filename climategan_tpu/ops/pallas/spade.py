"""Fused SPADE conditioning kernel (Pallas, TPU).

One VMEM pass per tile computes the whole SPADE conditioning MLP
(reference climategan/norms.py:146-186: mlp_shared 3x3 conv + ReLU, then
mlp_gamma / mlp_beta 3x3 convs) and emits the [gamma|beta] maps at full
resolution.

Why a kernel: at the painter tail's shapes (640^2, 128 hidden, 20-40
norm channels) the XLA path is the profiled hot spot (~135 ms of the
620 ms flood batch-32 step on v5e):
  * the space-to-depth "pack" convs (ops/s2d.py) carry 16/9 structural
    -zero FLOPs and run at 62-83% MXU output fill (lane padding of the
    40-320 channel outputs), i.e. ~2x the reference-equivalent FLOP time;
  * every mlp_shared activation (3.4-6.7 GB at batch 32) makes a full
    HBM round trip between the shared conv and the gamma/beta convs.

Kernel strategy (per (R, S) output tile):
  1. DMA the (R+4, S+4) conditioning window from HBM (the array is
     zero-padded by 2 on the host side, so border tiles read zeros —
     the shared conv's own zero padding).
  2. Shared conv as one im2col matmul: (M, 9*cnc) @ (9*cnc, hid) with
     M = (R+2)(S+2) (a 1-px halo of activation pixels for step 4),
     + bias + ReLU.
  3. Zero the activation rows/cols that fall outside the image — they
     model the gamma/beta convs' zero padding (computed via iota masks,
     border tiles only differ).
  4. gamma/beta convs with NO structural zeros and near-full lane fill:
     for each kernel row u, one matmul (M, hid) @ (hid, 3*L) whose N dim
     concatenates the three column taps' [gamma|beta] outputs
     (L = 2*nc; N = 3*L is 94%+ lane fill at the painter's shapes), then
     accumulate the 9 shifted slices in f32 (VPU) and add the biases.
Outputs one (N, H, W, 2*nc) [gamma|beta] map per branch; the s2d
relayout and the `normalized*(1+gamma)+beta` apply stay in XLA, which
fuses them into neighboring elementwise work.

Branches: `dual_spade` (models/norms.py) evaluates two SPADEs over the
same conditioning map with their mlp_shared convs concatenated; the
kernel takes the concatenated shared weights and per-branch gamma/beta
weights, and each branch reads its slice of the shared activation.

CPU fallback: interpreter mode (events.py convention), so tests exercise
the identical kernel code path without a TPU.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
    _ANY = pl.ANY
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = pl.ANY
    _ANY = pl.ANY


def _pad128(n: int) -> int:
    return -(-n // 128) * 128


def _tile_config(H: int, W: int, cnc: int, hid_total: int,
                 Ls: Sequence[int], dt_bytes: int,
                 budget: int = 10 * 1024 * 1024
                 ) -> Optional[Tuple[int, int]]:
    """Largest (R, S) full-res tile that divides (H, W) and fits VMEM."""
    best = None
    for R in (32, 16, 8):
        if H % R:
            continue
        for S in (256, 128, 64, 32, 16, 8):
            if W % S:
                continue
            M = (R + 2) * (S + 2)
            use = (
                M * _pad128(9 * cnc) * dt_bytes * 2             # patch window
                + M * _pad128(hid_total) * (4 + dt_bytes)       # actv f32+cast
                + max(M * _pad128(3 * L) * 4 for L in Ls)       # tap matmul
                + sum(R * S * _pad128(L) * 4 for L in Ls)       # f32 accs
                + sum(R * S * _pad128(L) * dt_bytes for L in Ls) * 2  # outs
                + 512 * 1024                                    # weights etc.
            )
            if use <= budget:
                if best is None or R * S > best[0] * best[1]:
                    best = (R, S)
                break  # smaller S only shrinks the tile
    return best


def spade_cond(
    seg: jax.Array,
    k1: jax.Array,
    b1: jax.Array,
    branches: Sequence[Tuple[jax.Array, jax.Array, jax.Array, jax.Array]],
    *,
    interpret: Optional[bool] = None,
) -> Optional[List[jax.Array]]:
    """Fused SPADE conditioning: seg -> per-branch [gamma|beta] maps.

    seg: (N, H, W, cnc) conditioning map (already resized to the SPADE's
    working resolution). k1/b1: concatenated mlp_shared weights
    (3, 3, cnc, sum hid_b) / (sum hid_b,). branches: sequence of
    (kg, bg, kb, bb), kg/kb of shape (3, 3, hid_b, nc_b); branch b reads
    lanes [sum hid_<b> : sum hid_<=b>) of the shared activation.

    Returns a list of (N, H, W, 2*nc_b) arrays with lanes [gamma | beta],
    or None when no tile configuration fits (caller falls back to XLA).
    """
    N, H, W, cnc = seg.shape
    hid_total = k1.shape[-1]
    hids = [kg.shape[2] for (kg, _, _, _) in branches]
    ncs = [kg.shape[3] for (kg, _, _, _) in branches]
    Ls = [2 * nc for nc in ncs]
    assert sum(hids) == hid_total, (hids, hid_total)
    assert k1.shape[:2] == (3, 3), "3x3 SPADE kernels only"
    dt = seg.dtype
    dt_bytes = jnp.dtype(dt).itemsize

    cfg = _tile_config(H, W, cnc, hid_total, Ls, dt_bytes)
    if cfg is None:
        return None
    R, S = cfg
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nb = len(branches)
    PK = _pad128(9 * cnc)  # padded im2col contraction dim

    # host-side prep -------------------------------------------------------
    # im2col patches for the shared conv, on the (H+2, W+2) activation-halo
    # grid (XLA-side: Mosaic cannot lane-concat 3-lane slices in-kernel;
    # the patch tensor is ~0.7 GB at the flagship shapes, ~2 ms of HBM)
    seg_p = jnp.pad(seg, ((0, 0), (2, 2), (2, 2), (0, 0)))
    pats = jnp.concatenate(
        [seg_p[:, dy:dy + H + 2, dx:dx + W + 2, :]
         for dy in range(3) for dx in range(3)], axis=-1)
    k1f = jnp.pad(
        k1.reshape(9 * cnc, hid_total), ((0, PK - 9 * cnc), (0, 0))
    ).astype(dt)
    b1r = b1.reshape(1, hid_total).astype(jnp.float32)
    k2s, b2s = [], []
    for (kg, bg, kb, bb) in branches:
        for u in range(3):
            k2s.append(
                jnp.concatenate(
                    [jnp.concatenate([kg[u, v], kb[u, v]], axis=-1)
                     for v in range(3)],
                    axis=-1,
                ).astype(dt)  # (hid_b, 3*L)
            )
        b2s.append(jnp.concatenate([bg, bb]).reshape(1, -1)
                   .astype(jnp.float32))

    hid_off = [0]
    for h_ in hids:
        hid_off.append(hid_off[-1] + h_)

    def kernel(pats_ref, k1_ref, b1_ref, *rest):
        k2_refs = rest[: 3 * nb]
        b2_refs = rest[3 * nb: 4 * nb]
        out_refs = rest[4 * nb: 5 * nb]
        pats_buf, sem = rest[5 * nb:]
        n = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)

        if pltpu is not None and not interpret:
            dma = pltpu.make_async_copy(
                pats_ref.at[n, pl.ds(i * R, R + 2), pl.ds(j * S, S + 2), :],
                pats_buf, sem,
            )
            dma.start()
            dma.wait()
            pb = pats_buf[:]
        else:  # interpreter: plain windowed read
            pb = pats_ref[n, pl.ds(i * R, R + 2), pl.ds(j * S, S + 2), :]

        M = (R + 2) * (S + 2)
        actv = jnp.dot(pb.reshape(M, 9 * cnc).astype(dt),
                       k1_ref[:9 * cnc], preferred_element_type=jnp.float32)
        actv = jnp.maximum(actv + b1_ref[0][None, :], 0.0).astype(dt)
        # activation pixels outside the image stand for the gamma/beta
        # convs' zero padding (they hold relu(b1) otherwise); zero their
        # contributions on the 3-D tap outputs (a pure broadcast multiply —
        # Mosaic supports neither 2-D i1 reshapes nor lane-odd concats)
        rows = (jax.lax.broadcasted_iota(jnp.int32, (R + 2, S + 2), 0)
                + (i * R - 1))
        cols = (jax.lax.broadcasted_iota(jnp.int32, (R + 2, S + 2), 1)
                + (j * S - 1))
        ok = (rows >= 0) & (rows < H) & (cols >= 0) & (cols < W)
        maskf = ok.astype(jnp.float32)[:, :, None]

        for b in range(nb):
            ab = actv[:, hid_off[b]:hid_off[b + 1]]
            L = Ls[b]
            acc = jnp.zeros((R, S, L), jnp.float32)
            for u in range(3):
                big = jnp.dot(ab, k2_refs[b * 3 + u][:],
                              preferred_element_type=jnp.float32)
                big3 = big.reshape(R + 2, S + 2, 3 * L) * maskf
                for v in range(3):
                    acc = acc + big3[u:u + R, v:v + S,
                                     v * L:(v + 1) * L]
            acc = acc + b2_refs[b][0][None, None, :]
            out_refs[b][0] = acc.astype(dt)

    grid = (N, H // R, W // S)
    w_spec = lambda a: pl.BlockSpec(  # noqa: E731 — full-array VMEM block
        a.shape, lambda n, i, j: (0,) * a.ndim, memory_space=_VMEM)
    in_specs = (
        [pl.BlockSpec(memory_space=_ANY)]                 # pats (HBM)
        + [w_spec(k1f), w_spec(b1r)]
        + [w_spec(k) for k in k2s]
        + [w_spec(b) for b in b2s]
    )
    out_specs = [
        pl.BlockSpec((1, R, S, L), lambda n, i, j: (n, i, j, 0),
                     memory_space=_VMEM)
        for L in Ls
    ]
    scratch = [
        (pltpu.VMEM((R + 2, S + 2, 9 * cnc), dt) if pltpu is not None
         else None),
        (pltpu.SemaphoreType.DMA(()) if pltpu is not None else None),
    ]
    if pltpu is None:  # pragma: no cover — non-TPU jax build
        scratch = []
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((N, H, W, L), dt) for L in Ls],
        scratch_shapes=scratch,
        interpret=interpret,
    )(pats, k1f, b1r, *k2s, *b2s)
    return list(outs)

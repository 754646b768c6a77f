"""Fused SPADE conditioning kernel (Pallas, TPU).

One VMEM pass per row-strip computes the whole SPADE conditioning MLP
(reference climategan/norms.py:146-186: mlp_shared 3x3 conv + ReLU, then
mlp_gamma / mlp_beta 3x3 convs) and emits the [gamma|beta] maps at full
resolution.

Why a kernel: at the painter tail's shapes (640^2, 128 hidden, 20-40
norm channels) the XLA path is the profiled hot spot (~135 ms of the
630 ms flood batch-32 step on v5e):
  * the space-to-depth "pack" convs (ops/s2d.py) carry 16/9 structural
    -zero FLOPs and run at ~41% MXU utilization (the profiled
    fusion.24/21/36/33/30 group);
  * every mlp_shared activation (3.4-6.7 GB at batch 32) makes a full
    HBM round trip between the shared conv and the gamma/beta convs.

Kernel strategy — everything 2-D, tile-aligned, and 32-bit where it
rotates (Mosaic rejects sublane slices that are not multiples of 8 and
rotates of non-32-bit data; both killed earlier designs):
  * Flat layout: all tensors are (pixels, channels) with pixels
    row-major over a width padded to W_pad (multiple of 8, >= W+4), so
    every "shift by one image row" is a static `pltpu.roll` by W_pad
    along the sublane axis and every DMA window is a whole number of
    rows — always 8-aligned.
  * Grid over (batch, H/R) row strips. Strip i DMAs M2=(R+2)*W_pad
    im2col rows of the conditioning map (host-built patches over FIVE
    column taps x three row taps, 15*cnc channels) and computes:
      1. A3 = relu(pats @ W1 + B1), masked: W1 is the mlp_shared kernel
         laid out so that lane block (branch b, shift v) holds the
         shared activation SHIFTED v pixels right — the column-tap
         shifts of step 2 are folded into the stage-1 weights (pats has
         column taps v' = v + w for shift v and kernel tap w), so no
         rotate of bf16 data is ever needed. The mask zeroes activation
         pixels outside the image per shifted block (they model the
         gamma/beta convs' zero padding; they'd hold relu(b1)
         otherwise).
      2. per branch: big = A3[:, b*3h:(b+1)*3h] @ K2 (3*hid, 3*L): the
         three column taps are summed inside the matmul CONTRACTION;
         lane block u of big holds tap-ROW u's [gamma|beta] output
         (L = 2*nc lanes), ~94% MXU lane fill, zero structural-zero
         FLOPs (vs 41% utilization for the XLA pack convs).
      3. combine tap rows: out = sum_u shift(big, u*W_pad rows,
         u*L lanes)[:R*W_pad, :L] — rolls on f32 (32-bit, supported),
         offsets static, every slice starts at 0.
Outputs one (N, H, W, 2*nc) [gamma|beta] map per branch; the s2d
relayout and the `normalized*(1+gamma)+beta` apply stay in XLA.

Branches: `dual_spade` (models/norms.py) evaluates two SPADEs over the
same conditioning map with their mlp_shared convs concatenated; the
kernel takes the concatenated shared weights and per-branch gamma/beta
weights, and each branch reads its (3*hid_b)-lane block of A3 (built
branch-major so the block is contiguous and 128-aligned).

CPU fallback: interpreter mode (events.py convention) with jnp.roll in
place of pltpu.roll, so tests exercise the identical kernel math
without a TPU.
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


def _pad8(n: int) -> int:
    return -(-n // 8) * 8


def _pick_R(H: int, W_pad: int, ck: int, hids: Sequence[int],
            Ls: Sequence[int], dt_bytes: int,
            budget: int = 14 * 1024 * 1024) -> Optional[int]:
    """Largest strip height R dividing H whose VMEM footprint fits.

    The kernel runs branch by branch, so the peak is the patch window
    plus ONE branch's pipeline (f32 pre-relu block OR a3+big+roll tmp,
    whichever phase is wider) plus the accumulators/outputs."""
    hid_max = max(hids)
    bigL = max(_pad128(3 * L) for L in Ls)
    for R in (16, 10, 8, 5, 4, 2):
        if H % R:
            continue
        M2 = (R + 2) * W_pad
        M1 = R * W_pad
        # widest live set across the branch pipeline phases (z dies into
        # a3, a3 dies once big is computed, rolls need big + one tmp)
        per_branch = max(
            M2 * 3 * hid_max * 4,                       # f32 pre-relu z
            M2 * 3 * hid_max * dt_bytes + M2 * bigL * 4,  # a3 + big
            2 * M2 * bigL * 4,                          # big + roll tmp
        )
        use = (
            M2 * _pad128(ck) * dt_bytes                 # patch window
            + per_branch
            + M1 * bigL * 4                             # acc
            + sum(M1 * _pad128(L) * dt_bytes for L in Ls)  # outs
            + 512 * 1024                                # weights etc.
        )
        if use <= budget:
            return R
    return None


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
    or None when no configuration fits (caller falls back to XLA).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, H, W, cnc = seg.shape
    hid_total = k1.shape[-1]
    hids = [kg.shape[2] for (kg, _, _, _) in branches]
    ncs = [kg.shape[3] for (kg, _, _, _) in branches]
    Ls = [2 * nc for nc in ncs]
    nb = len(branches)
    assert sum(hids) == hid_total, (hids, hid_total)
    assert k1.shape[:2] == (3, 3), "3x3 SPADE kernels only"
    if not interpret and any(h % 128 for h in hids):
        return None  # compiled: A3 lane blocks must be 128-aligned
    dt = seg.dtype
    dt_bytes = jnp.dtype(dt).itemsize

    # flat-layout geometry: width padded so the halo cols + roll
    # wraparound land in garbage lanes (W_pad >= W+4, multiple of 8)
    W_pad = _pad8(W + 4)
    # stage-1 contraction: 3 row x 5 column taps, lane-padded to 128
    # (DMA windows must span whole 128-lane tiles; still one MXU K-pass)
    ck = _pad128(15 * cnc)
    R = _pick_R(H, W_pad, ck, hids, Ls, dt_bytes)
    if R is None:
        return None
    M2 = (R + 2) * W_pad
    M1 = R * W_pad

    # host-side prep -------------------------------------------------------
    # im2col patches on the (H+2, W_pad) activation-halo grid, flattened to
    # (N, (H+2)*W_pad, ck): channel block (v', u) = seg zero-padded and
    # shifted by (u, v') for u in 0..2, v' in 0..4 (five column taps so the
    # v-shifted activations a_v, v in 0..2, fold into the weights:
    # a_v needs column taps v+w, w in 0..2). ~1 GB transient at the
    # flagship shapes, ~2.5 ms of HBM.
    seg_p = jnp.pad(
        seg, ((0, 0), (2, 2), (2, W_pad + 4 - W - 2), (0, 0)))
    pats = jnp.concatenate(
        [seg_p[:, u:u + H + 2, v:v + W_pad, :]
         for v in range(5) for u in range(3)], axis=-1)
    if ck > 15 * cnc:
        pats = jnp.pad(pats, ((0, 0), (0, 0), (0, 0), (0, ck - 15 * cnc)))
    pats = pats.reshape(N, (H + 2) * W_pad, ck).astype(dt)

    # stage-1 weights: lane block (b, v) of W1 = mlp_shared weights for
    # branch b reading the patch blocks (v + w, u); biases tiled to match
    # (assembled with traceable ops — spade_cond runs under jit)
    hid_off = [0]
    for h_ in hids:
        hid_off.append(hid_off[-1] + h_)
    w1_cols, b1_cols = [], []
    for b in range(nb):
        lo, hi = hid_off[b], hid_off[b + 1]
        hb = hi - lo
        for v in range(3):
            rows = []
            for vp in range(5):
                for u in range(3):
                    w = vp - v
                    rows.append(k1[u, w, :, lo:hi] if 0 <= w <= 2
                                else jnp.zeros((cnc, hb), k1.dtype))
            blk = jnp.concatenate(rows, axis=0)  # (15*cnc, hb)
            w1_cols.append(jnp.pad(blk, ((0, ck - 15 * cnc), (0, 0))))
            b1_cols.append(b1[lo:hi])
    W1j = jnp.concatenate(w1_cols, axis=1).astype(dt)
    B1j = jnp.concatenate(b1_cols).reshape(1, -1).astype(jnp.float32)

    # per-branch tap weights: K2 (3*hid_b, 3*L), contraction block v,
    # lane block u, each (hid_b, L) slab = [kg[u,v] | kb[u,v]]
    k2s, b2s = [], []
    for (kg, bg, kb, bb) in branches:
        rows = []
        for v in range(3):
            rows.append(jnp.concatenate(
                [jnp.concatenate([kg[u, v], kb[u, v]], axis=-1)
                 for u in range(3)], axis=-1))  # (hid_b, 3*L)
        k2s.append(jnp.concatenate(rows, axis=0).astype(dt))  # (3*hid_b, 3L)
        b2s.append(jnp.concatenate([bg, bb]).reshape(1, -1)
                   .astype(jnp.float32))

    if interpret:
        def _roll(x, k, axis):  # y[i] = x[i+k]
            return jnp.roll(x, -k, axis=axis)
    else:
        def _roll(x, k, axis):  # pltpu wants shift >= 0
            return pltpu.roll(x, (x.shape[axis] - k) % x.shape[axis],
                              axis=axis)

    def kernel(pats_ref, w1_ref, b1_ref, *rest):
        k2_refs = rest[:nb]
        b2_refs = rest[nb: 2 * nb]
        out_refs = rest[2 * nb: 3 * nb]
        scratch = rest[3 * nb:]
        n = pl.program_id(0)
        i = pl.program_id(1)

        if pltpu is not None and not interpret:
            pats_buf, sem = scratch
            dma = pltpu.make_async_copy(
                pats_ref.at[n, pl.ds(i * M1, M2), :], pats_buf, sem)
            dma.start()
            dma.wait()
            pb = pats_buf[:]
        else:  # interpreter: plain windowed read
            pb = pats_ref[n, pl.ds(i * M1, M2), :]

        # per-(branch, shift) validity of the shifted activation pixel:
        # position m maps to activation pixel m+v on the (H+2, W+2) halo
        # grid; outside the image it stands for the gamma/beta convs'
        # zero padding (it would hold relu(b1) otherwise)
        mu = jax.lax.broadcasted_iota(jnp.int32, (M2, 1), 0)
        masks = []
        for v in range(3):
            row = i * R + (mu + v) // W_pad - 1
            colx = (mu + v) % W_pad - 1
            ok = (row >= 0) & (row < H) & (colx >= 0) & (colx < W)
            masks.append(ok.astype(jnp.float32))

        # branch by branch so only one branch's buffers are live at once
        for b in range(nb):
            hb3 = 3 * hids[b]
            c0 = 3 * hid_off[b]
            hbv = hids[b]
            # stage 1: A3_b = [a_0 | a_1 | a_2] masked
            z = jnp.dot(pb, w1_ref[:, c0:c0 + hb3],
                        preferred_element_type=jnp.float32)
            z = jnp.maximum(z + b1_ref[:, c0:c0 + hb3], 0.0)
            a3 = jnp.concatenate(
                [(z[:, v * hbv:(v + 1) * hbv] * masks[v]).astype(dt)
                 for v in range(3)], axis=1)

            L = Ls[b]
            big = jnp.dot(a3, k2_refs[b][:],
                          preferred_element_type=jnp.float32)  # (M2, 3L)
            # combine tap rows: out[m] += big[m + u*W_pad, u*L:(u+1)*L]
            acc = big[:M1, :L]
            t = _roll(_roll(big, W_pad, 0), L, 1)
            acc = acc + t[:M1, :L]
            t = _roll(_roll(big, 2 * W_pad, 0), 2 * L, 1)
            acc = acc + t[:M1, :L]
            acc = acc + b2_refs[b][:, :]
            out_refs[b][0] = acc.astype(dt)

    grid = (N, H // R)
    w_spec = lambda a: pl.BlockSpec(  # noqa: E731 — full-array VMEM block
        a.shape, lambda n, i: (0,) * a.ndim, memory_space=_VMEM)
    in_specs = (
        [pl.BlockSpec(memory_space=_ANY)]                 # pats (HBM)
        + [w_spec(W1j), w_spec(B1j)]
        + [w_spec(k) for k in k2s]
        + [w_spec(b) for b in b2s]
    )
    out_specs = [
        pl.BlockSpec((1, M1, L), lambda n, i: (n, i, 0),
                     memory_space=_VMEM)
        for L in Ls
    ]
    scratch = []
    if pltpu is not None and not interpret:
        scratch = [pltpu.VMEM((M2, ck), dt), pltpu.SemaphoreType.DMA(())]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((N, H * W_pad, L), dt) for L in Ls],
        scratch_shapes=scratch,
        interpret=interpret,
    )(pats, W1j, B1j, *k2s, *b2s)
    return [o.reshape(N, H, W_pad, L)[:, :, :W, :] for o, L in zip(outs, Ls)]

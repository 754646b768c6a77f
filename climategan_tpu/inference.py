"""Fused inference pipeline: the reference's `Trainer.infer_all`
(climategan/trainer.py:217-334) as ONE jit-compiled XLA graph.

x (NHWC, [-1,1]) -> {flood, wildfire, smog [, mask]} uint8, with the masker
encoder shared across heads, bf16 compute on the MXU, and the event
compositing fused behind the model. Batch-sharded multi-chip execution is
layered on top in parallel/mesh.py — the function itself is
sharding-agnostic SPMD.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from climategan_tpu.events.fire import add_fire
from climategan_tpu.events.smog import add_smog
from climategan_tpu.models.generator import create_generator
from climategan_tpu.ops.image import unit_range_to_uint8


def build_infer_fn(
    opts,
    dtype=jnp.bfloat16,
    bin_value: float = 0.5,
    cloudy: bool = True,
    ignore_event: Tuple[str, ...] = (),
    quantize: bool = True,
    donate: bool = True,
    freeze_spectral: bool = False,
):
    """Returns (G, infer_fn) where infer_fn(variables, x, rng) is jitted.

    Mirrors the reference's infer_all contract: bin_value < 0 keeps smooth
    masks; `cloudy` routes flood painting through the perlin-cloud probe.
    """
    G = create_generator(opts)
    fire_opts = opts.events.get("fire", {}) or {}
    smog_opts = opts.events.get("smog", {}) or {}

    def infer(variables, x, rng):
        # trace-time switches: with freeze_spectral the caller passes
        # bake_spectral_norm(variables) and SNConv skips power iterations;
        # on TPU the s2d-stage SPADE conditioning runs as the fused Pallas
        # kernel (ops/pallas/spade.py, opts.tpu.pallas_spade)
        from contextlib import ExitStack

        from climategan_tpu.models.norms import frozen_spectral, pallas_spade

        with ExitStack() as stack:
            if freeze_spectral:
                stack.enter_context(frozen_spectral())
            if (jax.default_backend() == "tpu"
                    and bool(opts.tpu.get("pallas_spade", False))):
                stack.enter_context(pallas_spade())
            return _infer_body(variables, x, rng)

    def _infer_body(variables, x, rng):
        x = x.astype(dtype)
        d, s, m = G.apply(variables, x, method="infer_masker")

        out: Dict[str, Any] = {}
        rng_fire, rng_cloud, rng_paint = jax.random.split(rng, 3)

        if "flood" not in ignore_event:
            mb = (m > bin_value).astype(x.dtype) if bin_value >= 0 else m
            if cloudy:
                flood = G.apply(
                    variables, mb, x, s, rng_cloud, method="paint_cloudy"
                )
            else:
                flood = G.apply(
                    variables, mb, x,
                    rng=None if G.cfg.p_no_z else rng_paint,
                    method="paint",
                )
            out["flood"] = flood

        if "wildfire" not in ignore_event:
            out["wildfire"] = add_fire(
                x.astype(jnp.float32), s.astype(jnp.float32), rng_fire,
                kernel_size=int(fire_opts.get("kernel_size", 281)),
                kernel_sigma=float(fire_opts.get("kernel_sigma", 140.5)),
                crop_bottom_sky_mask=bool(
                    fire_opts.get("crop_bottom_sky_mask", True)
                ),
            )

        if "smog" not in ignore_event:
            out["smog"] = add_smog(
                x.astype(jnp.float32), d.astype(jnp.float32),
                airlight=float(smog_opts.get("airlight", 0.76)),
                beta=float(smog_opts.get("beta", 2.0)),
                vr=float(smog_opts.get("vr", 1.0)),
                yellow_color=tuple(smog_opts.get("yellow_color", (224, 192, 29))),
                alpha=float(smog_opts.get("alpha", 20.0)),
            )

        if quantize:
            out = {k: unit_range_to_uint8(v) for k, v in out.items()}
        out["mask"] = m
        return out

    jit_kwargs = {"donate_argnums": (1,)} if donate else {}
    return G, jax.jit(infer, **jit_kwargs)


def init_generator_variables(opts, rng, image_size: int = 640, dtype=jnp.float32):
    """Initialize all generator variables with a dummy forward."""
    G = create_generator(opts)
    x = jnp.zeros((1, image_size, image_size, 3), dtype)
    variables = G.init(rng, x)
    return G, variables

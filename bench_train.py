#!/usr/bin/env python
"""Training-step benchmark: full G+D update (masker ADVENT + painter GAN)
at 640x640, synthetic batches. The reference publishes no training numbers
(BASELINE.md); this measures ours on real hardware.

Prints one JSON line: images/sec/chip counting each domain sample once.
"""
from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2, help="per-domain batch")
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--feat", type=int, default=160)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--remat_d", action="store_true",
                    help="also rematerialize the D step (fits batch 3/domain "
                         "at 640^2, ~12%% slower per step)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize forward activations (fits larger "
                         "batches in HBM)")
    ap.add_argument("--policy", default="",
                    help="tpu.remat_policy: '' (full remat), 'dots' (save "
                         "every conv/matmul output), 'small_convs[:AREA]' "
                         "(save conv outputs with input spatial area <= "
                         "AREA px, default 160*160)")
    ap.add_argument("--mesh", action="store_true",
                    help="data-parallel training over all visible devices "
                         "(per-domain batch sharded; params replicated; "
                         "XLA inserts the gradient psum over ICI)")
    args = ap.parse_args()

    from climategan_tpu.train_step import StepBuilder
    from climategan_tpu.utils.opts import load_opts

    opts = load_opts()
    if args.remat:
        opts.tpu.remat = True
    if args.remat_d:
        opts.tpu.remat_d = True
    if args.policy:
        opts.tpu.remat_policy = args.policy
    builder = StepBuilder(opts, vgg_variables=None)
    rng = jax.random.PRNGKey(0)
    n, size, feat = args.batch, args.size, args.feat
    r = np.random.RandomState(0)

    def img(*s):
        return r.uniform(-1, 1, s).astype(np.float32)

    def mk():
        return (r.rand(n, size, size, 1) > 0.5).astype(np.float32)

    batch = {
        "r": {"x": img(n, size, size, 3), "m": mk()},
        "s": {
            "x": img(n, size, size, 3),
            "d": r.uniform(0.01, 1, (n, feat, feat, 1)).astype(np.float32),
            "s": r.randint(0, 11, (n, feat, feat)).astype(np.int32),
            "m": mk(),
        },
        "rf": {"x": img(n, size, size, 3), "m": mk()},
    }

    print("initializing...", file=sys.stderr)
    state = builder.init_state(rng, batch)
    n_chips = 1
    if args.mesh and len(jax.devices()) > 1:
        from climategan_tpu.parallel.mesh import (
            make_mesh, replicate, shard_batch,
        )

        n_chips = max(d for d in range(1, len(jax.devices()) + 1)
                      if args.batch % d == 0)
        mesh = make_mesh(n_chips)
        state = replicate(mesh, state)
        batch = shard_batch(mesh, batch)
        print(f"data-parallel training over {n_chips} devices",
              file=sys.stderr)
    else:
        batch = jax.device_put(batch)
    step = jax.jit(builder.train_step, donate_argnums=(0,))

    # analytic FLOPs of the compiled G+D step (training-side roofline;
    # same cost_analysis() source as bench.py)
    flops_per_step = None
    try:
        ca = step.lower(state, batch).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        if ca:
            flops_per_step = float(ca.get("flops", 0.0)) or None
    except Exception as e:
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)

    print("compiling train step...", file=sys.stderr)
    for _ in range(args.warmup):
        state, metrics = step(state, batch)
        jax.block_until_ready(metrics)
        float(metrics["g_total"])  # hard sync

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        state, metrics = step(state, batch)
        float(metrics["g_total"])  # device->host sync
        times.append(time.perf_counter() - t0)

    p50 = statistics.median(times)
    imgs = 3 * args.batch  # r + s + rf samples per step
    roofline = {}
    if flops_per_step:
        achieved = flops_per_step / p50 / n_chips / 1e12
        roofline = {
            "tflops_per_step": round(flops_per_step / 1e12, 3),
            "achieved_tflops_per_chip": round(achieved, 2),
        }
    print(json.dumps({
        "metric": f"train images/sec/chip at {size}x{size} "
                  "(G+D ExtraAdam step, 3 domains)",
        "value": round(imgs / p50 / n_chips, 3),
        "n_devices": n_chips,
        "global_imgs_per_sec": round(imgs / p50, 3),
        "unit": "images/sec/chip",
        "vs_baseline": 0,
        "p50_step_latency_s": round(p50, 4),
        "per_domain_batch": args.batch,
        **roofline,
        "g_loss": round(float(metrics["g_total"]), 4),
        "d_loss": round(float(metrics["d_total"]), 4),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Benchmark: images/sec/chip at 640x640 bf16 flood inference (Masker +
Painter), the north-star metric from BASELINE.json.

Runs on whatever accelerator JAX sees (the driver runs it on a real TPU
chip). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

vs_baseline: the reference repo publishes no numbers (BASELINE.md), so two
baselines are reported:
  * vs_baseline — against the documented engineering estimate of the
    PyTorch reference at fp16 on a V100 (~12 img/s full flood at 640^2,
    BASELINE.md "North-star"); the driver goal of ">= 2x V100" reads as
    vs_baseline >= 2.0. Labeled an estimate: no V100 exists here.
  * MEASURED same-host baseline — scripts/bench_reference_torch.py runs
    the reference's own Timer harness (apply_events.py:356-374) and this
    framework on the SAME CPU (BASELINE config 1: batch 1 fp32 640^2
    flood; stage-by-stage table in BENCH_NOTES.md "Round 3"). That
    measured torch-vs-jax ratio is reported as measured_cpu_speedup when
    BENCH_NOTES records it.
"""
from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp

# persistent compile cache (first compile of the fused graph is slow)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REF_V100_IMGS_PER_SEC = 12.0  # documented estimate, see module docstring


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--stage", choices=["all", "masker", "painter"],
                    default="all", help="isolate a pipeline stage")
    ap.add_argument("--mesh", action="store_true",
                    help="shard the batch across all visible devices "
                         "(data-parallel inference; reports per-chip rate)")
    ap.add_argument("--spatial", action="store_true",
                    help="shard image ROWS across all visible devices "
                         "(model-parallel inference for huge images at "
                         "small batch; XLA inserts the conv halo "
                         "exchanges)")
    ap.add_argument("--config", type=int, default=0,
                    help="BASELINE.json config shortcut: 1=single-image "
                         "flood fp32, 2=smog only, 3=wildfire only, "
                         "4=batched bf16 all events")
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--events",
                    choices=["flood", "smog", "wildfire", "all"],
                    default="flood")
    ap.add_argument("--dtype", choices=["bfloat16", "float32"],
                    default="bfloat16")
    args = ap.parse_args()

    from climategan_tpu.inference import build_infer_fn
    from climategan_tpu.utils.opts import load_opts

    opts = load_opts()
    if args.config == 1:  # single-image flood fp32
        args.batch, args.dtype, args.events = 1, "float32", "flood"
    elif args.config == 2:  # smog only
        args.events = "smog"
    elif args.config == 3:  # wildfire only
        args.events = "wildfire"
    elif args.config == 4:  # batched bf16 all events
        args.events, args.dtype = "all", "bfloat16"

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    ignore_map = {
        "flood": ("wildfire", "smog"),
        "smog": ("wildfire", "flood"),
        "wildfire": ("smog", "flood"),
        "all": (),
    }
    ignore = ignore_map[args.events]

    G, infer = build_infer_fn(opts, dtype=dtype, ignore_event=ignore,
                              donate=False, freeze_spectral=True)
    if args.stage == "masker":
        infer = jax.jit(lambda v, x, r: {
            "mask": G.apply(v, x.astype(dtype), method="infer_masker")[2]
        })
    elif args.stage == "painter":
        infer = jax.jit(lambda v, x, r: {
            "paint": G.apply(
                v, (x[..., :1] > 0).astype(dtype), x.astype(dtype),
                method="paint",
            )
        })
    rng = jax.random.PRNGKey(0)
    print("initializing params...", file=sys.stderr)
    x0 = jnp.zeros((1, args.size, args.size, 3), jnp.float32)
    variables = jax.jit(G.init)(rng, x0)
    from climategan_tpu.utils.bn_fold import bake_spectral_norm

    variables = jax.device_put(bake_spectral_norm(variables))

    x = jax.random.uniform(
        rng, (args.batch, args.size, args.size, 3),
        minval=-1.0, maxval=1.0,
    )
    n_chips = 1
    if (args.mesh or args.spatial) and len(jax.devices()) > 1:
        from climategan_tpu.parallel.mesh import (
            make_mesh, replicate, shard_batch, shard_spatial,
        )

        if args.spatial:
            # model-parallel: rows sharded, XLA inserts conv halo
            # exchanges — the huge-image small-batch serving mode
            n_chips = max(d for d in range(1, len(jax.devices()) + 1)
                          if args.size % d == 0)
            mesh = make_mesh(n_chips)
            x = shard_spatial(mesh, x)
            print(f"spatial (row) sharding over {n_chips} devices",
                  file=sys.stderr)
        else:
            n_chips = max(d for d in range(1, len(jax.devices()) + 1)
                          if args.batch % d == 0)
            mesh = make_mesh(n_chips)
            x = shard_batch(mesh, x)
            print(f"data-parallel over {n_chips} devices", file=sys.stderr)
        variables = replicate(mesh, variables)
    else:
        x = jax.device_put(x)

    def sync(out):
        # On the remote-tunnel platform block_until_ready can return before
        # execution completes; a device->host readback of one element is an
        # unambiguous full sync.
        jax.block_until_ready(out)
        import numpy as _np

        for v in out.values():
            _np.asarray(v[0, 0, 0])

    print("compiling fused inference graph...", file=sys.stderr)
    for _ in range(args.warmup):
        out = infer(variables, x, rng)
        sync(out)

    # latency: one batch in flight, full sync each iteration
    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        out = infer(variables, x, rng)
        sync(out)
        times.append(time.perf_counter() - t0)
    p50 = statistics.median(times)

    # throughput: dispatch every batch asynchronously and drain once at the
    # end — executions on one device stream are ordered, so one readback of
    # the last batch proves all prior batches completed. This is the
    # steady-state serving pattern (apply_events.py overlaps compute/write
    # the same way); device occupancy, not tunnel latency, is what img/s
    # measures.
    out = None
    t_all0 = time.perf_counter()
    for i in range(args.iters):
        # only the newest handle is retained: stream order makes its
        # readback prove all prior batches completed, and dropping old
        # handles keeps HBM O(1) in --iters
        out = infer(variables, x, rng)
    sync(out)
    wall = time.perf_counter() - t_all0

    imgs_per_sec = args.batch * args.iters / wall
    n_dev = max(1, len(jax.devices()))
    per_chip = imgs_per_sec / n_chips

    measured = {}
    try:  # measured same-host CPU baseline, if recorded (see docstring);
        # only attached to the workloads it describes (640^2 all/flood)
        from pathlib import Path

        mp = Path(__file__).parent / "BASELINE_MEASURED.json"
        if mp.exists() and args.size == 640 and args.events in ("all",
                                                                "flood"):
            mj = json.loads(mp.read_text())
            measured = {
                "measured_cpu_speedup_all_events":
                    mj.get("measured_cpu_speedup_all_events"),
                "measured_baseline_config": mj.get("config"),
            }
    except Exception:
        measured = {}

    result = {
        "metric": (
            f"images/sec/chip at {args.size}x{args.size} "
            f"{args.dtype} {args.events} inference (Masker+Painter)"
        ),
        "value": round(per_chip, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / REF_V100_IMGS_PER_SEC, 3),
        **measured,
        "p50_batch_latency_s": round(p50, 4),
        "latency_imgs_per_sec": round(args.batch / p50, 3),
        "batch": args.batch,
        "n_devices_visible": n_dev,
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

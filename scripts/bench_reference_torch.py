#!/usr/bin/env python
"""Measure the PyTorch reference's inference performance with ITS OWN
timing harness, then run the JAX pipeline on the same host CPU with the
same stage names — the measured baseline BASELINE.md calls for.

The reference publishes no numbers; its measurement surface is the
per-stage Timer stores threaded through ``Trainer.infer_all``
(/root/reference/climategan/trainer.py:269-312) and printed by
``apply_events.py`` (:356-374, :244-291). This script builds the real
reference Trainer (random weights — identical architecture/FLOPs to the
released ones), feeds it the store dict with the reference's own stage
keys, and reports mean ± std s/batch per stage. With --jax it then times
the JAX implementation of each stage on the same CPU for an
apples-to-apples table (config 1 of BASELINE.json: batch 1, fp32, 640²).

Usage:
  python scripts/bench_reference_torch.py --size 640 --iters 3 [--jax]

Output: one JSON line with both stage tables + totals.
"""
from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from collections import OrderedDict
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def stage_stores():
    """Reference stage keys (apply_events.py:356-374)."""
    return OrderedDict(
        (k, [])
        for k in ("encode", "depth", "segmentation", "mask", "wildfire",
                  "smog", "flood", "numpy", "all events")
    )


def summarize(stores, purge=1):
    out = {}
    for k, v in stores.items():
        if not v:
            continue
        vv = v[purge:] if len(v) > purge else v
        out[k] = {"mean_s": round(float(np.mean(vv)), 4),
                  "std_s": round(float(np.std(vv)), 4)}
    return out


def bench_reference(size, iters, batch, cloudy, seed=0):
    import torch

    from tests.reference_import import build_ref_trainer

    torch.manual_seed(seed)
    t_setup0 = time.perf_counter()
    tr = build_ref_trainer(tempfile.mkdtemp())
    setup_s = time.perf_counter() - t_setup0

    x = np.random.RandomState(seed).uniform(
        -1, 1, (batch, size, size, 3)).astype(np.float32)
    stores = stage_stores()
    for _ in range(iters):
        tr.infer_all(x, numpy=True, stores=stores, cloudy=cloudy,
                     bin_value=0.5)
    return {"setup_s": round(setup_s, 2), "stages": summarize(stores)}


def bench_jax_cpu(size, iters, batch, cloudy, seed=0):
    """Same stages, JAX on CPU. Stage fns are jitted separately so the
    split mirrors the reference's mark_step boundaries; 'all events' uses
    the production fused single-graph path."""
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from climategan_tpu.events.fire import add_fire
    from climategan_tpu.events.smog import add_smog
    from climategan_tpu.inference import build_infer_fn
    from climategan_tpu.models.generator import create_generator
    from climategan_tpu.utils.opts import load_opts

    opts = load_opts()
    G = create_generator(opts)
    rng = jax.random.PRNGKey(seed)
    x = jnp.asarray(np.random.RandomState(seed).uniform(
        -1, 1, (batch, size, size, 3)).astype(np.float32))
    t0 = time.perf_counter()
    variables = jax.jit(G.init)(rng, x[:1])
    setup_s = time.perf_counter() - t0

    fire_opts = opts.events.get("fire", {}) or {}
    smog_opts = opts.events.get("smog", {}) or {}

    enc = jax.jit(lambda v, x: G.apply(v, x, method="encode"))
    dep = jax.jit(lambda v, z: G.apply(v, z, method="depth"))
    seg = jax.jit(lambda v, z, zd: G.apply(v, z, zd, method="segmentation"))

    def _mask(v, x, z, d, s, zd):
        cond = G.apply(v, d, s, x, method="make_m_cond")
        return G.apply(v, method="mask", z=z, cond=cond, z_depth=zd)

    msk = jax.jit(_mask)
    fld = jax.jit(lambda v, m, x: G.apply(
        v, (m > 0.5).astype(x.dtype), x, method="paint"))
    smg = jax.jit(lambda x, d: add_smog(
        x, d,
        airlight=float(smog_opts.get("airlight", 0.76)),
        beta=float(smog_opts.get("beta", 2.0)),
        vr=float(smog_opts.get("vr", 1.0)),
        yellow_color=tuple(smog_opts.get("yellow_color", (224, 192, 29))),
        alpha=float(smog_opts.get("alpha", 20.0))))
    wfr = jax.jit(lambda x, s, r: add_fire(
        x, s, r,
        kernel_size=int(fire_opts.get("kernel_size", 281)),
        kernel_sigma=float(fire_opts.get("kernel_sigma", 140.5)),
        crop_bottom_sky_mask=bool(
            fire_opts.get("crop_bottom_sky_mask", True))))
    _, fused = build_infer_fn(opts, dtype=jnp.float32, cloudy=cloudy,
                              donate=False)

    stores = stage_stores()

    def run(store, fn, *args):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        stores[store].append(time.perf_counter() - t0)
        return out

    for i in range(iters + 1):  # +1 warmup iteration (compile), purged
        if i == 1:
            for v in stores.values():
                v.clear()
        z = run("encode", enc, variables, x)
        d, zd = run("depth", dep, variables, z)
        s = run("segmentation", seg, variables, z, zd)
        m = run("mask", msk, variables, x, z, d, s, zd)
        run("wildfire", wfr, x, s, rng)
        run("smog", smg, x, d)
        run("flood", fld, variables, m, x)
        t0 = time.perf_counter()
        out = jax.block_until_ready(fused(variables, x, rng))
        stores["all events"].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _ = {k: np.asarray(v) for k, v in out.items()}
        stores["numpy"].append(time.perf_counter() - t0)

    return {"setup_s": round(setup_s, 2), "stages": summarize(stores, 0)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--cloudy", action="store_true")
    ap.add_argument("--jax", action="store_true",
                    help="also time the JAX pipeline on this CPU")
    ap.add_argument("--skip-torch", action="store_true")
    ap.add_argument("--write", type=str, default=None,
                    help="also write the JSON result to this path "
                         "(e.g. BASELINE_MEASURED.json at the repo root, "
                         "which bench.py folds into its output)")
    args = ap.parse_args()

    result = {"config": {"size": args.size, "batch": args.batch,
                         "iters": args.iters, "dtype": "float32",
                         "device": "cpu (same host, both frameworks)"}}
    if not args.skip_torch:
        print("timing reference (torch CPU)...", file=sys.stderr)
        result["reference_torch"] = bench_reference(
            args.size, args.iters, args.batch, args.cloudy)
    if args.jax:
        print("timing climategan_tpu (JAX CPU)...", file=sys.stderr)
        result["climategan_tpu_jax"] = bench_jax_cpu(
            args.size, args.iters, args.batch, args.cloudy)
    if ("reference_torch" in result and "climategan_tpu_jax" in result):
        t = result["reference_torch"]["stages"].get("all events")
        j = result["climategan_tpu_jax"]["stages"].get("all events")
        if t and j and j["mean_s"] > 0:
            result["measured_cpu_speedup_all_events"] = round(
                t["mean_s"] / j["mean_s"], 3)
    if args.write:
        with open(args.write, "w") as f:
            json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

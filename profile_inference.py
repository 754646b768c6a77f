#!/usr/bin/env python
"""Profiling harness: trace the fused inference graph with jax.profiler and
print an aggregated per-op time table (the TPU answer to the reference's
CUDA-event Timer stores — SURVEY.md §5).

Usage:
  python profile_inference.py --batch 24 --events flood --out /tmp/prof
The raw trace (vm.trace.json.gz / xplane.pb) can be opened in TensorBoard
or Perfetto; the table below is a quick terminal summary.
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import sys


def _device_events(trace):
    """Yield (dur_us, fusion_name, source_path) for device-track HLO ops.

    Device tracks are identified by process_name metadata ("/device:...");
    the source path comes from each op's source_info/tf_op arg, which XLA
    populates with the jit(...)/Module.method/submodule/op trail."""
    dev_pids = set()
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            if "/device:" in (e.get("args") or {}).get("name", ""):
                dev_pids.add(e["pid"])
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        if name.startswith(("$", "np.", "jit_", "Pjit")):
            continue  # envelope events on the device track
        a = e.get("args") or {}
        src = a.get("source_info") or a.get("tf_op") or ""
        yield e["dur"], name, src


# module-path substrings -> pipeline stage labels for the per-stage table
_STAGES = (
    ("OmniGenerator.encode", "masker/encoder"),
    ("seg_decoder", "masker/seg_decoder"),
    ("depth_decoder", "masker/depth_decoder"),
    ("OmniGenerator.mask", "masker/mask_decoder"),
    ("painter/", None),  # label = painter/<next path element>
    ("paint", "painter/other"),
    ("infer_masker", "masker/other"),
)


def _stage_of(src: str) -> str:
    for needle, label in _STAGES:
        if needle in src:
            if label is not None:
                return label
            tail = src.split("painter/", 1)[1]
            return "painter/" + (tail.split("/", 1)[0].rstrip(":") or "other")
    return "events+misc" if src else "(no source)"


def summarize(trace_dir: str, top: int = 25, iters: int = 1):
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print("no trace found", file=sys.stderr)
        return
    with gzip.open(paths[-1]) as f:
        trace = json.load(f)
    agg = collections.Counter()
    stages = collections.Counter()
    total = 0.0
    for dur, name, src in _device_events(trace):
        agg[name] += dur
        stages[_stage_of(src)] += dur
        total += dur
    if total:
        print(f"\ndevice time by pipeline stage "
              f"({total / 1e3 / iters:.1f} ms/iter total):")
        for stage, dur in stages.most_common():
            print(f"{dur / 1e3 / iters:10.2f} ms  {100 * dur / total:5.1f}%  "
                  f"{stage}")
    print(f"\ntop {top} device ops by total time:")
    for name, dur in agg.most_common(top):
        print(f"{dur / 1e3:10.2f} ms  {name[:100]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--events", choices=["flood", "all"], default="flood")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--out", default="/tmp/climategan_prof")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--train", action="store_true",
                    help="profile the full G+D train step instead of "
                         "inference (batch = per-domain batch)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

    from climategan_tpu.inference import build_infer_fn
    from climategan_tpu.utils.bn_fold import bake_spectral_norm
    from climategan_tpu.utils.opts import load_opts

    opts = load_opts()

    if args.train:
        from climategan_tpu.train_step import StepBuilder

        if args.size < 128:  # full painter needs >= 2^spade_n_up = 128:
            from climategan_tpu.utils.testing import tiny_opts

            opts = tiny_opts(image_size=args.size)  # CPU smoke mode
        opts.train.bf16 = True
        opts.tpu.remat = True
        builder = StepBuilder(opts)
        rng = jax.random.PRNGKey(0)
        # d/s supervision targets must match the decoder output size the
        # opts pin (GenConfig.d_target_size, 160 for the flagship config)
        from climategan_tpu.models.generator import GenConfig

        feat = int(GenConfig.from_opts(opts).d_target_size)
        b, s = args.batch, args.size
        rs = np.random.RandomState(0)

        def dom(sup):
            d = {"x": jnp.asarray(rs.uniform(-1, 1, (b, s, s, 3)),
                                  jnp.float32),
                 "m": jnp.asarray(rs.randint(0, 2, (b, s, s, 1)),
                                  jnp.float32)}
            if sup:
                d["d"] = jnp.asarray(rs.uniform(0.1, 10, (b, feat, feat, 1)),
                                     jnp.float32)
                d["s"] = jnp.asarray(rs.randint(0, 11, (b, feat, feat)),
                                     jnp.int32)
            return d

        batch = {"r": dom(False), "s": dom(True), "rf": dom(False)}
        print("initializing/compiling train step...", file=sys.stderr)
        state = builder.init_state(rng, batch)
        step = jax.jit(builder.train_step, donate_argnums=(0,))
        state, m = step(state, batch, 1.0, 1.0, 1.0)
        np.asarray(next(iter(m.values())))
        with jax.profiler.trace(args.out):
            for _ in range(args.iters):
                state, m = step(state, batch, 1.0, 1.0, 1.0)
                np.asarray(next(iter(m.values())))
        print(f"trace written to {args.out}")
        summarize(args.out, args.top, args.iters)
        return
    ignore = ("wildfire", "smog") if args.events == "flood" else ()
    G, infer = build_infer_fn(opts, dtype=jnp.bfloat16, ignore_event=ignore,
                              donate=False, freeze_spectral=True)
    rng = jax.random.PRNGKey(0)
    variables = bake_spectral_norm(
        jax.jit(G.init)(rng, jnp.zeros((1, args.size, args.size, 3)))
    )
    x = jax.random.uniform(rng, (args.batch, args.size, args.size, 3),
                           minval=-1, maxval=1)
    out = infer(variables, x, rng)
    np.asarray(out["flood"][0, 0, 0])  # warm / compile

    with jax.profiler.trace(args.out):
        for _ in range(args.iters):
            out = infer(variables, x, rng)
            np.asarray(out["flood"][0, 0, 0])
    print(f"trace written to {args.out}")
    summarize(args.out, args.top, args.iters)


if __name__ == "__main__":
    main()

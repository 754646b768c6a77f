#!/usr/bin/env python
"""Benchmark: images/sec/chip at 640x640 bf16 flood inference (Masker +
Painter), the north-star metric from BASELINE.json.

Runs on whatever accelerator JAX sees (the driver runs it on a real TPU
chip). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Resilience (round-3 VERDICT item 3: a transient TPU-backend flake voided
the round's headline metric): the parent process never touches the jax
backend. It first probes ``jax.devices()`` in a time-boxed subprocess,
retrying with backoff for a few minutes (the remote-TPU plugin is known
to hang on init), then runs the actual benchmark in a wall-clock-bounded
child. On unrecoverable failure it emits ONE structured JSON line
(``{"error": "tpu_backend_unavailable", ...}``) so the driver records a
diagnosis instead of a stack trace.

Roofline (round-3 VERDICT item 4): the child reports analytic FLOPs from
XLA ``cost_analysis()`` on the compiled graph — FLOPs/image, achieved
TFLOP/s, and MFU against the chip's bf16 peak.

vs_baseline: the reference repo publishes no numbers (BASELINE.md), so two
baselines are reported:
  * vs_baseline — against the MEASURED same-host reference ratio when the
    workload matches BASELINE_MEASURED.json (scripts/bench_reference_torch.py
    runs the reference's own Timer harness, apply_events.py:356-374, and
    this framework on the SAME CPU), scaled by the measured CPU img/s;
    falls back to the documented engineering estimate of the PyTorch
    reference at fp16 on a V100 (~12 img/s full flood at 640^2,
    BASELINE.md "North-star") when no measured number applies. The driver
    goal of ">= 2x V100" reads as vs_v100_estimate >= 2.0.
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REF_V100_IMGS_PER_SEC = 12.0  # documented estimate, see module docstring

# bf16 peak TFLOP/s per chip by device kind (public spec sheets); used for
# the MFU denominator. Matched as lowercase substrings of
# jax.devices()[0].device_kind.
_PEAK_BF16_TFLOPS = (
    ("v5 lite", 197.0), ("v5litepod", 197.0), ("v5e", 197.0),
    ("v5p", 459.0),
    ("v6 lite", 918.0), ("v6e", 918.0), ("trillium", 918.0),
    ("v4", 275.0),
    ("v3", 123.0),
    ("v2", 45.0),
)

_CHILD_ENV = "_CLIMATEGAN_BENCH_CHILD"


def build_parser():
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
    ap.add_argument("--hybrid", type=int, default=0, metavar="SP",
                    help="2-D hybrid mesh: SP-way row sharding x "
                         "(devices/SP)-way batch sharding (the layout "
                         "for huge images at throughput batch sizes; "
                         "see BENCH_NOTES hybrid section)")
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
    ap.add_argument("--in_process", action="store_true",
                    help="skip the probe/child isolation and run in this "
                         "process (tests, pre-probed environments)")
    ap.add_argument("--probe_timeout", type=int, default=120,
                    help="seconds per backend probe attempt")
    ap.add_argument("--probe_retries", type=int, default=5,
                    help="probe attempts before declaring the backend down "
                         "(backoff 20/40/80/160s between attempts: the "
                         "backend's observed init flakes recover within "
                         "minutes — round 5 watched one outlast a 140s "
                         "window and clear by 6 min)")
    ap.add_argument("--bench_timeout", type=int, default=3300,
                    help="wall-clock bound on the benchmark child (s); the "
                         "640^2 fused-graph TPU compile alone is ~25 min "
                         "cold over the tunnel (cached at "
                         "/tmp/jax_cache_tpu after)")
    return ap


def _emit_error(kind: str, detail: str, args) -> None:
    """The structured single-line failure contract (driver-parseable)."""
    print(json.dumps({
        "error": kind,
        "metric": (
            f"images/sec/chip at {args.size}x{args.size} "
            f"{args.dtype} {args.events} inference (Masker+Painter)"
        ),
        "value": 0.0,
        "unit": "images/sec/chip",
        "vs_baseline": 0.0,
        "detail": detail[-1500:],
    }))


def probe_backend(timeout_s: int, retries: int) -> str:
    """Time-boxed ``jax.devices()`` in a fresh subprocess, with backoff.

    The remote-TPU PJRT plugin can HANG (not error) on init — round 3's
    driver bench died this way — so the probe must be a separate process
    the parent can kill. Returns "" on success, else a failure summary."""
    last = ""
    code = ("import jax; d = jax.devices(); "
            "print('PROBE_OK', d[0].platform, len(d))")
    waits = [0] + [20 * (2 ** i) for i in range(max(retries - 1, 0))]
    for attempt, wait in enumerate(waits):
        if wait:
            print(f"probe retry in {wait}s (attempt "
                  f"{attempt + 1}/{len(waits)})...", file=sys.stderr)
            time.sleep(wait)
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code], capture_output=True,
                text=True, timeout=timeout_s,
            )
        except subprocess.TimeoutExpired:
            last = f"probe hung >{timeout_s}s (backend init deadlock)"
            print(last, file=sys.stderr)
            continue
        if proc.returncode == 0 and "PROBE_OK" in proc.stdout:
            print(f"backend probe ok: {proc.stdout.strip()}",
                  file=sys.stderr)
            return ""
        last = (f"probe rc={proc.returncode}: "
                f"{(proc.stderr or proc.stdout)[-800:]}")
        print(last, file=sys.stderr)
    return last or "probe never ran"


def main():
    args = build_parser().parse_args()
    if args.in_process or os.environ.get(_CHILD_ENV) == "1":
        return run_bench(args)

    # 1) time-boxed backend probe with backoff
    failure = probe_backend(args.probe_timeout, args.probe_retries)
    if failure:
        _emit_error("tpu_backend_unavailable", failure, args)
        return 0

    # 2) wall-clock-bounded benchmark child (a probe success does not
    #    guarantee the long compile+run path can't wedge)
    env = dict(os.environ)
    env[_CHILD_ENV] = "1"
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
            env=env, timeout=args.bench_timeout, text=True,
            capture_output=True,
        )
    except subprocess.TimeoutExpired as e:
        tail = ((e.stderr or "") if isinstance(e.stderr, str) else "")
        _emit_error(
            "bench_timeout",
            f"benchmark child exceeded {args.bench_timeout}s; stderr tail: "
            f"{tail[-800:]}", args)
        return 0
    sys.stderr.write(proc.stderr)
    if proc.returncode != 0:
        _emit_error(
            "bench_child_failed",
            f"rc={proc.returncode}; stderr tail: {proc.stderr[-1200:]}",
            args)
        return 0
    # forward the child's stdout (the JSON line) verbatim
    sys.stdout.write(proc.stdout)
    return 0


def run_bench(args):
    import jax
    import jax.numpy as jnp

    # persistent compile cache (first compile of the fused graph is slow)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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
    if args.hybrid and len(jax.devices()) > 1:
        from climategan_tpu.parallel.mesh import (
            make_mesh_2d, replicate, shard_hybrid,
        )

        n_dev_avail = len(jax.devices())
        sp = args.hybrid
        assert args.size % sp == 0, (
            f"--hybrid {sp}: size {args.size} must divide by the row "
            f"shard count")
        dp = max(d for d in range(1, n_dev_avail // sp + 1)
                 if args.batch % d == 0)
        n_chips = dp * sp
        if n_chips < n_dev_avail:
            print(f"WARNING: hybrid dp{dp}xsp{sp} uses {n_chips} of "
                  f"{n_dev_avail} devices", file=sys.stderr)
        mesh = make_mesh_2d(dp, sp)
        x = shard_hybrid(mesh, x)
        variables = replicate(mesh, variables)
        print(f"hybrid dp{dp}xsp{sp} sharding over {n_chips} devices",
              file=sys.stderr)
    elif (args.mesh or args.spatial) and len(jax.devices()) > 1:
        from climategan_tpu.parallel.mesh import (
            make_mesh, replicate, shard_batch, shard_spatial,
        )

        n_dev_avail = len(jax.devices())
        if args.spatial:
            # model-parallel: rows sharded, XLA inserts conv halo
            # exchanges — the huge-image small-batch serving mode
            n_chips = max(d for d in range(1, n_dev_avail + 1)
                          if args.size % d == 0)
            if n_chips < n_dev_avail:
                print(f"WARNING: size {args.size} not divisible by "
                      f"{n_dev_avail} devices; using {n_chips} and idling "
                      f"{n_dev_avail - n_chips} (pick --size divisible by "
                      f"the device count to use the full mesh)",
                      file=sys.stderr)
            mesh = make_mesh(n_chips)
            x = shard_spatial(mesh, x)
            print(f"spatial (row) sharding over {n_chips} devices",
                  file=sys.stderr)
        else:
            n_chips = max(d for d in range(1, n_dev_avail + 1)
                          if args.batch % d == 0)
            if n_chips < n_dev_avail:
                print(f"WARNING: batch {args.batch} not divisible by "
                      f"{n_dev_avail} devices; using {n_chips} and idling "
                      f"{n_dev_avail - n_chips} (pick --batch divisible by "
                      f"the device count to use the full mesh)",
                      file=sys.stderr)
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

    # analytic cost of the compiled graph (VERDICT r3 item 4: roofline the
    # pipeline). cost_analysis reports the logical HLO flops of this exact
    # executable — the standard MFU numerator (padding/MXU-lane waste makes
    # the HARDWARE busier than this number shows; see BENCH_NOTES roofline)
    flops_per_batch = bytes_per_batch = None
    try:
        ca = infer.lower(variables, x, rng).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):  # older jax returns [dict]
            ca = ca[0]
        if ca:
            flops_per_batch = float(ca.get("flops", 0.0)) or None
            bytes_per_batch = float(ca.get("bytes accessed", 0.0)) or None
    except Exception as e:  # cost analysis must never kill the bench
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)

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

    dev0 = jax.devices()[0]
    device_kind = getattr(dev0, "device_kind", dev0.platform)
    peak_tflops = None
    if dev0.platform == "tpu":
        kind_l = str(device_kind).lower()
        for key, peak in _PEAK_BF16_TFLOPS:
            if key in kind_l:
                peak_tflops = peak
                break

    roofline = {}
    if flops_per_batch:
        # per-chip achieved TFLOP/s from the throughput phase
        achieved = flops_per_batch * args.iters / wall / n_chips / 1e12
        roofline = {
            "gflops_per_image": round(flops_per_batch / args.batch / 1e9, 2),
            "achieved_tflops_per_chip": round(achieved, 2),
        }
        if bytes_per_batch:
            roofline["gbytes_accessed_per_image"] = round(
                bytes_per_batch / args.batch / 1e9, 3)
            roofline["arithmetic_intensity_flops_per_byte"] = round(
                flops_per_batch / bytes_per_batch, 1)
        if peak_tflops:
            roofline["mfu"] = round(achieved / peak_tflops, 4)
            roofline["peak_bf16_tflops_assumed"] = peak_tflops

    measured = {}
    try:  # measured same-host CPU baseline, if recorded (see docstring);
        # only attached to the workloads it describes (640^2 all/flood)
        from pathlib import Path

        mp = Path(__file__).parent / "BASELINE_MEASURED.json"
        if mp.exists() and args.size == 640 and args.events in ("all",
                                                                "flood"):
            mj = json.loads(mp.read_text())
            ref_all_s = (mj.get("reference_torch", {}).get("stages", {})
                         .get("all events", {}).get("mean_s"))
            measured = {
                # MEASURED numbers first (VERDICT r3): same-host torch-vs-
                # jax ratio, and this chip vs the measured torch-CPU
                # reference throughput (cross-hardware, labeled as such)
                "measured_cpu_speedup_all_events":
                    mj.get("measured_cpu_speedup_all_events"),
                "measured_baseline_config": mj.get("config"),
            }
            if ref_all_s:
                measured["vs_measured_torch_cpu_reference"] = round(
                    per_chip * float(ref_all_s), 1)
    except Exception:
        measured = {}

    result = {
        "metric": (
            f"images/sec/chip at {args.size}x{args.size} "
            f"{args.dtype} {args.events} inference (Masker+Painter)"
        ),
        "value": round(per_chip, 3),
        "unit": "images/sec/chip",
        **measured,
        # the driver's ">= 2x V100" goal reads vs_baseline; the 12 img/s
        # V100 figure is a documented ESTIMATE (no V100 exists here) —
        # the measured fields above are the ground truth
        "vs_baseline": round(per_chip / REF_V100_IMGS_PER_SEC, 3),
        "vs_baseline_basis": "v100_fp16_estimate_12_imgs_per_sec",
        **roofline,
        "p50_batch_latency_s": round(p50, 4),
        "latency_imgs_per_sec": round(args.batch / p50, 3),
        "batch": args.batch,
        "n_devices_visible": n_dev,
        "platform": dev0.platform,
        "device_kind": str(device_kind),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Batch inference CLI: render flood / wildfire / smog onto a folder of
street-level images.

Re-design of reference apply_events.py: same flag surface and per-stage
Timer report, but the whole model+events pipeline is ONE jitted bf16 XLA
graph per input shape (the reference runs 8 separate stages with host
round-trips).

Usage:
  python apply_events.py -i ./images -o ./outputs -r ./model_dir -b 8
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("-i", "--images_paths", type=str, required=True,
                   help="Path to a directory with image files")
    p.add_argument("-o", "--output_path", type=str, default=None,
                   help="Output directory (default: <input>/climategan_outputs)")
    p.add_argument("-r", "--resume_path", type=str, default=None,
                   help="Run dir with checkpoints (opts.json + checkpoints/)")
    p.add_argument("-b", "--batch_size", type=int, default=4)
    p.add_argument("--half", action="store_true",
                   help="bf16 inference (TPU-native half precision)")
    p.add_argument("--flood_mask_binarization", type=float, default=0.5)
    p.add_argument("--keep_ratio_128", action="store_true",
                   help="Keep aspect ratio, round dims to multiples of 128")
    p.add_argument("--max_im_width", type=int, default=-1)
    p.add_argument("--no_cloudy", action="store_true")
    p.add_argument("--no_native", action="store_true",
                   help="disable the C++ host-preprocessing fast path")
    p.add_argument("--no_overlap", action="store_true",
                   help="serialize device compute and host writes (exact "
                        "per-stage timings; default overlaps them)")
    p.add_argument("--ignore_event", nargs="*", default=[],
                   choices=["flood", "wildfire", "smog"])
    p.add_argument("--time", action="store_true", dest="time_inference",
                   help="Print the per-stage timing report")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--zip_outputs", action="store_true",
                   help="zip the output directory when done")
    p.add_argument("--upload", action="store_true",
                   help="upload outputs to comet.ml (requires comet creds)")
    p.add_argument("--mesh", action="store_true",
                   help="shard each batch across all visible devices "
                        "(data-parallel serving on a multi-chip host; "
                        "params replicated, XLA inserts the collectives)")
    p.add_argument("--spatial", action="store_true",
                   help="shard image ROWS across devices (model-parallel "
                        "serving for huge images at small batch; XLA "
                        "inserts the conv halo exchanges)")
    p.add_argument("--fuse", action="store_true",
                   help="bake spectral-norm sigmas into kernels and skip "
                        "power iterations (BN folding is automatic under "
                        "XLA either way)")
    return p.parse_args()


def to_128(n: int, max_width: int = -1) -> int:
    """Floor to a multiple of 128 (reference utils.py:998-1007)."""
    n = max(128, (int(n) // 128) * 128)
    if max_width > 0:
        n = min(n, (max_width // 128) * 128)
    return n


def find_images(path: Path):
    exts = {".jpg", ".jpeg", ".png", ".bmp", ".webp", ".tif", ".tiff"}
    return sorted(p for p in path.iterdir() if p.suffix.lower() in exts)


def resize_and_crop(img: np.ndarray, to: int = 640) -> np.ndarray:
    """Resize keeping AR so smallest side == to, then center-crop to^2
    (reference apply_events.py:211-241)."""
    import cv2

    h, w = img.shape[:2]
    if h < w:
        nh, nw = to, int(round(w * to / h))
    else:
        nh, nw = int(round(h * to / w)), to
    img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    top = (nh - to) // 2
    left = (nw - to) // 2
    return img[top: top + to, left: left + to]


def resize_keep_128(img: np.ndarray, max_width: int = -1) -> np.ndarray:
    import cv2

    h, w = img.shape[:2]
    nw = to_128(w, max_width)
    nh = to_128(h, max_width)
    return cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)


def uint8_to_m11(img: np.ndarray) -> np.ndarray:
    x = img.astype(np.float32) / 255.0
    return x * 2.0 - 1.0


_WRITTEN_EVENTS = ("flood", "wildfire", "smog")


def flatten_events(out: dict) -> dict:
    """Keep the written event images and flatten each to (N, H, W*C) ON
    DEVICE: fetching NHWC uint8 directly hits a ~100x slower strided
    transfer path for the 3-wide minor dim (0.2 vs 19.4 MB/s measured
    over the axon tunnel)."""
    return {k: v.reshape(v.shape[0], v.shape[1], -1)
            for k, v in out.items() if k in _WRITTEN_EVENTS}


def unflatten_events(out_dev: dict) -> dict:
    """Host-side inverse of flatten_events: fetch + restore (N, H, W, 3)."""
    return {k: np.asarray(v).reshape(v.shape[0], v.shape[1], -1, 3)
            for k, v in out_dev.items()}


def main():
    args = parse_args()
    # pod door: join the multi-host coordination service before any
    # jax.devices() query (no-op single-host; parallel/distributed.py)
    from climategan_tpu.parallel.distributed import maybe_init_distributed

    maybe_init_distributed(verbose=1)
    stores = {
        k: [] for k in
        ("imports", "setup", "data pre-processing", "all events",
         "write", "numpy")
    }

    t0 = time.perf_counter()
    import cv2
    import jax
    import jax.numpy as jnp

    from climategan_tpu.inference import build_infer_fn
    from climategan_tpu.utils.opts import load_opts
    from climategan_tpu.utils.timer import Timer, stores_report
    stores["imports"].append(time.perf_counter() - t0)

    in_dir = Path(args.images_paths).expanduser().resolve()
    out_dir = (Path(args.output_path).expanduser().resolve()
               if args.output_path else in_dir / "climategan_outputs")
    out_dir.mkdir(parents=True, exist_ok=True)

    with Timer(store=stores["setup"]):
        variables = None
        if args.resume_path:
            # any flavor: this framework's orbax run dir, a released torch
            # .pth checkpoint, or a reference-style run dir with
            # checkpoints/latest_ckpt.pth (reference README.md:49-58)
            from climategan_tpu.utils.serving import load_inference_variables

            opts, variables = load_inference_variables(args.resume_path)
        else:
            opts = load_opts()

        dtype = jnp.bfloat16 if args.half else jnp.float32
        G, infer = build_infer_fn(
            opts, dtype=dtype,
            bin_value=args.flood_mask_binarization,
            cloudy=not args.no_cloudy,
            ignore_event=tuple(args.ignore_event),
            donate=False,
            freeze_spectral=args.fuse,
        )
        rng = jax.random.PRNGKey(args.seed)
        if variables is None:
            print("WARNING: no -r/--resume_path given; using random weights "
                  "(pipeline timing/smoke mode)", file=sys.stderr)
            variables = jax.jit(G.init)(
                rng, jnp.zeros((1, 640, 640, 3), jnp.float32)
            )
        if args.fuse:
            from climategan_tpu.utils.bn_fold import bake_spectral_norm

            variables = bake_spectral_norm(variables)

    paths = find_images(in_dir)
    if jax.process_count() > 1:
        # pod serving: each host takes its strided share of the image
        # list and runs on its local devices (embarrassingly parallel —
        # no cross-host collectives in the serving path)
        paths = paths[jax.process_index()::jax.process_count()]
        print(f"process {jax.process_index()}/{jax.process_count()}: "
              f"serving {len(paths)} images", file=sys.stderr)
    if not paths:
        print(f"No images found in {in_dir}", file=sys.stderr)
        return 1
    print(f"Found {len(paths)} images; batch={args.batch_size}")

    with Timer(store=stores["data pre-processing"]):
        from concurrent.futures import ThreadPoolExecutor

        from climategan_tpu.utils import native

        use_native = native.available() and not args.no_native

        def prep(p):
            arr = cv2.imread(str(p), cv2.IMREAD_COLOR)[..., ::-1]
            if args.keep_ratio_128:
                arr = resize_keep_128(arr, args.max_im_width)
                return (native.pack_uint8_to_m11(arr) if use_native
                        else uint8_to_m11(arr))
            if use_native:
                # C++ resize+center-crop+[-1,1] pack in one pass (no
                # intermediate uint8 copy; releases the GIL)
                return native.prepare_inference(arr, 640)
            return uint8_to_m11(resize_and_crop(arr, 640))

        # cv2/native release the GIL during decode/resize — a small pool
        # overlaps file IO with decoding
        with ThreadPoolExecutor(max_workers=4) as ex:
            imgs = list(ex.map(prep, paths))

    # group identical shapes (XLA static shapes; one compile per bucket)
    by_shape = {}
    for p, a in zip(paths, imgs):
        by_shape.setdefault(a.shape, []).append((p, a))

    def flush(chunk, out_dev):
        """Device->host conversion + PNG writes for one finished batch.

        out_dev holds device arrays flattened to (N, H, W*C): fetching the
        NHWC form directly hits a ~100x slower strided transfer path for
        the 3-wide minor dim (measured 0.2 MB/s vs 19 MB/s over the remote
        transport); the flatten is dispatched at infer time and undone
        here on the host for free."""
        with Timer(store=stores["numpy"]):
            out = unflatten_events(out_dev)
        with Timer(store=stores["write"]):
            for j, (p, _) in enumerate(chunk):
                stem = p.stem
                for event in ("flood", "wildfire", "smog"):
                    if event in out:
                        cv2.imwrite(
                            str(out_dir / f"{stem}_{event}.png"),
                            out[event][j][..., ::-1],
                        )

    # multi-chip serving (SERVING.md "Scale-out"): replicate params once
    # per mesh size, shard each batch over devices — batch (--mesh) or
    # image rows (--spatial); single-device runs skip all of this
    _mesh_cache = {}

    def to_devices(arr):
        """arr: jnp NHWC batch -> (variables_for_call, sharded batch).

        On a pod each host serves an independent image share, so the
        mesh spans only LOCAL devices (no cross-host collectives)."""
        local = (jax.local_devices() if jax.process_count() > 1
                 else jax.devices())
        n_dev = len(local)
        if not (args.mesh or args.spatial) or n_dev <= 1:
            return variables, arr
        from climategan_tpu.parallel.mesh import (
            make_mesh, replicate, shard_batch, shard_spatial,
        )

        dim = 0 if args.mesh else 1  # batch vs rows
        n = max(d for d in range(1, n_dev + 1) if arr.shape[dim] % d == 0)
        if n not in _mesh_cache:
            if n < n_dev:
                print(f"WARNING: dim {dim} size {arr.shape[dim]} not "
                      f"divisible by {n_dev} devices; using {n}",
                      file=sys.stderr)
            mesh = make_mesh(n, devices=local)
            _mesh_cache[n] = (mesh, replicate(mesh, variables))
        mesh, v = _mesh_cache[n]
        return v, (shard_batch(mesh, arr) if args.mesh
                   else shard_spatial(mesh, arr))

    # JAX dispatch is asynchronous: batch i+1's device compute overlaps
    # batch i's host-side conversion + writes (disable with --no_overlap
    # for exact per-stage timings like the reference's serial harness)
    pending = None
    for shape, items in by_shape.items():
        for i in range(0, len(items), args.batch_size):
            chunk = items[i: i + args.batch_size]
            batch = np.stack([a for _, a in chunk])
            # pad to full batch so every bucket reuses one compiled shape
            pad = args.batch_size - len(chunk)
            if pad:
                batch = np.concatenate(
                    [batch, np.repeat(batch[-1:], pad, axis=0)], axis=0
                )
            with Timer(store=stores["all events"]):
                call_vars, dev_batch = to_devices(jnp.asarray(batch))
                out = infer(call_vars, dev_batch, rng)
                # keep only the written events; flatten on device NOW
                # (async) — see flush() docstring
                out = flatten_events(out)
                if args.no_overlap:
                    out = jax.block_until_ready(out)
            if pending is not None:
                flush(*pending)
                pending = None
            if args.no_overlap:
                flush(chunk, out)
            else:
                pending = (chunk, out)
            print(f"  processed {i + len(chunk)}/{len(items)} @ {shape}")
    if pending is not None:
        flush(*pending)

    if args.zip_outputs:
        import shutil

        zip_path = shutil.make_archive(str(out_dir), "zip", out_dir)
        print(f"zipped outputs: {zip_path}")

    if args.upload:
        try:
            import comet_ml

            exp = comet_ml.Experiment(project_name="climategan-tpu-inference")
            for f in sorted(out_dir.iterdir()):
                if f.suffix == ".png":
                    exp.log_image(str(f))
            exp.end()
            print("uploaded outputs to comet")
        except Exception as e:
            print(f"comet upload unavailable: {e}", file=sys.stderr)

    if args.time_inference:
        print("\n--- timing report (s) ---")
        print(stores_report(stores))
    print(f"Outputs written to {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Masker evaluation CLI (reference eval_masker.py).

Computes the paper's masker metrics against {cannot=0, must=1, may=2}
ground-truth labels: error, F0.5, edge coherence, MNR, plus the full
confusion table (reference eval_masker.py:37-69 thresholds), and writes a
JSON report + optional error-map PNGs.

Usage:
  python eval_masker.py --images_dir imgs/ --labels_dir labels/ \
      -r run_dir/ [--output metrics.json] [--write_maps]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

# paper thresholds (reference eval_masker.py:54-68)
THRESHOLDS = {"error": 0.05, "f05": 0.95, "edge_coherence": 0.02,
              "accuracy": 0.95}
KEY_METRICS = ["f05", "error", "edge_coherence", "mnr"]


def main():
    # pod door (no-op single-host; parallel/distributed.py)
    from climategan_tpu.parallel.distributed import maybe_init_distributed

    maybe_init_distributed(verbose=1)
    ap = argparse.ArgumentParser()
    ap.add_argument("--images_dir", required=True)
    ap.add_argument("--labels_dir", required=True)
    ap.add_argument("-r", "--resume_path", default=None)
    ap.add_argument("--output", default="masker_metrics.json")
    ap.add_argument("--write_maps", action="store_true")
    ap.add_argument("--plot", action="store_true",
                    help="per-image error-overlay figures + metric boxplots "
                         "(reference eval_masker.py:232-320, :751-772)")
    ap.add_argument("--bin_value", type=float, default=0.5)
    ap.add_argument("--limit", type=int, default=-1)
    ap.add_argument("--size", type=int, default=640,
                    help="inference resolution (reference fixes 640)")
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from climategan_tpu.eval_metrics import (
        edges_coherence_std_min,
        masker_classification_metrics,
    )
    from climategan_tpu.models.generator import create_generator
    from climategan_tpu.utils.opts import load_opts

    from apply_events import find_images, resize_and_crop, uint8_to_m11

    opts = load_opts()
    variables = None
    if args.resume_path:
        # orbax run dir, released torch .pth, or reference-style run dir
        # (reference eval_masker.py loads via Trainer.resume_from_path)
        from climategan_tpu.utils.serving import load_inference_variables

        opts, variables = load_inference_variables(args.resume_path)

    G = create_generator(opts)
    rng = jax.random.PRNGKey(0)
    if variables is None:
        print("WARNING: random weights (no -r given)", file=sys.stderr)
        # masker-only init: the painter path is irrelevant here (and needs
        # >= 2^spade_n_up px inputs)
        variables = jax.jit(
            lambda r, x: G.init(r, x, method="infer_masker")
        )(rng, jnp.zeros((1, args.size, args.size, 3)))

    infer_mask = jax.jit(
        lambda v, x: G.apply(v, x, method="infer_masker")[2]
    )

    img_paths = find_images(Path(args.images_dir))
    if args.limit > 0:
        img_paths = img_paths[: args.limit]
    labels_dir = Path(args.labels_dir)

    per_image = []
    for p in img_paths:
        lp = next((labels_dir / (p.stem + ext)
                   for ext in (".png", ".jpg", ".npy")
                   if (labels_dir / (p.stem + ext)).exists()), None)
        if lp is None:
            continue
        img = cv2.imread(str(p), cv2.IMREAD_COLOR)[..., ::-1]
        img = resize_and_crop(img, args.size)
        x = jnp.asarray(uint8_to_m11(img))[None]
        pred = np.asarray(infer_mask(variables, x))[0, ..., 0]

        if lp.suffix == ".npy":
            label = np.load(lp)
        else:
            label = cv2.imread(str(lp), cv2.IMREAD_GRAYSCALE)
        label = cv2.resize(label, (args.size, args.size),
                           interpolation=cv2.INTER_NEAREST)

        metrics, maps = masker_classification_metrics(pred, label)
        ec, pred_e, label_e = edges_coherence_std_min(
            pred, label, bin_th=args.bin_value
        )
        metrics["edge_coherence"] = ec
        metrics["image"] = p.name
        per_image.append(metrics)

        if args.write_maps:
            out = Path(args.output).parent / "maps"
            out.mkdir(parents=True, exist_ok=True)
            for name, m in maps.items():
                cv2.imwrite(str(out / f"{p.stem}_{name}.png"),
                            (np.clip(m, 0, 1) * 255).astype(np.uint8))
            # raw prediction too: scripts/plot_metrics.metrics_onefig
            # composes its figure offline from these maps
            cv2.imwrite(str(out / f"{p.stem}_pred.png"),
                        (np.clip(pred, 0, 1) * 255).astype(np.uint8))

        if args.plot:
            sys.path.insert(0, str(Path(__file__).parent))
            from scripts.plot_metrics import plot_overlay_images

            plot_dir = Path(args.output).parent / "plots"
            plot_dir.mkdir(parents=True, exist_ok=True)
            plot_overlay_images(
                plot_dir / f"{p.stem}.png",
                img.astype(np.uint8), label, pred, metrics, maps,
                edge_coherence=ec,
            )

    if not per_image:
        print("No (image, label) pairs found", file=sys.stderr)
        return 1

    summary = {
        k: float(np.mean([m[k] for m in per_image]))
        for k in per_image[0] if k != "image"
    }
    summary["n_images"] = len(per_image)
    summary["pass"] = {
        "error": summary["error"] <= THRESHOLDS["error"],
        "f05": summary["f05"] >= THRESHOLDS["f05"],
        "edge_coherence":
            summary["edge_coherence"] <= THRESHOLDS["edge_coherence"],
        "accuracy": summary["accuracy"] >= THRESHOLDS["accuracy"],
    }
    with open(args.output, "w") as f:
        json.dump({"summary": summary, "per_image": per_image}, f, indent=2)
    print(json.dumps({k: summary[k] for k in KEY_METRICS + ["accuracy"]},
                     indent=2))
    print(f"Report: {args.output}")

    if args.plot:
        from scripts.plot_metrics import boxplots

        plot_dir = Path(args.output).parent / "plots"
        plot_dir.mkdir(parents=True, exist_ok=True)
        boxplots({"model": per_image}, plot_dir)
        print(f"Plots: {plot_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

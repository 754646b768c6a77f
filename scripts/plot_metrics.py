#!/usr/bin/env python
"""Metric plots from eval_masker.py reports (analog of the reference's
figures/metrics.py and figures/bootstrap_ablation.py): per-metric boxplots
across one or more models, and a bootstrapped difference plot between two
models.

Usage:
  python scripts/plot_metrics.py -r nameA=metricsA.json nameB=metricsB.json \
      -o figures/
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

METRICS = ["error", "f05", "edge_coherence", "mnr", "accuracy"]


def load(report_path: str):
    with open(report_path) as f:
        data = json.load(f)
    return data["per_image"]


def boxplots(models: dict, out_dir: Path):
    for metric in METRICS:
        fig, ax = plt.subplots(figsize=(1.6 * len(models) + 2, 4))
        names, values = [], []
        for name, rows in models.items():
            vals = [r[metric] for r in rows if metric in r]
            if vals:
                names.append(name)
                values.append(vals)
        if not values:
            plt.close(fig)
            continue
        ax.boxplot(values, tick_labels=names, showfliers=False)
        ax.set_title(metric)
        ax.grid(alpha=0.3)
        fig.tight_layout()
        fig.savefig(out_dir / f"boxplot_{metric}.png", dpi=150)
        plt.close(fig)


def plot_overlay_images(
    output_filename,
    img,
    label,
    pred,
    metrics_dict,
    maps_dict,
    edge_coherence=-1,
    dpi=200,
    alpha=0.5,
):
    """Per-image masker error overlays (reference eval_masker.py:232-320):
    5 panels — FP map, FN map, may-flood maps, predicted mask, labels —
    each composited over the input image."""
    cmap = {"fp": "Reds", "fn": "Reds", "may_neg": "Oranges",
            "may_pos": "Purples", "pred": "Greens"}
    f, axes = plt.subplots(1, 5, dpi=dpi)

    axes[0].imshow(img)
    axes[0].imshow(maps_dict["fp"], vmin=0, vmax=1, cmap=cmap["fp"],
                   alpha=alpha)
    axes[0].axis("off")
    axes[0].set_title("FPR: {:.4f}".format(metrics_dict["fpr"]),
                      fontsize="xx-small")

    axes[1].imshow(img)
    axes[1].imshow(maps_dict["fn"], vmin=0, vmax=1, cmap=cmap["fn"],
                   alpha=alpha)
    axes[1].axis("off")
    axes[1].set_title("FNR: {:.4f}".format(metrics_dict["fnr"]),
                      fontsize="xx-small")

    axes[2].imshow(img)
    if edge_coherence != -1:
        title = "MNR: {:.2f} | MPR: {:.2f}\nEdge coh.: {:.4f}".format(
            metrics_dict["mnr"], metrics_dict["mpr"], edge_coherence)
    else:
        title = "MNR: {:.2f} | MPR: {:.2f}".format(
            metrics_dict["mnr"], metrics_dict["mpr"])
    axes[2].imshow(maps_dict["may_neg"], vmin=0, vmax=1,
                   cmap=cmap["may_neg"], alpha=alpha)
    axes[2].imshow(maps_dict["may_pos"], vmin=0, vmax=1,
                   cmap=cmap["may_pos"], alpha=alpha)
    axes[2].set_title(title, fontsize="xx-small")
    axes[2].axis("off")

    axes[3].imshow(img)
    axes[3].imshow(pred, vmin=0, vmax=1, cmap=cmap["pred"], alpha=alpha)
    axes[3].set_title("Predicted mask", fontsize="xx-small")
    axes[3].axis("off")

    axes[4].imshow(img)
    axes[4].imshow(label, alpha=alpha)
    axes[4].set_title("Labels", fontsize="xx-small")
    axes[4].axis("off")

    f.savefig(output_filename, dpi=f.dpi, bbox_inches="tight",
              facecolor="white", transparent=False)
    plt.close(f)


def bootstrap_diff(models: dict, out_dir: Path, n_boot: int = 10000,
                   seed: int = 0):
    """Bootstrapped mean-difference distributions between the first two
    models (reference figures/bootstrap_ablation.py pattern)."""
    if len(models) < 2:
        return
    rng = np.random.RandomState(seed)
    (name_a, rows_a), (name_b, rows_b) = list(models.items())[:2]
    fig, axes = plt.subplots(1, len(METRICS), figsize=(4 * len(METRICS), 3))
    for ax, metric in zip(np.atleast_1d(axes), METRICS):
        a = np.array([r[metric] for r in rows_a if metric in r])
        b = np.array([r[metric] for r in rows_b if metric in r])
        if len(a) == 0 or len(b) == 0:
            continue
        diffs = [
            rng.choice(a, len(a)).mean() - rng.choice(b, len(b)).mean()
            for _ in range(n_boot)
        ]
        ax.hist(diffs, bins=50)
        ax.axvline(0, color="k", lw=1)
        p = float(np.mean(np.array(diffs) > 0))
        ax.set_title(f"{metric}\nP({name_a}>{name_b})={p:.3f}")
    fig.tight_layout()
    fig.savefig(out_dir / "bootstrap_diff.png", dpi=150)
    plt.close(fig)


def metrics_onefig(report_path, images_dir, labels_dir, maps_dir, out_path,
                   metrics=("error", "f05", "edge_coherence"), dpi=200,
                   alpha=0.5):
    """One-figure best/median/worst examples per metric (port of reference
    figures/metrics_onefig.py, 772 LoC): for each key metric, the images at
    the best, median and worst rank are shown as [input+labels |
    input+pred | input+error maps] rows, ranked from the eval_masker
    report. Inputs are the eval_masker outputs: the report JSON, the image
    and label dirs, and the ``--write_maps`` maps dir (which includes the
    raw ``_pred`` mask)."""
    import cv2

    with open(report_path) as f:
        report = json.load(f)
    rows = [r for r in report["per_image"]
            if all(m in r for m in metrics)]
    if not rows:
        raise ValueError(f"no usable per_image rows in {report_path}")
    images_dir, labels_dir, maps_dir = map(Path, (images_dir, labels_dir,
                                                  maps_dir))

    def read_for(row):
        stem = Path(row["image"]).stem
        img_p = images_dir / row["image"]
        img = cv2.imread(str(img_p), cv2.IMREAD_COLOR)[..., ::-1] / 255.0
        lab_p = next((labels_dir / (stem + ext)
                      for ext in (".png", ".jpg", ".npy")
                      if (labels_dir / (stem + ext)).exists()), None)
        label = (np.load(lab_p) if lab_p and lab_p.suffix == ".npy"
                 else cv2.imread(str(lab_p), cv2.IMREAD_GRAYSCALE)
                 if lab_p else None)

        def _map(name):
            p = maps_dir / f"{stem}_{name}.png"
            return (cv2.imread(str(p), cv2.IMREAD_GRAYSCALE) / 255.0
                    if p.exists() else None)

        return img, label, _map("pred"), _map("fp"), _map("fn")

    n_rows = 3 * len(metrics)
    fig, axes = plt.subplots(n_rows, 3, dpi=dpi,
                             figsize=(9, 2.6 * n_rows), squeeze=False)
    rank_names = ("best", "median", "worst")
    for mi, metric in enumerate(metrics):
        # lower-is-better for error/edge_coherence, higher for f05
        reverse = metric == "f05"
        ranked = sorted(rows, key=lambda r: r[metric], reverse=reverse)
        picks = (ranked[0], ranked[len(ranked) // 2], ranked[-1])
        for ri, (rank, row) in enumerate(zip(rank_names, picks)):
            img, label, pred, fp_map, fn_map = read_for(row)
            r = 3 * mi + ri
            for c in range(3):
                axes[r][c].axis("off")
                axes[r][c].imshow(img)
            if label is not None:
                h, w = img.shape[:2]
                if label.shape[:2] != (h, w):
                    label = cv2.resize(label, (w, h),
                                       interpolation=cv2.INTER_NEAREST)
                axes[r][0].imshow(label, alpha=alpha, cmap="viridis")
            axes[r][0].set_title(
                f"{metric} {rank}: {row[metric]:.4f} ({row['image']})",
                fontsize="xx-small", loc="left")
            if pred is not None:
                axes[r][1].imshow(pred, vmin=0, vmax=1, cmap="Greens",
                                  alpha=alpha)
            axes[r][1].set_title("prediction", fontsize="xx-small")
            if fp_map is not None:
                axes[r][2].imshow(fp_map, vmin=0, vmax=1, cmap="Reds",
                                  alpha=alpha)
            if fn_map is not None:
                axes[r][2].imshow(fn_map, vmin=0, vmax=1, cmap="Blues",
                                  alpha=alpha)
            axes[r][2].set_title("FP (red) / FN (blue)",
                                 fontsize="xx-small")
    fig.tight_layout()
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, bbox_inches="tight", facecolor="white")
    plt.close(fig)
    return out_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-r", "--reports", nargs="+", required=True,
                    help="name=report.json pairs")
    ap.add_argument("-o", "--output_dir", default="figures")
    ap.add_argument("--onefig", action="store_true",
                    help="also build the best/median/worst one-figure "
                         "(needs --images_dir/--labels_dir/--maps_dir)")
    ap.add_argument("--images_dir", default=None)
    ap.add_argument("--labels_dir", default=None)
    ap.add_argument("--maps_dir", default=None)
    args = ap.parse_args()

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    models = {}
    for spec in args.reports:
        name, _, path = spec.partition("=")
        models[name] = load(path or name)
    boxplots(models, out)
    bootstrap_diff(models, out)
    if args.onefig:
        assert args.images_dir and args.labels_dir and args.maps_dir, (
            "--onefig needs --images_dir, --labels_dir and --maps_dir "
            "(eval_masker.py --write_maps outputs)")
        name, _, path = args.reports[0].partition("=")
        metrics_onefig(path or name, args.images_dir, args.labels_dir,
                       args.maps_dir, out / "metrics_onefig.png")
    print(f"figures written to {out}")


if __name__ == "__main__":
    main()

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-r", "--reports", nargs="+", required=True,
                    help="name=report.json pairs")
    ap.add_argument("-o", "--output_dir", default="figures")
    args = ap.parse_args()

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    models = {}
    for spec in args.reports:
        name, _, path = spec.partition("=")
        models[name] = load(path or name)
    boxplots(models, out)
    bootstrap_diff(models, out)
    print(f"figures written to {out}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Bootstrap ablation SUMMARY figure: every technique's effect in one plot.

Port of reference figures/bootstrap_ablation_summary.py (361 LoC): for
each masker technique (depth / seg / dada_seg / dada_masker / spade /
pseudo), pool the per-image (with - without) metric differences over all
matched model pairs, estimate the 20%-trimmed mean with a percentile-
bootstrap CI, and draw one panel per key metric with a row per technique —
the paper's technique-contribution summary. A JSON of
{metric: {technique: {trimmed_mean, ci_left, ci_right}}} is written next
to the figure (the reference extracts the same dict from seaborn's line
artists).

Reuses find_model_pairs / paired_diffs / bootstrap from
scripts/bootstrap_ablation.py (vectorized resampling instead of the
reference's seaborn per-axis bootstrap).

Usage:
  python scripts/bootstrap_ablation_summary.py --input_csv metrics.csv \
      --output_dir out/ [--n_bs 10000] [--alpha 0.99]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from scipy.stats import trim_mean  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.bootstrap_ablation import (  # noqa: E402
    KEY_METRICS,
    bootstrap,
    find_model_pairs,
    paired_diffs,
)

SUMMARY_TECHNIQUES = ("depth", "seg", "dada_seg", "dada_masker", "spade",
                      "pseudo")
MARKERS = {"error": "o", "f05": "s", "edge_coherence": "^"}
METRIC_NAMES = {"error": "Error", "f05": "F05 score",
                "edge_coherence": "Edge coherence"}


def technique_effects(df: pd.DataFrame, n_bs: int, alpha: float,
                      seed: int = 17):
    """{metric: {technique: (trimmed_mean, ci_left, ci_right)}} over all
    matched pairs; techniques with no pairs are skipped with a note."""
    out = {m: {} for m in KEY_METRICS}
    for technique in SUMMARY_TECHNIQUES:
        pairs = find_model_pairs(df, technique)
        if not pairs:
            print(f"note: no matched model pairs for {technique!r}; "
                  f"skipped")
            continue
        diffs = paired_diffs(df, pairs)
        for metric in KEY_METRICS:
            v = diffs[metric]
            bs = bootstrap(v, n_bs, seed=seed,
                           measures=("20_trimmed_mean",))["20_trimmed_mean"]
            lo = float(np.quantile(bs, (1 - alpha) / 2))
            hi = float(np.quantile(bs, 1 - (1 - alpha) / 2))
            out[metric][technique] = (float(trim_mean(v, 0.2)), lo, hi)
    return out


def plot_summary(effects, out_dir: Path, alpha: float = 0.99,
                 dpi: int = 200):
    techniques = [t for t in SUMMARY_TECHNIQUES
                  if any(t in effects[m] for m in KEY_METRICS)]
    ys = np.arange(len(techniques))[::-1]
    fig, axes = plt.subplots(1, len(KEY_METRICS), sharey=True, dpi=dpi,
                             figsize=(9, 0.45 * len(techniques) + 1.3))
    for idx, metric in enumerate(KEY_METRICS):
        ax = axes[idx] if len(KEY_METRICS) > 1 else axes
        color = f"C{idx}"
        for y, t in zip(ys, techniques):
            if t not in effects[metric]:
                continue
            mean, lo, hi = effects[metric][t]
            ax.errorbar([mean], [y], xerr=[[mean - lo], [hi - mean]],
                        fmt=MARKERS[metric], color=color, ecolor=color,
                        elinewidth=1.5, capsize=3, ms=4, ls="none")
        ax.axvline(0.0, color="0.4", lw=0.8, ls="--")
        ax.set_yticks(ys)
        ax.set_yticklabels(techniques, fontsize="medium")
        ax.set_title(METRIC_NAMES.get(metric, metric), fontsize="medium")
        ax.grid(axis="x", alpha=0.3)
        for spine in ("top", "right", "left"):
            ax.spines[spine].set_visible(False)
    fig.suptitle(
        f"Technique contribution: 20% trimmed mean of per-image "
        f"differences, {int(alpha * 100)}% bootstrap CI",
        fontsize="medium")
    fig.tight_layout()
    out_dir.mkdir(parents=True, exist_ok=True)
    fp = out_dir / "bootstrap_ablation_summary.png"
    fig.savefig(fp, bbox_inches="tight")
    plt.close(fig)
    return fp


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_csv", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--n_bs", type=int, default=10000)
    ap.add_argument("--alpha", type=float, default=0.99)
    ap.add_argument("--dpi", type=int, default=200)
    ap.add_argument("--bs_seed", type=int, default=17)
    args = ap.parse_args(argv)

    df = pd.read_csv(args.input_csv)
    effects = technique_effects(df, args.n_bs, args.alpha, args.bs_seed)
    out_dir = Path(args.output_dir)
    fp = plot_summary(effects, out_dir, alpha=args.alpha, dpi=args.dpi)
    with open(out_dir / "bootstrap_ablation_summary.json", "w") as f:
        json.dump({m: {t: {"20_trimmed_mean": v[0], "ci_left": v[1],
                           "ci_right": v[2]}
                       for t, v in d.items()}
                   for m, d in effects.items()}, f, indent=2)
    print(f"wrote {fp}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

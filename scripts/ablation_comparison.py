#!/usr/bin/env python
"""Ablation comparison figure: per-model median metrics with bootstrap CIs.

Port of reference figures/ablation_comparison.py (394 LoC): every model
variant in the ablation CSV (rows = per-image metrics, ``model_feats``
column identifies the variant) gets a horizontal point estimate (median)
with a percentile-bootstrap confidence interval, one panel per key metric
(error / f05 / edge_coherence), numbered-variant models first, then the
named baselines (painted-ground "G", instagan "I") — the paper's model-
comparison figure.

Redesign notes: pure matplotlib errorbar panels instead of seaborn
pointplot; the bootstrap reuses the vectorized resample from
scripts/bootstrap_ablation.py (same estimator as sns ci=N, ~100x faster
than the reference's per-axis seaborn bootstrap on this host).

CSV schema (reference ablations_metrics_*.csv): model_feats, img_idx,
technique flags, f05/error/edge_coherence columns.

Usage:
  python scripts/ablation_comparison.py --input_csv metrics.csv \
      --output_dir out/ [--n_bs 10000] [--alpha 0.99] [--models all]
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

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.bootstrap_ablation import KEY_METRICS, bootstrap  # noqa: E402

# model_feats string -> display label (reference ablation_comparison.py:14-47)
DICT_MODELS = {
    "dada, msd, pseudo": 20, "msd, pseudo": 19, "dada, msd": 18,
    "msd": 17, "dada, md": 16, "md": 15, "dada, ms": 14, "ms": 13,
    "dada, m": 12, "m": 10,
    "md, pseudo": 2, "ms, pseudo": 3, "m, pseudo": 1,
    "ground": "G", "instagan": "I",
}
MARKERS = {"error": "o", "f05": "s", "edge_coherence": "^"}
METRIC_NAMES = {"error": "Error", "f05": "F05 score",
                "edge_coherence": "Edge coherence"}
# models CLI filters (reference --models choices)
MODEL_FILTERS = {
    "all": None,
    "pseudo": lambda lbl: isinstance(lbl, int) and lbl < 10,
    "no_dada_masker": lambda lbl: lbl not in (12, 14, 16, 18, 20),
    "no_baseline": lambda lbl: lbl not in ("G", "I"),
}


def model_order(df: pd.DataFrame, models: str = "all"):
    """Display order: numeric variant ids ascending, then named baselines
    (reference plot_median_metrics label sorting)."""
    present = [m for m in df.model_feats.unique() if m in DICT_MODELS]
    unknown = [m for m in df.model_feats.unique() if m not in DICT_MODELS]
    for m in unknown:
        DICT_MODELS[m] = str(m)  # tolerate novel variants: label verbatim
        present.append(m)
    flt = MODEL_FILTERS.get(models)
    if flt is not None:
        present = [m for m in present if flt(DICT_MODELS[m])]
    ints = sorted((m for m in present if isinstance(DICT_MODELS[m], int)),
                  key=lambda m: DICT_MODELS[m])
    strs = sorted((m for m in present
                   if not isinstance(DICT_MODELS[m], int)),
                  key=lambda m: str(DICT_MODELS[m]))
    return ints + strs


def median_with_ci(values: np.ndarray, n_bs: int, alpha: float,
                   seed: int = 17):
    bs = bootstrap(values, n_bs, seed=seed, measures=("median",))["median"]
    lo = float(np.quantile(bs, (1 - alpha) / 2))
    hi = float(np.quantile(bs, 1 - (1 - alpha) / 2))
    return float(np.median(values)), lo, hi


def plot_ablation_comparison(df: pd.DataFrame, out_dir: Path,
                             models: str = "all", n_bs: int = 10000,
                             alpha: float = 0.99, dpi: int = 200,
                             seed: int = 17):
    order = model_order(df, models)
    labels = [str(DICT_MODELS[m]) for m in order]
    fig, axes = plt.subplots(1, len(KEY_METRICS), sharey=True, dpi=dpi,
                             figsize=(3.2 * len(KEY_METRICS),
                                      0.38 * len(order) + 1.2))
    results = {}
    ys = np.arange(len(order))[::-1]
    for idx, metric in enumerate(KEY_METRICS):
        ax = axes[idx] if len(KEY_METRICS) > 1 else axes
        meds, los, his = [], [], []
        for m in order:
            v = df.loc[df.model_feats == m, metric].values.astype(float)
            med, lo, hi = median_with_ci(v, n_bs, alpha, seed)
            meds.append(med)
            los.append(med - lo)
            his.append(hi - med)
            results.setdefault(metric, {})[str(m)] = {
                "median": med, "ci_left": lo, "ci_right": hi,
            }
        color = f"C{idx}"
        ax.errorbar(meds, ys, xerr=[los, his], fmt=MARKERS[metric],
                    color=color, ecolor=color, elinewidth=1.5, capsize=3,
                    ms=4, ls="none")
        ax.set_yticks(ys)
        ax.set_yticklabels(labels, fontsize="medium")
        ax.set_title(METRIC_NAMES.get(metric, metric), fontsize="medium")
        ax.grid(axis="x", alpha=0.3)
        for spine in ("top", "right", "left"):
            ax.spines[spine].set_visible(False)
    fig.suptitle(f"Median metrics, {int(alpha * 100)}% bootstrap CI",
                 fontsize="medium")
    fig.tight_layout()
    out_dir.mkdir(parents=True, exist_ok=True)
    fp = out_dir / f"ablation_comparison_{models}.png"
    fig.savefig(fp, bbox_inches="tight")
    plt.close(fig)
    with open(out_dir / f"ablation_comparison_{models}.json", "w") as f:
        json.dump(results, f, indent=2)
    return fp, results


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_csv", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--models", default="all",
                    choices=sorted(MODEL_FILTERS))
    ap.add_argument("--n_bs", type=int, default=10000)
    ap.add_argument("--alpha", type=float, default=0.99)
    ap.add_argument("--dpi", type=int, default=200)
    ap.add_argument("--bs_seed", type=int, default=17)
    args = ap.parse_args(argv)

    df = pd.read_csv(args.input_csv)
    fp, _ = plot_ablation_comparison(
        df, Path(args.output_dir), models=args.models, n_bs=args.n_bs,
        alpha=args.alpha, dpi=args.dpi, seed=args.bs_seed,
    )
    print(f"wrote {fp}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Human-evaluation preference figure (compact port of reference
figures/human_evaluation.py): given a CSV of AMT pairwise choices with
columns ``comparable`` (method id), ``climategan`` (1 if this framework's
output was preferred) and ``is_valid``, draws a horizontal bar chart of the
preference rate per compared method with a bootstrap confidence interval
and the 0.5 chance line."""
from __future__ import annotations

import argparse
import csv
from collections import defaultdict
from pathlib import Path

import numpy as np

COMPARABLE_NAMES = {
    "munit_flooded": "MUNIT",
    "cyclegan": "CycleGAN",
    "instagan": "InstaGAN",
    "instagan_copypaste": "Mask-InstaGAN",
    "painted_ground": "Painted ground",
}


def load_rows(path):
    rows = defaultdict(list)
    with open(path) as f:
        for r in csv.DictReader(f):
            if str(r.get("is_valid", "1")).lower() in ("1", "true"):
                rows[r["comparable"]].append(float(r["climategan"]))
    return {k: np.asarray(v) for k, v in rows.items()}


def bootstrap_ci(x: np.ndarray, n_bs: int, seed: int, ci: float = 0.99):
    rng = np.random.RandomState(seed)
    means = rng.choice(x, size=(n_bs, len(x)), replace=True).mean(axis=1)
    lo, hi = np.percentile(means, [(1 - ci) / 2 * 100, (1 + ci) / 2 * 100])
    return float(lo), float(hi)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_csv", default="amt_omni-vs-other.csv")
    ap.add_argument("--output_dir", default="figures")
    ap.add_argument("--dpi", type=int, default=200)
    ap.add_argument("--n_bs", type=int, default=10000)
    ap.add_argument("--bs_seed", type=int, default=17)
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = load_rows(args.input_csv)
    if not rows:
        raise SystemExit("no valid rows in the CSV")
    order = sorted(rows, key=lambda k: rows[k].mean(), reverse=True)

    fig, ax = plt.subplots(figsize=(10.5, 0.8 * len(order) + 1),
                           dpi=args.dpi)
    ys = np.arange(len(order))
    for y, comp in zip(ys, order):
        x = rows[comp]
        rate = x.mean()
        lo, hi = bootstrap_ci(x, args.n_bs, args.bs_seed)
        ax.barh(y, 1.0, color="#dddddd", height=0.6)
        ax.barh(y, rate, color="#3274a1", height=0.6)
        ax.errorbar(rate, y, xerr=[[rate - lo], [hi - rate]], color="black",
                    capsize=4, lw=1.5)
        ax.text(1.02, y, f"{rate:.2f}", va="center", fontsize="small")
    ax.axvline(0.5, linestyle=":", color="black", lw=1.5)
    ax.set_yticks(ys)
    ax.set_yticklabels([COMPARABLE_NAMES.get(c, c) for c in order])
    ax.set_xlim(0, 1.1)
    ax.set_xlabel("rate of preference for this framework's output")
    ax.invert_yaxis()
    fig.tight_layout()

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    path = out / "human_evaluation_rate_climategan.png"
    fig.savefig(path, dpi=fig.dpi, bbox_inches="tight")
    plt.close(fig)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

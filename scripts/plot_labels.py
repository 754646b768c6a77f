#!/usr/bin/env python
"""Plot Masker test images overlaid with their {cannot, must, may} labels.

Port of reference figures/labels.py (200 LoC): each test image is shown
with its ground-truth flood labels composited on top in colorblind-safe
colors (cannot=orange, must=green, may=grey), one panel per image, in a
grid figure — the paper's label-set illustration.

Redesign notes: matplotlib-only (no seaborn/pandas); labels are read from
PNG/npy files whose stem matches the image (same pairing rule as
eval_masker.py).

Usage:
  python scripts/plot_labels.py --images_dir imgs/ --labels_dir labels/ \
      --output_dir out/ [--ncols 4] [--alpha 0.5] [--limit 16]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.patches as mpatches  # noqa: E402
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

# colorblind-palette RGB (reference labels.py:27-31: seaborn "colorblind"
# indices 1 (orange), 2 (green), 7 (grey) — values inlined so seaborn is
# not a dependency)
COLOR_CANNOT = (0.871, 0.561, 0.020)
COLOR_MUST = (0.008, 0.620, 0.451)
COLOR_MAY = (0.580, 0.580, 0.580)
LABELS = {"cannot": 0, "must": 1, "may": 2}


def overlay(img: np.ndarray, label: np.ndarray,
            alpha: float = 0.5) -> np.ndarray:
    """Composite the label colors over an RGB [0,1] image."""
    img = np.asarray(img, np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    out = img.copy()
    for name, color in (("cannot", COLOR_CANNOT), ("must", COLOR_MUST),
                        ("may", COLOR_MAY)):
        m = (label == LABELS[name])[..., None]
        out = np.where(m, (1 - alpha) * out + alpha * np.asarray(color),
                       out)
    return np.clip(out, 0, 1)


def plot_labels_grid(pairs, out_path: Path, ncols: int = 4,
                     alpha: float = 0.5, dpi: int = 200):
    """pairs: list of (name, img HWC uint8/float, label HW int)."""
    n = len(pairs)
    ncols = max(1, min(ncols, n))
    nrows = (n + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, dpi=dpi,
                             figsize=(3 * ncols, 3 * nrows), squeeze=False)
    for ax in axes.flat:
        ax.axis("off")
    for ax, (name, img, label) in zip(axes.flat, pairs):
        ax.imshow(overlay(img, label, alpha))
        ax.set_title(name, fontsize="x-small")
    handles = [
        mpatches.Patch(color=COLOR_CANNOT, label="Cannot be flooded"),
        mpatches.Patch(color=COLOR_MUST, label="Must be flooded"),
        mpatches.Patch(color=COLOR_MAY, label="May be flooded"),
    ]
    fig.legend(handles=handles, loc="lower center", ncol=3,
               fontsize="small", frameon=False)
    fig.tight_layout(rect=(0, 0.04, 1, 1))
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
    return out_path


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--images_dir", required=True)
    ap.add_argument("--labels_dir", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--ncols", type=int, default=4)
    ap.add_argument("--alpha", type=float, default=0.5)
    ap.add_argument("--limit", type=int, default=16)
    ap.add_argument("--dpi", type=int, default=200)
    args = ap.parse_args(argv)

    import cv2

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from apply_events import find_images

    labels_dir = Path(args.labels_dir)
    pairs = []
    for p in find_images(Path(args.images_dir)):
        lp = next((labels_dir / (p.stem + ext)
                   for ext in (".png", ".jpg", ".npy")
                   if (labels_dir / (p.stem + ext)).exists()), None)
        if lp is None:
            continue
        img = cv2.imread(str(p), cv2.IMREAD_COLOR)[..., ::-1]
        label = (np.load(lp) if lp.suffix == ".npy"
                 else cv2.imread(str(lp), cv2.IMREAD_GRAYSCALE))
        if label.shape[:2] != img.shape[:2]:
            label = cv2.resize(label, (img.shape[1], img.shape[0]),
                               interpolation=cv2.INTER_NEAREST)
        pairs.append((p.name, img, label))
        if 0 < args.limit <= len(pairs):
            break
    if not pairs:
        print("No (image, label) pairs found", file=sys.stderr)
        return 1
    fp = plot_labels_grid(pairs, Path(args.output_dir) / "labels.png",
                          ncols=args.ncols, alpha=args.alpha, dpi=args.dpi)
    print(f"wrote {fp}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

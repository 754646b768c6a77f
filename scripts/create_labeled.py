#!/usr/bin/env python
"""Blend images with their label maps for visual inspection
(reference utils_scripts/create_labeled.py — hardcoded paths replaced by a
CLI; labels are matched to images by stem, tolerating a `_labeled` suffix).
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def blend(im: np.ndarray, la: np.ndarray, alpha: float = 0.3) -> np.ndarray:
    """0.7*image + 0.3*label overlay (reference :24)."""
    if la.ndim == 2:
        la = np.stack([la] * 3, axis=-1)
    return ((1.0 - alpha) * im[..., :3] + alpha * la[..., :3]).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-i", "--images_dir", required=True)
    ap.add_argument("-l", "--labels_dir", required=True)
    ap.add_argument("-o", "--output_dir", required=True)
    ap.add_argument("--alpha", type=float, default=0.3)
    args = ap.parse_args()

    import cv2

    impath, labpath = Path(args.images_dir), Path(args.labels_dir)
    outpath = Path(args.output_dir)
    outpath.mkdir(exist_ok=True, parents=True)

    ims = sorted(
        (d for d in impath.iterdir()
         if d.is_file() and not d.name.startswith(".")),
        key=lambda x: x.stem,
    )
    labs = {d.stem.replace("_labeled", ""): d
            for d in labpath.iterdir()
            if d.is_file() and not d.name.startswith(".")}

    n = 0
    for i in ims:
        lp = labs.get(i.stem)
        if lp is None:
            continue
        im = cv2.imread(str(i), cv2.IMREAD_COLOR)[..., ::-1]
        la = cv2.imread(str(lp), cv2.IMREAD_UNCHANGED)
        out = blend(im, la, args.alpha)
        cv2.imwrite(str(outpath / i.name), out[..., ::-1])
        n += 1
    print(f"wrote {n} labeled blends to {outpath}")


if __name__ == "__main__":
    main()

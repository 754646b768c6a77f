#!/usr/bin/env python
"""Build a 640x640 masker validation set: resize-keep-AR + center-crop every
image (and its label if present) to 640^2 (reference
utils_scripts/make_640_masker_validation_set.py).
"""
from __future__ import annotations

import argparse
from pathlib import Path

import cv2
import numpy as np


def crop640(img: np.ndarray, interp) -> np.ndarray:
    h, w = img.shape[:2]
    if h < w:
        nh, nw = 640, int(round(w * 640 / h))
    else:
        nh, nw = int(round(h * 640 / w)), 640
    img = cv2.resize(img, (nw, nh), interpolation=interp)
    top, left = (nh - 640) // 2, (nw - 640) // 2
    return img[top: top + 640, left: left + 640]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-i", "--images_dir", required=True)
    ap.add_argument("-l", "--labels_dir", default=None)
    ap.add_argument("-o", "--output_dir", required=True)
    args = ap.parse_args()

    out = Path(args.output_dir)
    (out / "imgs").mkdir(parents=True, exist_ok=True)
    if args.labels_dir:
        (out / "labels").mkdir(parents=True, exist_ok=True)

    for p in sorted(Path(args.images_dir).iterdir()):
        if p.suffix.lower() not in {".jpg", ".jpeg", ".png", ".webp"}:
            continue
        img = cv2.imread(str(p), cv2.IMREAD_COLOR)
        cv2.imwrite(str(out / "imgs" / f"{p.stem}.png"),
                    crop640(img, cv2.INTER_LINEAR))
        if args.labels_dir:
            lp = next(Path(args.labels_dir).glob(p.stem + ".*"), None)
            if lp is not None:
                lab = cv2.imread(str(lp), cv2.IMREAD_UNCHANGED)
                cv2.imwrite(str(out / "labels" / f"{p.stem}.png"),
                            crop640(lab, cv2.INTER_NEAREST))
        print(p.stem)


if __name__ == "__main__":
    main()

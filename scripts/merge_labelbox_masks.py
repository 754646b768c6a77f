#!/usr/bin/env python
"""Merge per-annotator must/cannot flood masks into a single label image
(reference utils_scripts/merge_labelbox_masks.py): each sample directory
contains *must*.png and *cannot*.png binary masks; the merged label encodes
must-flood as blue, cannot-flood as red, everything else (may flood) black —
the {cannot=0, must=1, may=2} ground truth consumed by eval_masker.py.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import cv2
import numpy as np


def merge_sample_dir(sd: Path, out_dir: Path) -> Path:
    must_files = sorted(sd.glob("*must*.png"))
    cannot_files = sorted(sd.glob("*cannot*.png"))
    assert must_files and cannot_files, f"missing masks in {sd}"
    must = np.stack(
        [cv2.imread(str(i))[:, :, :3] for i in must_files]
    ).sum(0) > 0
    cannot = np.stack(
        [cv2.imread(str(i))[:, :, :3] for i in cannot_files]
    ).sum(0) > 0
    # must = blue, cannot = red (RGB); overlap check like the reference
    label = (must * np.array([0, 0, 255]) +
             cannot * np.array([255, 0, 0])).astype(np.uint8)
    assert sorted(np.unique(label)) in ([0], [0, 255]), "mask overlap"
    stem = "_".join(must_files[0].stem.split("_")[:-2]) or sd.name
    out = out_dir / f"{stem}_labeled.png"
    cv2.imwrite(str(out), label[..., ::-1])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("base_dir")
    ap.add_argument("-o", "--output", default=None)
    args = ap.parse_args()
    base = Path(args.base_dir).resolve()
    out_dir = Path(args.output) if args.output else base / "__labeled"
    out_dir.mkdir(exist_ok=True, parents=True)
    dirs = [d for d in base.iterdir()
            if d.is_dir() and not d.name.startswith((".", "__"))]
    for i, sd in enumerate(dirs):
        p = merge_sample_dir(sd, out_dir)
        print(f"{i + 1}/{len(dirs)} {p.name}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Upload a directory of images to a comet.ml experiment
(reference utils_scripts/upload_images_to_comet.py). comet is optional in
this environment; without it the script lists what would be uploaded."""
from __future__ import annotations

import argparse
import time
from pathlib import Path

EXTS = {".png", ".jpg", ".jpeg", ".webp"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-i", "--images_path", type=str, default=".")
    ap.add_argument("-p", "--project_name", type=str,
                    default="climategan-eval")
    ap.add_argument("-s", "--sleep", type=float, default=0.1)
    ap.add_argument("-v", "--verbose", type=int, default=1)
    ap.add_argument("--dry_run", action="store_true")
    args = ap.parse_args()

    imgs = sorted(p for p in Path(args.images_path).resolve().iterdir()
                  if p.suffix.lower() in EXTS)
    try:
        import comet_ml
    except ImportError:
        comet_ml = None

    if comet_ml is None or args.dry_run:
        print(f"[dry-run] would upload {len(imgs)} images to "
              f"project {args.project_name!r}")
        for p in imgs[:10]:
            print("  ", p.name)
        return

    exp = comet_ml.Experiment(project_name=args.project_name,
                              display_summary_level=0)
    for i, p in enumerate(imgs):
        exp.log_image(str(p))
        if args.verbose:
            print(f"{i + 1}/{len(imgs)} {p.name}")
        time.sleep(args.sleep)
    exp.end()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Download images logged to comet.ml experiments, selected by experiment id
or by tags (compact port of reference utils_scripts/download_comet_images.py:
tag include/exclude with `!`/`~` prefixes, per-experiment directories named
exp.id[:id_length], step filter last/all/N, --dev dry run). comet is optional
in this environment; without it the script exits with an explanation."""
from __future__ import annotations

import argparse
from pathlib import Path


def parse_tags(tags_str: str):
    """'a, !b, ~c' -> keep {a}, remove {b, c} (reference :12-21)."""
    all_tags = set(t.strip() for t in tags_str.split(",") if t.strip())
    keep, remove = set(), set()
    for t in all_tags:
        if t.startswith(("!", "~")):
            remove.add(t[1:])
        else:
            keep.add(t)
    return all_tags, keep, remove


def has_right_tags(exp, keep, remove) -> bool:
    tags = set(exp.get_tags())
    return keep.issubset(tags) and not (remove & tags)


def select_images(images, step):
    """step: 'all' | 'last' | int (reference step filter)."""
    if step == "all":
        return images
    steps = [im.get("step") or 0 for im in images]
    target = max(steps) if step == "last" else int(step)
    return [im for im, s in zip(images, steps) if s == target]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-e", "--exp_id", default="")
    ap.add_argument("-d", "--download_dir", default=None)
    ap.add_argument("-b", "--base_dir", default="./")
    ap.add_argument("-t", "--tags", default="",
                    help="select all experiments with these tags "
                         "(!tag / ~tag to exclude)")
    ap.add_argument("-s", "--step", default="last",
                    help="'last' | 'all' | integer step")
    ap.add_argument("-i", "--id_length", default=8, type=int)
    ap.add_argument("-p", "--project_name", default="climategan")
    ap.add_argument("-w", "--workspace", default=None)
    ap.add_argument("-r", "--running", action="store_true",
                    help="only select running experiments")
    ap.add_argument("--dev", action="store_true",
                    help="dry run: no mkdir, no download")
    args = ap.parse_args()

    try:
        import comet_ml
    except ImportError:
        print("comet_ml is not installed in this environment; nothing to "
              "download. (This script needs network access to comet.ml.)")
        return 1

    api = comet_ml.api.API()
    if args.tags:
        all_tags, keep, remove = parse_tags(args.tags)
        exps = api.get_experiments(workspace=args.workspace,
                                   project_name=args.project_name)
        exps = [e for e in exps if has_right_tags(e, keep, remove)]
        if args.running:
            exps = [e for e in exps if e.alive]
        base = Path(args.download_dir or args.base_dir).resolve()
        base = base / "&".join(sorted(all_tags))
    else:
        assert args.exp_id, "need --exp_id or --tags"
        exps = [api.get_experiment_by_id(args.exp_id)]
        base = Path(args.download_dir or args.base_dir).resolve()

    ids = {e.id[: args.id_length] for e in exps}
    assert len(ids) == len(exps), \
        "experiment id prefix conflict, use a larger --id_length"

    print(f"Processing {len(exps)} experiments into {base}")
    for e in exps:
        out = base / e.id[: args.id_length]
        images = select_images(e.get_asset_list("image"), args.step)
        print(f"  {e.id[:args.id_length]}: {len(images)} images")
        if args.dev:
            continue
        out.mkdir(parents=True, exist_ok=True)
        for im in images:
            name = im.get("fileName") or f"{im['assetId']}.png"
            path = out / Path(name).name
            if path.exists():
                continue
            data = e.get_asset(im["assetId"], return_type="binary")
            path.write_bytes(data)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Compare several masker checkpoints on the same images: writes
side-by-side panels [input | mask_1 | mask_2 | ...] and a metrics JSON when
labels are available (reference utils_scripts/compare_maskers.py, without
the comet upload).
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-i", "--images_dir", required=True)
    ap.add_argument("-r", "--run_dirs", nargs="+", required=True)
    ap.add_argument("-l", "--labels_dir", default=None)
    ap.add_argument("-o", "--output_dir", default="masker_comparison")
    ap.add_argument("--limit", type=int, default=-1)
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from climategan_tpu.models.generator import create_generator
    from climategan_tpu.utils.checkpoint import load_generator_variables
    from climategan_tpu.utils.opts import load_opts
    from climategan_tpu.eval_metrics import masker_classification_metrics

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from apply_events import find_images, resize_and_crop, uint8_to_m11

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)

    models = []
    for rd in args.run_dirs:
        rd = Path(rd).resolve()
        opts_file = next((rd / c for c in ("opts.json", "opts.yaml")
                          if (rd / c).exists()), None)
        opts = load_opts(path=opts_file)
        G = create_generator(opts)
        variables = load_generator_variables(rd / "checkpoints", None)
        if variables is None:
            print(f"WARNING: random weights for {rd.name}", file=sys.stderr)
            variables = jax.jit(G.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3))
            )
        fn = jax.jit(lambda v, x, G=G: G.apply(v, x, method="infer_masker")[2])
        models.append((rd.name, G, variables, fn))

    paths = find_images(Path(args.images_dir))
    if args.limit > 0:
        paths = paths[: args.limit]

    metrics = {name: [] for name, *_ in models}
    for p in paths:
        img = cv2.imread(str(p), cv2.IMREAD_COLOR)[..., ::-1]
        img = resize_and_crop(img, 640)
        x = jnp.asarray(uint8_to_m11(img))[None]
        panel = [img]
        label = None
        if args.labels_dir:
            lp = next(Path(args.labels_dir).glob(p.stem + ".*"), None)
            if lp is not None:
                label = cv2.resize(
                    cv2.imread(str(lp), cv2.IMREAD_GRAYSCALE), (640, 640),
                    interpolation=cv2.INTER_NEAREST,
                )
        for name, G, variables, fn in models:
            m = np.asarray(fn(variables, x))[0, ..., 0]
            panel.append(np.repeat((m * 255).astype(np.uint8)[..., None],
                                   3, axis=-1))
            if label is not None:
                mm, _ = masker_classification_metrics(m, label)
                metrics[name].append(mm)
        cv2.imwrite(str(out / f"{p.stem}_panel.png"),
                    np.concatenate(panel, axis=1)[..., ::-1])
        print(p.stem)

    if args.labels_dir:
        summary = {
            name: {k: float(np.mean([m[k] for m in ms])) for k in ms[0]}
            for name, ms in metrics.items() if ms
        }
        with open(out / "metrics.json", "w") as f:
            json.dump(summary, f, indent=2)
        print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()

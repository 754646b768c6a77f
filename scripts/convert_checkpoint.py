#!/usr/bin/env python
"""Convert a released ClimateGAN torch checkpoint into an orbax run dir.

The reference ships trained ``.pth`` state dicts (reference
README.md:49-58); this one-time converter turns them into this
framework's native serving format — a run dir with ``opts.json`` +
``checkpoints/latest.json`` that ``apply_events.py -r`` /
``eval_masker.py -r`` / ``Trainer.resume_from_path`` load without any
torch dependency at serving time.

Usage:
  python scripts/convert_checkpoint.py -i model.pth -o run_dir \
      [--opts opts.yaml] [--allow_pickle]

``-i`` also accepts a reference-style run dir (the ``.pth`` is found
under ``checkpoints/``, and its ``opts.yaml`` is picked up
automatically).
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-i", "--input", required=True,
                    help="torch .pth file or reference-style run dir")
    ap.add_argument("-o", "--output", required=True,
                    help="output run dir (created; opts.json + checkpoints/)")
    ap.add_argument("--opts", default=None,
                    help="opts yaml/json describing the architecture "
                         "(default: opts.yaml next to the checkpoint, else "
                         "the framework defaults — which match the released "
                         "checkpoints)")
    ap.add_argument("--allow_pickle", action="store_true",
                    help="allow full unpickling of non-plain-tensor "
                         "checkpoints (runs code embedded in the file; only "
                         "use on files you trust)")
    args = ap.parse_args()

    import orbax.checkpoint as ocp

    from climategan_tpu.utils.opts import load_opts
    from climategan_tpu.utils.serving import (
        discover_opts,
        load_variables,
        resolve_checkpoint,
        run_dir_of,
    )

    kind, ckpt = resolve_checkpoint(args.input)
    if kind != "torch":
        print(f"{args.input} is already an orbax run dir; nothing to do",
              file=sys.stderr)
        return 1
    opts = (load_opts(path=args.opts) if args.opts
            else discover_opts(run_dir_of(kind, ckpt)))

    print(f"converting {ckpt} ...")
    variables = load_variables(ckpt, opts, allow_pickle=args.allow_pickle)

    out = Path(args.output).expanduser().resolve()
    ckpt_dir = out / "checkpoints"
    ckpt_dir.mkdir(parents=True, exist_ok=True)

    # the same layout Trainer.save() produces, G-only (inference ckpt):
    # utils/checkpoint.load_generator_variables reads {"g_params", "g_state"}
    import numpy as np

    tree = {
        "g_params": variables["params"],
        "g_state": {k: v for k, v in variables.items() if k != "params"},
    }
    import jax

    tree = jax.tree_util.tree_map(np.asarray, tree)
    path = (ckpt_dir / "latest_ckpt").resolve()
    if path.exists():
        import shutil

        shutil.rmtree(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    with open(ckpt_dir / "latest.json", "w") as f:
        json.dump({"epoch": 0, "latest": str(path)}, f)
    with open(out / "opts.json", "w") as f:
        json.dump(opts.to_dict() if hasattr(opts, "to_dict") else dict(opts),
                  f, indent=2, default=str)
    print(f"wrote orbax run dir: {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Training CLI (reference train.py, hydra-style dotted overrides).

Usage:
  python train.py args.config=path/to/config.yaml gen.opt.lr.default=1e-4
  python train.py tasks='[m,s,d]' train.epochs=10
"""
from __future__ import annotations

import sys
from pathlib import Path


def main(argv):
    from climategan_tpu.trainer import Trainer
    from climategan_tpu.utils.opts import (
        get_increased_path,
        load_opts,
        parse_overrides,
    )

    overrides = parse_overrides([a for a in argv if "=" in a])
    cfg_path = None
    args = overrides.pop("args", None)
    if args:
        cfg_path = args.get("config")
        resume = bool(args.get("resume"))
    else:
        resume = False

    opts = load_opts(path=cfg_path, commandline_opts=overrides)

    out = Path(str(opts.output_path))
    if opts.train.get("auto_resume") and not (opts.train.get("resume") or resume):
        from climategan_tpu.utils.opts import find_existing_training

        existing = find_existing_training(opts)
        if existing is not None:
            print(f"auto-resume: found matching run {existing}")
            opts.output_path = str(existing)
            resume = True
            out = existing
    if not (opts.train.get("resume") or resume):
        out = get_increased_path(out)
        opts.output_path = str(out)
    out.mkdir(parents=True, exist_ok=True)
    from climategan_tpu.utils.opts import write_job_id

    write_job_id(out)
    print(f"output_path: {out}")

    comet_exp = None
    try:  # comet is optional; console/JSONL logging always works
        if opts.get("comet", {}).get("use"):
            import comet_ml

            comet_exp = comet_ml.Experiment()
    except Exception:
        comet_exp = None

    trainer = Trainer(opts, comet_exp=comet_exp)
    trainer.setup()
    if opts.train.get("resume") or resume:
        trainer.resume()
    trainer.train()
    print("done")


if __name__ == "__main__":
    main(sys.argv[1:])

#!/usr/bin/env python
"""Training CLI (reference train.py, hydra-style dotted overrides).

Usage:
  python train.py args.config=path/to/config.yaml gen.opt.lr.default=1e-4
  python train.py tasks='[m,s,d]' train.epochs=10
"""
from __future__ import annotations

import sys
from pathlib import Path


def setup_comet(opts, resuming: bool):
    """Comet experiment lifecycle (reference train.py:108-172): on resume,
    recover the experiment id recorded in the run dir and continue it;
    otherwise create a new experiment, upload the framework sources as
    assets, tag it, log the flattened opts, and record the experiment
    url+id in the run dir. Offline-safe: comet is optional and every
    failure degrades to console/JSONL logging."""
    if not opts.get("comet", {}).get("use"):
        return None
    out = Path(str(opts.output_path))
    try:
        import comet_ml

        from climategan_tpu.utils.opts import flatten_opts

        exp = None
        id_file = out / "comet_id.txt"
        if resuming and id_file.exists():
            prev = id_file.read_text().strip()
            if prev:
                print(f"continuing comet experiment {prev}")
                exp = comet_ml.ExistingExperiment(previous_experiment=prev)
        if exp is None:
            exp = comet_ml.Experiment(project_name="climategan_tpu")
            pkg = Path(__file__).parent / "climategan_tpu"
            exp.log_asset_folder(str(pkg), recursive=True,
                                 log_file_name=True)
            exp.log_asset(str(Path(__file__)))
        tags = list(opts.get("comet", {}).get("tags") or [])
        if tags:
            exp.add_tags(tags)
        exp.log_parameters(flatten_opts(opts))
        try:
            id_file.write_text(exp.id)
            (out / "comet_url.txt").write_text(str(exp.url))
        except Exception:
            pass
        return exp
    except Exception as e:
        print(f"comet disabled ({e}); logging to console/JSONL only")
        return None


def main(argv):
    # pod door: join the multi-host coordination service BEFORE anything
    # queries jax.devices() (no-op single-host; parallel/distributed.py)
    from climategan_tpu.parallel.distributed import maybe_init_distributed

    maybe_init_distributed(verbose=1)

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

    comet_exp = setup_comet(opts, resuming=bool(opts.train.get("resume")
                                                or resume))

    # persist the run's opts next to the checkpoints (reference
    # train.py:170-172) so resume_from_path can rebuild the trainer
    try:
        import yaml

        with (out / "opts.yaml").open("w") as f:
            yaml.safe_dump(opts.to_dict(), f)
    except Exception as e:
        print(f"could not write opts.yaml: {e}")

    trainer = Trainer(opts, comet_exp=comet_exp)
    trainer.setup()
    if opts.train.get("resume") or resume:
        trainer.resume()
    trainer.train()
    print("done")


if __name__ == "__main__":
    main(sys.argv[1:])

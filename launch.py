#!/usr/bin/env python
"""Experiment launcher: hyper-parameter search over train.py runs.

Re-design of reference sbatch.py (SLURM script generator with sampling
modes). TPU-native analog: expands a YAML experiment file into a set of
dotted-override command lines and either prints them (--dry), writes shell
scripts per run (--scripts_dir), or executes them sequentially.

Experiment YAML format (same sampling semantics as the reference's
shared/experiment/*.yaml):

  runs: 4                      # number of sampled runs (ignored: cartesian)
  searches:
    gen.opt.lr.default: {sample: list, from: [1e-4, 5e-5]}
    dis.opt.lr.default: {sample: range, from: [1e-5, 1e-4]}
    train.epochs:       {sample: uniform, from: [10, 50]}
  cartesian: false             # true => cross-product of all `list` searches
  base_overrides:
    tasks: "[m,s,d,p]"
"""
from __future__ import annotations

import argparse
import itertools
import random
import shlex
import subprocess
import sys
from pathlib import Path

import yaml


def sample_value(spec, rng: random.Random):
    mode = spec.get("sample", "list")
    src = spec.get("from")
    if mode == "list":
        return rng.choice(src)
    if mode == "uniform":
        lo, hi = float(src[0]), float(src[1])
        return rng.uniform(lo, hi)
    if mode == "range":  # log-uniform between bounds (reference 'range')
        import math

        lo, hi = float(src[0]), float(src[1])
        return math.exp(rng.uniform(math.log(lo), math.log(hi)))
    if mode == "sequential":
        return src  # handled by caller
    raise ValueError(f"Unknown sampling mode {mode}")


def expand(exp: dict, seed: int = 0):
    rng = random.Random(seed)
    searches = exp.get("searches", {}) or {}
    base = exp.get("base_overrides", {}) or {}
    runs = int(exp.get("runs", 1))

    configs = []
    if exp.get("cartesian"):
        keys = list(searches.keys())
        value_lists = [s["from"] for s in searches.values()]
        for combo in itertools.product(*value_lists):
            configs.append({**base, **dict(zip(keys, combo))})
    else:
        seq_keys = {k: s["from"] for k, s in searches.items()
                    if s.get("sample") == "sequential"}
        n = max([runs] + [len(v) for v in seq_keys.values()])
        for i in range(n):
            cfg = dict(base)
            for k, s in searches.items():
                if s.get("sample") == "sequential":
                    cfg[k] = s["from"][i % len(s["from"])]
                else:
                    cfg[k] = sample_value(s, rng)
            configs.append(cfg)
    # render a {i} run-index placeholder in string overrides (e.g. per-run
    # output_path)
    configs = [
        {k: (v.format(i=i) if isinstance(v, str) and "{i}" in v else v)
         for k, v in cfg.items()}
        for i, cfg in enumerate(configs)
    ]
    return configs


def to_cmd(cfg: dict, train_py: str = "train.py"):
    parts = [sys.executable, train_py]
    for k, v in cfg.items():
        parts.append(f"{k}={v}")
    return parts


# header keys understood in the experiment YAML's `slurm:` section, in the
# reference's template order (sbatch.py / shared/template/*.sh)
_SLURM_KEYS = (
    ("job_name", "--job-name"),
    ("partition", "--partition"),
    ("time", "--time"),
    ("mem", "--mem"),
    ("cpus", "--cpus-per-task"),
    ("gres", "--gres"),
    ("output", "--output"),
    # pod training: ntasks/nodes > 1 launches one process per host and
    # train.py auto-joins jax.distributed from the SLURM env
    # (climategan_tpu/parallel/distributed.py)
    ("nodes", "--nodes"),
    ("ntasks", "--ntasks"),
)


def render_script(line: str, i: int, slurm: dict | None) -> str:
    """One runnable script per run; with a `slurm:` section it gets #SBATCH
    headers like the reference's generated scripts (sbatch.py templates)."""
    header = ["#!/bin/sh"]
    if slurm:
        for key, flag in _SLURM_KEYS:
            if key in slurm:
                val = str(slurm[key]).format(i=i)
                header.append(f"#SBATCH {flag}={val}")
    return "\n".join(header) + f"\n{line}\n"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-e", "--experiment", required=True,
                    help="experiment YAML file")
    ap.add_argument("--dry", action="store_true", help="print commands only")
    ap.add_argument("--scripts_dir", default=None,
                    help="write one .sh per run instead of executing")
    ap.add_argument("--submit", choices=["none", "sbatch", "bash",
                                         "background"],
                    default="none",
                    help="submit the generated scripts: sbatch (SLURM, like "
                         "the reference), bash (sequential), background "
                         "(parallel local processes; pids written next to "
                         "the scripts)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    with open(args.experiment) as f:
        exp = yaml.safe_load(f)

    configs = expand(exp, args.seed)
    slurm = exp.get("slurm") or None
    train_py = exp.get("script", "train.py")
    print(f"{len(configs)} runs")

    scripts = []
    for i, cfg in enumerate(configs):
        cmd = to_cmd(cfg, train_py)
        line = " ".join(shlex.quote(c) for c in cmd)
        if args.dry:
            print(line)
            continue
        if args.scripts_dir or args.submit != "none":
            d = Path(args.scripts_dir or "launch_scripts")
            d.mkdir(parents=True, exist_ok=True)
            sh = d / f"run_{i:03d}.sh"
            sh.write_text(render_script(line, i, slurm))
            sh.chmod(0o755)
            scripts.append(sh)
            print(f"wrote {sh}")
        else:
            print(f"--- run {i} ---\n{line}")
            subprocess.run(cmd, check=True)

    if args.submit == "sbatch":
        import shutil

        if shutil.which("sbatch") is None:
            print("sbatch not found on this host; scripts were written but "
                  "not submitted", file=sys.stderr)
            return 1
        for sh in scripts:
            out = subprocess.run(["sbatch", str(sh)], capture_output=True,
                                 text=True, check=True)
            print(out.stdout.strip())
    elif args.submit == "bash":
        for sh in scripts:
            print(f"--- {sh.name} ---")
            subprocess.run(["/bin/sh", str(sh)], check=True)
    elif args.submit == "background":
        for sh in scripts:
            log = sh.with_suffix(".log")
            with open(log, "w") as lf:
                proc = subprocess.Popen(["/bin/sh", str(sh)], stdout=lf,
                                        stderr=subprocess.STDOUT)
            sh.with_suffix(".pid").write_text(str(proc.pid))
            print(f"started {sh.name} pid={proc.pid} log={log}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

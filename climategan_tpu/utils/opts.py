"""Config / opts system.

TPU-native re-design of the reference's 3-tier YAML opts merge
(reference: climategan/utils.py:108-234 `load_opts`): defaults <- config file
<- dotted commandline overrides, with derived fields (``opts.domains`` from
``opts.tasks``) and the events config attached under ``opts.events``.

We keep the same *semantics* (attribute-access dict, deep merge, dotted
overrides) but implement it standalone (no addict/hydra dependency) so the
opts object can be treated as a plain pytree-of-leaves wherever needed.
"""
from __future__ import annotations

import copy
import os
import re
from pathlib import Path
from typing import Any, Mapping, Optional

import yaml


class Opts(dict):
    """A dict with attribute access and recursive wrapping.

    Mirrors the behavior the reference gets from ``addict.Dict`` for the
    subset of features used: attribute get/set, nesting, ``.get``.
    Missing attribute access returns an empty Opts (addict semantics), which
    the reference relies on for optional keys like ``opts.events.fire.get(..)``.
    """

    def __init__(self, *args, **kwargs):
        super().__init__()
        for arg in args:
            if isinstance(arg, Mapping):
                for k, v in arg.items():
                    self[k] = v
            elif arg is None:
                continue
            else:
                raise TypeError(f"Cannot build Opts from {type(arg)}")
        for k, v in kwargs.items():
            self[k] = v

    def __setitem__(self, key, value):
        if isinstance(value, Mapping) and not isinstance(value, Opts):
            value = Opts(value)
        elif isinstance(value, (list, tuple)):
            value = type(value)(
                Opts(v) if isinstance(v, Mapping) and not isinstance(v, Opts) else v
                for v in value
            )
        super().__setitem__(key, value)

    def __getattr__(self, key):
        if key.startswith("__") and key.endswith("__"):
            # protocol lookups (__deepcopy__, __getstate__, ...) must fail
            # honestly or copy/pickle machinery misfires
            raise AttributeError(key)
        try:
            return self[key]
        except KeyError:
            # addict-style: missing keys resolve to empty dicts so that
            # `opts.a.b.c` never raises; emptiness is falsy.
            return Opts()

    def __setattr__(self, key, value):
        self[key] = value

    def __delattr__(self, key):
        try:
            del self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def copy(self) -> "Opts":
        return Opts(copy.deepcopy(dict(self)))

    def to_dict(self) -> dict:
        out = {}
        for k, v in self.items():
            if isinstance(v, Opts):
                out[k] = v.to_dict()
            elif isinstance(v, (list, tuple)):
                out[k] = type(v)(
                    i.to_dict() if isinstance(i, Opts) else i for i in v
                )
            else:
                out[k] = v
        return out


def merge(source: Mapping, destination: Opts) -> Opts:
    """Deep-merge ``source`` into ``destination`` (source wins).

    Same contract as reference climategan/utils.py:68-105 `merge`.
    """
    for key, value in source.items():
        if isinstance(value, Mapping):
            node = destination.get(key)
            if not isinstance(node, Mapping):
                node = Opts()
                destination[key] = node
            merge(value, node)
        else:
            destination[key] = value
    return destination


def _parse_value(value: str) -> Any:
    """Parse a commandline override value with YAML semantics."""
    try:
        return yaml.safe_load(value)
    except yaml.YAMLError:
        return value


def set_dotted(opts: Opts, dotted_key: str, value: Any) -> None:
    """Set ``opts`` at a dotted key path, creating intermediate Opts."""
    parts = dotted_key.split(".")
    node = opts
    for p in parts[:-1]:
        nxt = node.get(p)
        if not isinstance(nxt, Opts):
            nxt = Opts()
            node[p] = nxt
        node = nxt
    node[parts[-1]] = value


def parse_overrides(args: list[str]) -> Opts:
    """Parse hydra-style ``key.sub=value`` commandline overrides."""
    out = Opts()
    for arg in args:
        if "=" not in arg:
            raise ValueError(f"Override must be key=value, got {arg!r}")
        key, value = arg.split("=", 1)
        set_dotted(out, key.strip(), _parse_value(value))
    return out


def env_expand(path: str) -> str:
    """Expand $ENV vars and ~ in paths (reference utils.py:367)."""
    return os.path.expanduser(os.path.expandvars(str(path)))


_DEFAULTS_PATH = Path(__file__).resolve().parent.parent / "config" / "defaults.yaml"
_EVENTS_PATH = Path(__file__).resolve().parent.parent / "config" / "events.yaml"


def load_yaml(path) -> Opts:
    with open(path, "r") as f:
        return Opts(yaml.safe_load(f) or {})


def load_opts(
    path=None,
    default=None,
    commandline_opts=None,
    events_path=None,
) -> Opts:
    """Load the full opts tree.

    Precedence: ``default`` (path or dict) <- ``path`` (config file)
    <- ``commandline_opts`` (dict or list of "a.b=c" strings).

    Derived fields (mirroring reference climategan/utils.py:164-206):
      * ``opts.domains``: from tasks — {m,s,d} => [r, s]; p => [rf];
        kitti data files present => + [kitti]
      * ``opts.events``: contents of events.yaml
    """
    if default is None:
        default = _DEFAULTS_PATH
    if isinstance(default, (str, Path)):
        opts = load_yaml(default)
    else:
        opts = Opts(copy.deepcopy(dict(default)))

    if path is not None:
        overrides = load_yaml(path) if isinstance(path, (str, Path)) else Opts(path)
        opts = merge(overrides, opts)

    if commandline_opts is not None:
        if isinstance(commandline_opts, (list, tuple)):
            commandline_opts = parse_overrides(list(commandline_opts))
        opts = merge(Opts(commandline_opts), opts)

    # ---- derived: domains from tasks (reference utils.py:164-172) ----
    tasks = list(opts.get("tasks") or [])
    domains = []
    if any(t in tasks for t in "msd"):
        domains.extend(["r", "s"])
    if "p" in tasks:
        domains.append("rf")
    if opts.get("data", Opts()).get("files", Opts()).get("train", Opts()).get("kitti"):
        if opts.train.get("kitti", Opts()).get("pretrain"):
            domains.append("kitti")
    opts["domains"] = domains

    # ---- derived: attach events config (reference utils.py:199-206) ----
    ev_path = events_path or _EVENTS_PATH
    if "events" not in opts and Path(ev_path).exists():
        opts["events"] = load_yaml(ev_path)

    return opts


def flatten_opts(opts: Mapping, prefix: str = "") -> dict:
    """Flatten nested opts into {dotted.key: leaf} (reference utils.py:385)."""
    out = {}
    for k, v in opts.items():
        key = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, Mapping):
            out.update(flatten_opts(v, key))
        elif isinstance(v, list) and v and isinstance(v[0], Mapping):
            for i, item in enumerate(v):
                out.update(flatten_opts(item, f"{key}.{i}"))
        else:
            out[key] = v
    return out


def find_existing_training(opts, job_id: Optional[str] = None):
    """Auto-resume support (reference utils.py:741-805 + train.py:87-100):
    look for sibling output dirs whose job_id file matches the current job
    (env CLIMATEGAN_JOB_ID / SLURM_JOBID) and return the newest one."""
    job_id = job_id or os.environ.get("CLIMATEGAN_JOB_ID") \
        or os.environ.get("SLURM_JOBID")
    if not job_id:
        return None
    base = Path(env_expand(opts.output_path)).resolve()
    candidates = []
    for d in base.parent.glob(base.name + "*"):
        jid = d / "job_id.txt"
        if jid.exists() and jid.read_text().strip() == str(job_id):
            candidates.append(d)
    if not candidates:
        return None
    return max(candidates, key=lambda d: d.stat().st_mtime)


def write_job_id(output_path, job_id: Optional[str] = None):
    job_id = job_id or os.environ.get("CLIMATEGAN_JOB_ID") \
        or os.environ.get("SLURM_JOBID")
    if job_id:
        Path(output_path).mkdir(parents=True, exist_ok=True)
        (Path(output_path) / "job_id.txt").write_text(str(job_id))


def get_increased_path(path) -> Path:
    """Return a non-existing sibling path by appending ' (i)'.

    Mirrors reference climategan/utils.py:308-340.
    """
    path = Path(path).resolve()
    if not path.exists():
        return path
    stem = re.sub(r" \(\d+\)$", "", path.name)
    i = 1
    while (path.parent / f"{stem} ({i})").exists():
        i += 1
    return path.parent / f"{stem} ({i})"

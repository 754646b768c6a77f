"""Serving-path checkpoint resolution: load generator variables for
inference from ANY supported checkpoint flavor.

The reference's product story is "download the released trained weights
and point apply_events.py -r at them" (reference README.md:49-58); its
resume machinery accepts bare ``.pth`` files or run dirs containing
``checkpoints/latest_ckpt.pth`` (reference trainer.py:336-394,422-546).
This framework additionally has its own orbax run dirs. This module
classifies a resume path and returns flax generator variables ready for
``build_infer_fn`` / ``G.apply``:

  * **orbax run dir** — ``<run>/checkpoints/latest.json`` (this
    framework's ``Trainer.save()`` output);
  * **torch .pth file** — a released ClimateGAN checkpoint (either a bare
    G state dict or the reference's ``{"G": ..., "g_opt": ...}`` save
    dict), converted through ``utils.convert.convert_generator``;
  * **reference-style run dir** — a dir holding ``opts.yaml`` +
    ``checkpoints/latest_ckpt.pth`` (or any ``*.pth``), exactly what the
    reference's own training runs produce.

Opts are discovered next to the checkpoint (``opts.json`` / ``opts.yaml``
in the run dir) and merged over this framework's defaults — the two
projects share the same 3-tier YAML schema, so reference run dirs load
directly. A bare ``.pth`` with no adjacent opts uses the defaults, which
match the released checkpoints' architecture.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Tuple

_BOTH = ("masker", "painter")


def find_torch_ckpt(d: Path) -> Optional[Path]:
    """Locate a torch checkpoint under a run dir the way the reference
    does (trainer.py:440-527: ``<dir>/checkpoints/latest_ckpt.pth``),
    falling back to the newest ``*.pth`` in ``checkpoints/`` or the dir
    itself."""
    for base in (d / "checkpoints", d):
        if not base.is_dir():
            continue
        latest = base / "latest_ckpt.pth"
        if latest.exists():
            return latest
        pths = sorted(base.glob("*.pth")) + sorted(base.glob("*.pt"))
        if pths:
            return pths[-1]
    return None


def resolve_checkpoint(path) -> Tuple[str, Path]:
    """Classify a resume path -> ("orbax", run_dir) | ("torch", pth_file).

    Raises FileNotFoundError with the flavors tried when nothing matches.
    """
    p = Path(str(path)).expanduser().resolve()
    if p.is_file():
        if p.suffix in (".pth", ".pt"):
            return "torch", p
        raise FileNotFoundError(
            f"{p} is a file but not a torch checkpoint (.pth/.pt)"
        )
    if p.is_dir():
        if (p / "checkpoints" / "latest.json").exists():
            return "orbax", p
        if (p / "latest.json").exists():  # the checkpoints dir itself
            return "orbax", p.parent
        t = find_torch_ckpt(p)
        if t is not None:
            return "torch", t
    raise FileNotFoundError(
        f"no checkpoint found at {p}: expected an orbax run dir "
        f"(checkpoints/latest.json), a torch .pth file, or a reference-"
        f"style run dir (checkpoints/latest_ckpt.pth)"
    )


def run_dir_of(kind: str, p: Path) -> Path:
    """The run directory a resolved checkpoint belongs to (where
    opts.json/opts.yaml live)."""
    if kind == "orbax":
        return p
    run = p.parent
    if run.name == "checkpoints":
        run = run.parent
    return run


def discover_opts(run: Path, overrides=None):
    """Load opts from the run dir when present, else defaults (+CLI
    overrides) — the reference's get_latest_opts (utils.py:826-841)."""
    from climategan_tpu.utils.opts import load_opts

    for cand in ("opts.json", "opts.yaml", "opts.yml"):
        f = run / cand
        if f.exists():
            return load_opts(path=f, commandline_opts=overrides)
    return load_opts(commandline_opts=overrides)


def init_generator_variables(opts, G=None, rng_seed: int = 0) -> Dict:
    """Build a generator variable tree as a structure donor for torch
    conversion — via ``jax.eval_shape`` (no XLA compile, instant even for
    the full model) with leaves materialized as zeros. A converted
    checkpoint overwrites every leaf of the modules it covers; modules a
    lenient partial load skips stay zeros, which ``convert_generator``
    warns about loudly (they were unusable random inits in the reference's
    strict=False path too). Conv/BN parameter shapes are H,W-independent,
    so the abstract trace runs at the smallest size the painter's
    2^spade_n_up latent constraint allows."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from climategan_tpu.models.generator import GenConfig, create_generator

    cfg = GenConfig.from_opts(opts)
    if G is None:
        G = create_generator(opts)
    size = max(64, 2 ** cfg.p_spade_n_up if "p" in cfg.tasks else 64)
    x0 = jnp.zeros((1, size, size, 3), jnp.float32)
    shapes = jax.eval_shape(G.init, jax.random.PRNGKey(rng_seed), x0)
    return jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), shapes
    )


_MASKER_MODULES = ("encoder", "depth_decoder", "seg_decoder", "mask_decoder")
_PAINTER_MODULES = ("painter",)


def _copy_modules(base: Dict, src: Dict, parts: Tuple[str, ...]) -> Dict:
    """Copy masker/painter top-level module subtrees from ``src`` into a
    shallow-copied ``base`` across every collection."""
    modules = []
    if "masker" in parts:
        modules += list(_MASKER_MODULES)
    if "painter" in parts:
        modules += list(_PAINTER_MODULES)
    out = {}
    for coll in set(base) | set(src):
        b = dict(base.get(coll, {}))
        s = src.get(coll, {})
        for mod in modules:
            if mod in s:
                b[mod] = s[mod]
        out[coll] = b
    return out


def load_variables(path, opts, G=None, parts: Tuple[str, ...] = _BOTH,
                   into: Optional[Dict] = None,
                   allow_pickle: bool = False) -> Dict:
    """Load generator variables (or the masker/painter subset named by
    ``parts``) from any checkpoint flavor. Leaves outside ``parts`` come
    from ``into`` (or a fresh init when None)."""
    from climategan_tpu.utils.checkpoint import load_generator_variables

    kind, p = resolve_checkpoint(path)
    if kind == "orbax":
        v = load_generator_variables(p / "checkpoints", None)
        if v is None:
            raise FileNotFoundError(f"orbax restore failed under {p}")
        if into is None and set(parts) == set(_BOTH):
            return v
        base = into if into is not None else v
        return _copy_modules(base, v, parts)

    from climategan_tpu.models.generator import GenConfig
    from climategan_tpu.utils.convert import (
        convert_generator,
        load_torch_state_dict,
    )

    sd = load_torch_state_dict(str(p), allow_pickle=allow_pickle)
    base = into if into is not None else init_generator_variables(opts, G)
    return convert_generator(base, sd, GenConfig.from_opts(opts),
                             parts=parts, lenient=True)


def load_inference_variables(resume_path, overrides=None, G=None,
                             allow_pickle: bool = False):
    """One-call serving entry: resume path of any flavor ->
    ``(opts, variables)``. This is what ``apply_events.py -r`` and
    ``eval_masker.py -r`` use (reference apply_events.py:454-468 +
    trainer.py:336-394)."""
    kind, p = resolve_checkpoint(resume_path)
    opts = discover_opts(run_dir_of(kind, p), overrides)
    variables = load_variables(resume_path, opts, G=G,
                               allow_pickle=allow_pickle)
    return opts, variables

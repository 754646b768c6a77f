"""Checkpoint save/restore via orbax (reference: trainer.py:396-579).

The reference writes torch state dicts ({epoch, G, g_opt, D, d_opt}) to
latest_ckpt.pth with M/P/PM precedence rules on resume. Here the whole
functional TrainState (params + batch_stats + spectral + both ExtraAdam
states + step) is one orbax PyTree checkpoint; partial (masker-only /
painter-only) restores are selected by top-level module name.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Tuple

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(directory, state, epoch: int, opts=None) -> Path:
    """latest_ckpt every epoch + periodic epoch_N keeps (reference
    trainer.py:396-420, cadence defaults.yaml:313-314)."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)

    save_n = int(opts.train.get("save_n_epochs", 25)) if opts else 25
    min_save = int(opts.train.get("min_save_epoch", 28)) if opts else 28
    keep = epoch >= min_save and epoch % max(save_n, 1) == 0
    path = (directory / (f"epoch_{epoch}" if keep else "latest_ckpt")).resolve()

    if _HAS_ORBAX:
        import shutil

        if path.exists():
            shutil.rmtree(path)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, _to_host(state), force=True)
        ckptr.wait_until_finished()
    else:
        np.save(str(path) + ".npy",
                np.array(jax.tree_util.tree_leaves(_to_host(state)),
                         dtype=object), allow_pickle=True)

    meta = {"epoch": epoch, "latest": str(path)}
    with open(directory / "latest.json", "w") as f:
        json.dump(meta, f)
    if opts is not None:
        with open(directory.parent / "opts.json", "w") as f:
            json.dump(opts.to_dict() if hasattr(opts, "to_dict") else dict(opts),
                      f, indent=2, default=str)
    return path


def restore_checkpoint(directory, target_state) -> Tuple[Optional[object], int]:
    """Restore the latest checkpoint into the structure of target_state.

    The saved tree's key paths must match ``target_state``'s exactly —
    resuming after the model structure drifted (e.g. a module was added)
    raises with the offending paths instead of silently misassigning
    leaves positionally."""
    directory = Path(directory)
    meta_path = directory / "latest.json"
    if not meta_path.exists() or not _HAS_ORBAX:
        return None, -1
    with open(meta_path) as f:
        meta = json.load(f)
    ckptr = ocp.StandardCheckpointer()
    host_target = _to_host(target_state)

    def paths(tree):
        flat, _ = jax.tree_util.tree_flatten_with_path(tree)
        return [jax.tree_util.keystr(p) for p, _ in flat]

    def mismatch_error(saved_tree):
        got, want = set(paths(saved_tree)), set(paths(host_target))
        missing = sorted(want - got)[:8]
        extra = sorted(got - want)[:8]
        return ValueError(
            f"checkpoint structure mismatch vs current model: "
            f"missing={missing} extra={extra} "
            f"(saved at {meta['latest']})"
        )

    try:
        restored = ckptr.restore(Path(meta["latest"]).resolve(), host_target)
    except Exception:
        # orbax raises opaque errors on tree-structure drift; re-read the
        # raw tree to produce an actionable key-path diff
        raw = ckptr.restore(Path(meta["latest"]).resolve())
        raise mismatch_error(raw) from None
    if paths(restored) != paths(host_target):
        raise mismatch_error(restored)
    restored = jax.tree_util.tree_map(jax.numpy.asarray, restored)
    restored = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(target_state),
        jax.tree_util.tree_leaves(restored),
    )
    return restored, int(meta["epoch"])


_MASKER_MODULES = ("encoder", "depth_decoder", "seg_decoder", "mask_decoder")
_PAINTER_MODULES = ("painter",)


def load_partial_state(directory, state, parts=("masker", "painter")):
    """Copy masker and/or painter subtrees from another run's checkpoint
    into ``state`` (the reference's load_paths.m / .p / .pm semantics,
    trainer.py:422-579 + defaults.yaml:2-14)."""
    directory = Path(directory)
    meta_path = directory / "latest.json"
    if not meta_path.exists() or not _HAS_ORBAX:
        return None
    with open(meta_path) as f:
        meta = json.load(f)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(Path(meta["latest"]).resolve())
    if not (isinstance(restored, dict) and "g_params" in restored):
        return None

    modules = []
    if "masker" in parts:
        modules += list(_MASKER_MODULES)
    if "painter" in parts:
        modules += list(_PAINTER_MODULES)

    g_params = dict(state.g_params)
    g_state = {k: dict(v) for k, v in state.g_state.items()}
    for mod in modules:
        if mod in restored["g_params"]:
            g_params[mod] = jax.tree_util.tree_map(
                jax.numpy.asarray, restored["g_params"][mod]
            )
        for coll, tree in restored.get("g_state", {}).items():
            if coll in g_state and mod in tree:
                g_state[coll][mod] = jax.tree_util.tree_map(
                    jax.numpy.asarray, tree[mod]
                )
    return state._replace(g_params=g_params, g_state=g_state)


def load_generator_variables(directory, target_variables):
    """Restore only generator variables (inference path; the analog of the
    reference's lenient inference state-dict load, trainer.py:527-546)."""
    directory = Path(directory)
    meta_path = directory / "latest.json"
    if not meta_path.exists() or not _HAS_ORBAX:
        return None
    with open(meta_path) as f:
        meta = json.load(f)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(Path(meta["latest"]).resolve())
    # TrainState fields: g_params, g_state, ...
    if isinstance(restored, dict) and "g_params" in restored:
        return {"params": restored["g_params"], **restored["g_state"]}
    return None

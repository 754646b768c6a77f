"""Model summaries (analog of reference climategan/strings.py +
tutils.write_architecture): human-readable architecture dumps and parameter
counts, written to the run directory."""
from __future__ import annotations

from pathlib import Path
from typing import Dict

import jax
import numpy as np


def count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def param_summary(params: Dict, max_depth: int = 2) -> str:
    """Per-submodule parameter counts, nested up to max_depth."""
    lines = []

    def walk(node, path, depth):
        if not isinstance(node, dict) or depth >= max_depth:
            n = count_params(node)
            lines.append(f"{'  ' * depth}{'/'.join(path) or 'total'}: {n:,}")
            return
        for k in sorted(node.keys()):
            walk(node[k], path + (k,), depth + 1)

    total = count_params(params)
    lines.append(f"total params: {total:,}")
    for k in sorted(params.keys()):
        walk(params[k], (k,), 0)
    return "\n".join(lines)


def write_architecture(output_path, state, opts=None) -> None:
    """Dump parameter summaries (reference tutils.py:616-645)."""
    out = Path(str(output_path))
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "archi_num_params.txt", "w") as f:
        f.write("=== Generator ===\n")
        f.write(param_summary(state.g_params))
        f.write("\n\n=== Discriminators ===\n")
        f.write(param_summary(state.d_params))
        f.write("\n")

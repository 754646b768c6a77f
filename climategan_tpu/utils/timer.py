"""Timer utilities (reference climategan/utils.py:919-959).

The reference uses CUDA events + sync; the JAX equivalent blocks on device
results (block_until_ready) around the timed region.
"""
from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import numpy as np


class Timer:
    """Context manager appending elapsed seconds to a store list."""

    def __init__(self, name: str = "", store: Optional[list] = None,
                 precision: int = 3, ignore: bool = False, sync=None):
        self.name = name
        self.store = store
        self.precision = precision
        self.ignore = ignore
        self.sync = sync  # value/pytree to block_until_ready on exit

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync is not None:
            jax.block_until_ready(self.sync)
        elapsed = time.perf_counter() - self._start
        if self.store is not None:
            self.store.append(elapsed)
        elif not self.ignore and self.name:
            print(f"[Timer] {self.name}: {elapsed:.{self.precision}f}s")
        return False


def stores_report(stores: Dict[str, List[float]]) -> str:
    """mean +/- std per stage, like apply_events.py:244-291."""
    lines = []
    for name, values in stores.items():
        if not values:
            continue
        v = np.asarray(values)
        lines.append(f"{name:>20}: {v.mean():.3f} +/- {v.std():.3f} "
                     f"(n={len(v)})")
    return "\n".join(lines)

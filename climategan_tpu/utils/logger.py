"""Training logger: console JSONL + optional comet.ml.

Re-design of reference climategan/logger.py: the reference logs scalars,
learning rates and image panels to comet.ml (logger.py:220-294, 28-219)
with console fallback. Here the primary sink is a local JSONL metrics file
(works in any environment); a comet experiment object can be passed through
and is used when available.
"""
from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict

import numpy as np


class Logger:
    def __init__(self, opts, comet_exp=None, log_every: int = 50):
        self.opts = opts
        self.exp = comet_exp
        self.log_every = log_every
        self.start_time = time.time()
        self._last_step_time = time.time()
        out = Path(str(opts.get("output_path", "."))) if opts else Path(".")
        out.mkdir(parents=True, exist_ok=True)
        self.metrics_path = out / "metrics.jsonl"

    def print(self, *args):
        print("[climategan_tpu]", *args, flush=True)

    def _to_float(self, metrics: Dict) -> Dict[str, float]:
        out = {}
        for k, v in metrics.items():
            try:
                out[k] = float(np.asarray(v))
            except Exception:
                continue
        return out

    def _write(self, record: Dict):
        # pod-safe: only host 0 appends (metrics are batch-global —
        # XLA reductions already span every process's devices)
        import jax

        if jax.process_index() != 0:
            return
        with open(self.metrics_path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def log_step(self, step: int, metrics: Dict):
        if step % self.log_every != 0:
            return
        now = time.time()
        rec = {
            "step": step,
            "t": round(now - self.start_time, 2),
            "step_time": round(now - self._last_step_time, 4),
            **self._to_float(metrics),
        }
        self._last_step_time = now
        self._write(rec)
        if self.exp is not None:
            self.exp.log_metrics(self._to_float(metrics), step=step)
        self.print(
            f"step {step} g={rec.get('g_total', float('nan')):.4f} "
            f"d={rec.get('d_total', float('nan')):.4f}"
        )

    def log_epoch_time(self, epoch: int, seconds: float, n_steps: int):
        rec = {"epoch": epoch, "epoch_time_s": round(seconds, 2),
               "steps": n_steps}
        self._write(rec)
        self.print(f"epoch {epoch}: {n_steps} steps in {seconds:.1f}s")

    def log_metrics(self, metrics: Dict):
        rec = self._to_float(metrics)
        if rec:
            self._write(rec)
            if self.exp is not None:
                self.exp.log_metrics(rec)
            self.print(" ".join(f"{k}={v:.4f}" for k, v in rec.items()))

    def log_images(self, name: str, images: np.ndarray, step: int = 0):
        """Save an image grid to disk (and comet if available)."""
        try:
            import jax

            if jax.process_index() != 0:  # pod-safe: host 0 only
                return
            import cv2

            out = Path(str(self.opts.get("output_path", "."))) / "images"
            out.mkdir(parents=True, exist_ok=True)
            grid = np.concatenate(list(images), axis=1)
            if grid.dtype != np.uint8:
                grid = (np.clip(grid, 0, 1) * 255).astype(np.uint8)
            cv2.imwrite(str(out / f"{name}_{step}.png"), grid[..., ::-1])
            if self.exp is not None:
                self.exp.log_image(grid, name=name, step=step)
        except Exception as e:  # logging must never kill training
            self.print(f"log_images failed: {e}")

"""Tiny-config helpers for tests and multi-chip dry runs.

Produces a structurally complete (all tasks, all heads, all discriminators)
but miniature configuration so full G/D training steps compile in seconds
on CPU. Mirrors the reference's functional-test philosophy
(tests/test_trainer.py:181-196: tiny data, small batch).
"""
from __future__ import annotations

from climategan_tpu.utils.opts import load_opts


def tiny_opts(image_size: int = 64, tasks=("d", "s", "m", "p")):
    """Small-but-complete opts: thin encoder, narrow painter, tiny targets."""
    assert image_size % 32 == 0
    # d/s target sizes: must survive 5 stride-2 convs in the ADVENT
    # discriminators (>= 32), like the reference's 160x160 targets
    feat = max(image_size // 4, 32)
    overrides = {
        "tasks": list(tasks),
        "gen": {
            "deeplabv2": {"nblocks": [1, 1, 1, 1]},
            "p": {"latent_dim": 32, "spade_n_up": 5},
            "m": {"proj_dim": 16, "n_res": 1},
        },
        "data": {
            "transforms": [
                {"name": "resize", "ignore": False, "new_size": image_size,
                 "keep_aspect_ratio": True},
                {"name": "resize", "ignore": False,
                 "new_size": {"default": image_size, "d": feat, "s": feat}},
            ],
            "loaders": {"batch_size": 2, "num_workers": 0},
        },
        "dis": {"p": {"n_layers": 2, "ndf": 16, "num_D": 2}},
        "train": {"fid": {"n_images": 2, "batch_size": 2}},
    }
    return load_opts(path=None, commandline_opts=overrides)

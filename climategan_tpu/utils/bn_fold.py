"""Conv+BN folding (the XLA-era answer to reference climategan/bn_fusion.py).

Under jit with ``use_running_average=True`` the BN affine is a constant
scale/shift that XLA folds into the convolution at compile time, so unlike
the torch reference no graph surgery is needed for inference speed. This
module still provides the explicit fold:
  * as pure math (`fold_conv_bn`) used by tests to assert the rewrite is
    numerically exact (the 'assert XLA folds it' test, SURVEY.md §7.9), and
  * as a variables-tree rewrite (`fold_generator_bns`) that bakes BN into
    conv weights to shrink the param count for deployment/export.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def fold_conv_bn(
    kernel: jax.Array,           # HWIO
    bias,                        # (O,) or None
    scale,                       # BN gamma (O,) or None
    bn_bias,                     # BN beta (O,) or None
    mean: jax.Array,             # running mean (O,)
    var: jax.Array,              # running var (O,)
    eps: float = 1e-5,
) -> Tuple[jax.Array, jax.Array]:
    """Return (kernel', bias') such that conv(x,k')+b' == BN(conv(x,k)+b).

    Mirrors reference bn_fusion.py:121-132 (_calculate_alpha_beta).
    """
    gamma = jnp.ones_like(mean) if scale is None else scale
    beta = jnp.zeros_like(mean) if bn_bias is None else bn_bias
    alpha = gamma * jax.lax.rsqrt(var + eps)
    b = jnp.zeros_like(mean) if bias is None else bias
    new_kernel = kernel * alpha[None, None, None, :]
    new_bias = (b - mean) * alpha + beta
    return new_kernel, new_bias


def _is_conv_bn(params_node: Dict, stats_node: Dict) -> bool:
    # Conv2dBlock pattern: {"conv": {kernel[, bias]}, "norm":
    # {"BatchNorm_0": {scale, bias}}} with stats norm/BatchNorm_0/...
    return (
        isinstance(params_node, dict)
        and "conv" in params_node
        and isinstance(params_node.get("norm"), dict)
        and "BatchNorm_0" in params_node["norm"]
        and isinstance(stats_node, dict)
        and "norm" in stats_node
    )


def _fold_node(v: Dict, stats_v: Dict) -> Dict:
    eps = 1e-5
    conv = dict(v["conv"])
    bnp = dict(v["norm"]["BatchNorm_0"])
    bns = stats_v["norm"]["BatchNorm_0"]
    gamma = bnp.get("scale", jnp.ones_like(bns["mean"]))
    beta = bnp.get("bias", jnp.zeros_like(bns["mean"]))
    alpha = gamma * jax.lax.rsqrt(bns["var"] + eps)
    # scale folds into the kernel; the shift stays in the BN bias with
    # identity stats (exact regardless of conv bias presence)
    conv["kernel"] = conv["kernel"] * alpha[None, None, None, :]
    if "bias" in conv:
        conv["bias"] = conv["bias"] * alpha
    new_bn = dict(bnp)
    if "scale" in new_bn:
        new_bn["scale"] = jnp.full_like(gamma, np.sqrt(1.0 + eps))
    if "bias" in new_bn:
        new_bn["bias"] = beta - alpha * bns["mean"]
    return {
        **{kk: vv for kk, vv in v.items() if kk != "norm"},
        "conv": conv,
        "norm": {"BatchNorm_0": new_bn},
    }


def _walk_fold(params: Dict, stats: Dict) -> Dict:
    """Fold every Conv2dBlock conv+BN pattern in the tree (incl. root)."""
    if _is_conv_bn(params, stats):
        return _fold_node(params, stats)
    out = {}
    for k, v in params.items():
        if not isinstance(v, dict):
            out[k] = v
            continue
        sub_stats = stats.get(k, {}) if isinstance(stats, dict) else {}
        out[k] = _walk_fold(v, sub_stats)
    return out


def reset_stats(stats):
    """Identity running stats to pair with folded params."""
    def f(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "mean":
            return jnp.zeros_like(x)
        if name == "var":
            return jnp.ones_like(x)
        return x

    return jax.tree_util.tree_map_with_path(f, stats)


def bake_spectral_norm(variables: Dict) -> Dict:
    """Divide every spectrally-normalized kernel by its sigma once, so
    inference can skip the per-call power iteration entirely
    (models.norms.frozen_spectral). Exact: the division uses the same
    single-iteration sigma estimate the runtime would compute."""
    from climategan_tpu.models.norms import spectral_normalize

    params = variables["params"]
    spectral = variables.get("spectral", {})

    def walk(p: Dict, s: Dict) -> Dict:
        out = {}
        for k, v in p.items():
            sv = s.get(k, {}) if isinstance(s, dict) else {}
            if (isinstance(v, dict) and "kernel" in v
                    and isinstance(sv, dict) and "u" in sv and "v" in sv):
                w, _, _ = spectral_normalize(v["kernel"], sv["u"], sv["v"])
                out[k] = {**v, "kernel": w}
            elif isinstance(v, dict):
                out[k] = walk(v, sv)
            else:
                out[k] = v
        return out

    out = dict(variables)
    out["params"] = walk(params, spectral)
    return out


def fold_generator_bns(variables: Dict) -> Dict:
    """Fold all Conv2dBlock conv+BN pairs in a variables tree."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    new_params = _walk_fold(params, stats)
    out = dict(variables)
    out["params"] = new_params
    out["batch_stats"] = reset_stats(stats)
    return out

"""Optimizers: ExtraAdam (extragradient Adam) + per-task LR groups +
step/multi-step schedulers, functional for jit.

Re-design of reference climategan/optim.py:
  * ExtraAdam (:137-291): extrapolation steps on even global steps, update
    steps on odd ones (trainer.py:674-694). Both advance the Adam moments;
    the update step applies Adam's delta to the parameters saved *before*
    the extrapolation. Here this is a pure function of an explicit state —
    the even/odd phase is a traced bool resolved with jnp.where, so the
    whole G/D step stays inside one compiled graph.
  * per-task param groups with per-task LRs (:54-123) — expressed as an
    lr-scale pytree over parameter paths.
  * step / multi_step LR schedules (:10-51) — pure functions of the epoch.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
PyTree = Any


class ExtraAdamState(NamedTuple):
    count: Array          # int32 number of update() calls (Adam "step")
    mu: PyTree            # first moments
    nu: PyTree            # second moments
    saved: PyTree         # params snapshot from the last extrapolation


def init_extra_adam(params: PyTree) -> ExtraAdamState:
    return ExtraAdamState(
        count=jnp.zeros((), jnp.int32),
        mu=jax.tree_util.tree_map(jnp.zeros_like, params),
        nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        # fresh buffers: `saved` must not alias `params` (buffer donation)
        saved=jax.tree_util.tree_map(jnp.copy, params),
    )


def extra_adam_step(
    grads: PyTree,
    state: ExtraAdamState,
    params: PyTree,
    lr: Array | float,
    extrapolate: Array,
    lr_scales: Optional[PyTree] = None,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> Tuple[PyTree, ExtraAdamState]:
    """One ExtraAdam call (either extrapolation or step, per ``extrapolate``).

    lr_scales, if given, is a pytree of scalars multiplying lr per leaf
    (the per-task param-group mechanism).
    """
    count = state.count + 1
    bc1 = 1.0 - b1 ** count.astype(jnp.float32)
    bc2 = 1.0 - b2 ** count.astype(jnp.float32)
    step_scale = jnp.sqrt(bc2) / bc1

    def upd(g, m, v, p, saved, scale):
        g = g.astype(jnp.float32)
        m_new = b1 * m + (1.0 - b1) * g
        v_new = b2 * v + (1.0 - b2) * g * g
        delta = -(lr * scale * step_scale) * m_new / (jnp.sqrt(v_new) + eps)
        base = jnp.where(extrapolate, p, saved)
        p_new = (base + delta).astype(p.dtype)
        saved_new = jnp.where(extrapolate, p, saved)
        return p_new, m_new, v_new, saved_new

    leaves_g, treedef = jax.tree_util.tree_flatten(grads)
    leaves_m = treedef.flatten_up_to(state.mu)
    leaves_v = treedef.flatten_up_to(state.nu)
    leaves_p = treedef.flatten_up_to(params)
    leaves_s = treedef.flatten_up_to(state.saved)
    if lr_scales is None:
        leaves_sc = [1.0] * len(leaves_g)
    else:
        leaves_sc = treedef.flatten_up_to(lr_scales)

    out = [upd(*t) for t in zip(leaves_g, leaves_m, leaves_v, leaves_p,
                                leaves_s, leaves_sc)]
    new_p = treedef.unflatten([o[0] for o in out])
    new_m = treedef.unflatten([o[1] for o in out])
    new_v = treedef.unflatten([o[2] for o in out])
    new_s = treedef.unflatten([o[3] for o in out])
    return new_p, ExtraAdamState(count=count, mu=new_m, nu=new_v, saved=new_s)


class AdamState(NamedTuple):
    count: Array
    mu: PyTree
    nu: PyTree


def init_adam(params: PyTree) -> AdamState:
    z = jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdamState(jnp.zeros((), jnp.int32), z,
                     jax.tree_util.tree_map(jnp.zeros_like, params))


def adam_step(grads, state: AdamState, params, lr, lr_scales=None,
              b1=0.9, b2=0.999, eps=1e-8):
    count = state.count + 1
    bc1 = 1.0 - b1 ** count.astype(jnp.float32)
    bc2 = 1.0 - b2 ** count.astype(jnp.float32)
    step_scale = jnp.sqrt(bc2) / bc1

    def upd(g, m, v, p, scale):
        g = g.astype(jnp.float32)
        m_new = b1 * m + (1.0 - b1) * g
        v_new = b2 * v + (1.0 - b2) * g * g
        p_new = (p - (lr * scale * step_scale) * m_new
                 / (jnp.sqrt(v_new) + eps)).astype(p.dtype)
        return p_new, m_new, v_new

    leaves_g, treedef = jax.tree_util.tree_flatten(grads)
    leaves_m = treedef.flatten_up_to(state.mu)
    leaves_v = treedef.flatten_up_to(state.nu)
    leaves_p = treedef.flatten_up_to(params)
    leaves_sc = ([1.0] * len(leaves_g) if lr_scales is None
                 else treedef.flatten_up_to(lr_scales))
    out = [upd(*t) for t in zip(leaves_g, leaves_m, leaves_v, leaves_p, leaves_sc)]
    return (treedef.unflatten([o[0] for o in out]),
            AdamState(count,
                      treedef.unflatten([o[1] for o in out]),
                      treedef.unflatten([o[2] for o in out])))


# --------------------------------------------------------------------------
# Optimizer menu (reference optim.py:109-123 selects ExtraAdam / NovoGrad /
# RAdam / RMSprop / Adam by opt_conf.optimizer.lower())
# --------------------------------------------------------------------------


def rmsprop_step(grads, state: AdamState, params, lr, lr_scales=None,
                 alpha=0.99, eps=1e-8):
    """torch.optim.RMSprop defaults (no momentum, no centering):
    v = alpha*v + (1-alpha)*g^2 ; p -= lr * g / (sqrt(v) + eps).
    Carries AdamState (mu unused) so TrainState's pytree structure is
    identical across optimizer choices."""
    def upd(g, v, p, scale):
        g = g.astype(jnp.float32)
        v_new = alpha * v + (1.0 - alpha) * g * g
        p_new = (p - (lr * scale) * g / (jnp.sqrt(v_new) + eps)).astype(p.dtype)
        return p_new, v_new

    leaves_g, treedef = jax.tree_util.tree_flatten(grads)
    leaves_v = treedef.flatten_up_to(state.nu)
    leaves_p = treedef.flatten_up_to(params)
    leaves_sc = ([1.0] * len(leaves_g) if lr_scales is None
                 else treedef.flatten_up_to(lr_scales))
    out = [upd(*t) for t in zip(leaves_g, leaves_v, leaves_p, leaves_sc)]
    return (treedef.unflatten([o[0] for o in out]),
            AdamState(state.count + 1, state.mu,
                      treedef.unflatten([o[1] for o in out])))


def radam_step(grads, state: AdamState, params, lr, lr_scales=None,
               b1=0.9, b2=0.999, eps=1e-8):
    """RAdam (Liu et al. 2020; the torch_optimizer.RAdam the reference
    selects, optim.py:116-118): rectified adaptive step when the SMA length
    exceeds 4, plain bias-corrected SGD-momentum step otherwise."""
    count = state.count + 1
    t = count.astype(jnp.float32)
    b2t = b2 ** t
    rho_inf = 2.0 / (1.0 - b2) - 1.0
    rho_t = rho_inf - 2.0 * t * b2t / (1.0 - b2t)
    rect = jnp.sqrt(
        jnp.maximum((rho_t - 4.0) * (rho_t - 2.0) * rho_inf, 0.0)
        / jnp.maximum((rho_inf - 4.0) * (rho_inf - 2.0) * rho_t, 1e-12)
    )
    bc1 = 1.0 - b1 ** t
    use_rect = rho_t > 4.0
    # adaptive: lr * rect * sqrt(1-b2^t)/bc1 * m / (sqrt(v)+eps)
    # plain:    lr / bc1 * m
    adapt_scale = rect * jnp.sqrt(1.0 - b2t) / bc1
    plain_scale = 1.0 / bc1

    def upd(g, m, v, p, scale):
        g = g.astype(jnp.float32)
        m_new = b1 * m + (1.0 - b1) * g
        v_new = b2 * v + (1.0 - b2) * g * g
        adapt = adapt_scale * m_new / (jnp.sqrt(v_new) + eps)
        plain = plain_scale * m_new
        p_new = (p - (lr * scale) * jnp.where(use_rect, adapt, plain)
                 ).astype(p.dtype)
        return p_new, m_new, v_new

    leaves_g, treedef = jax.tree_util.tree_flatten(grads)
    leaves_m = treedef.flatten_up_to(state.mu)
    leaves_v = treedef.flatten_up_to(state.nu)
    leaves_p = treedef.flatten_up_to(params)
    leaves_sc = ([1.0] * len(leaves_g) if lr_scales is None
                 else treedef.flatten_up_to(lr_scales))
    out = [upd(*t) for t in zip(leaves_g, leaves_m, leaves_v, leaves_p,
                                leaves_sc)]
    return (treedef.unflatten([o[0] for o in out]),
            AdamState(count,
                      treedef.unflatten([o[1] for o in out]),
                      treedef.unflatten([o[2] for o in out])))


def novograd_step(grads, state: AdamState, params, lr, lr_scales=None,
                  b1=0.9, b2=0.0, eps=1e-8):
    """NovoGrad (Ginsburg et al. 2019; torch_optimizer.NovoGrad with the
    reference's betas=(beta1, 0) — optim.py:113-115): per-tensor scalar
    second moment, layer-normalized first moment, no grad averaging."""
    count = state.count + 1

    def upd(g, m, v, p, scale):
        g = g.astype(jnp.float32)
        g2 = jnp.sum(g * g)
        v_new = jnp.where(state.count == 0, g2, b2 * v + (1.0 - b2) * g2)
        gn = g / (jnp.sqrt(v_new) + eps)
        m_new = jnp.where(state.count == 0, gn, b1 * m + gn)
        p_new = (p - (lr * scale) * m_new).astype(p.dtype)
        return p_new, m_new, v_new

    leaves_g, treedef = jax.tree_util.tree_flatten(grads)
    leaves_m = treedef.flatten_up_to(state.mu)
    leaves_v = treedef.flatten_up_to(state.nu)
    leaves_p = treedef.flatten_up_to(params)
    leaves_sc = ([1.0] * len(leaves_g) if lr_scales is None
                 else treedef.flatten_up_to(lr_scales))
    out = [upd(*t) for t in zip(leaves_g, leaves_m, leaves_v, leaves_p,
                                leaves_sc)]
    return (treedef.unflatten([o[0] for o in out]),
            AdamState(count,
                      treedef.unflatten([o[1] for o in out]),
                      treedef.unflatten([o[2] for o in out])))


def init_novograd(params: PyTree) -> AdamState:
    """NovoGrad state: scalar per-tensor second moments."""
    return AdamState(
        jnp.zeros((), jnp.int32),
        jax.tree_util.tree_map(jnp.zeros_like, params),
        jax.tree_util.tree_map(lambda p: jnp.zeros((), jnp.float32), params),
    )


def make_optimizer(name: str, b1: float = 0.9):
    """Reference optimizer selection (optim.py:109-123): ``name.lower()`` in
    {extraadam, novograd, radam, rmsprop}; anything else -> Adam. Returns
    ``(init_fn, step_fn)`` where ``step_fn(grads, state, params, lr,
    extrapolate, lr_scales)`` has a uniform signature (``extrapolate`` is
    only meaningful for ExtraAdam)."""
    n = (name or "extraadam").lower()
    if n == "extraadam":
        def step(grads, state, params, lr, extrapolate, lr_scales=None):
            return extra_adam_step(grads, state, params, lr=lr,
                                   extrapolate=extrapolate,
                                   lr_scales=lr_scales, b1=b1)
        return init_extra_adam, step
    if n == "novograd":
        def step(grads, state, params, lr, extrapolate, lr_scales=None):
            return novograd_step(grads, state, params, lr=lr,
                                 lr_scales=lr_scales, b1=b1, b2=0.0)
        return init_novograd, step
    if n == "radam":
        def step(grads, state, params, lr, extrapolate, lr_scales=None):
            return radam_step(grads, state, params, lr=lr,
                              lr_scales=lr_scales, b1=b1)
        return init_adam, step
    if n == "rmsprop":
        def step(grads, state, params, lr, extrapolate, lr_scales=None):
            return rmsprop_step(grads, state, params, lr=lr,
                                lr_scales=lr_scales)
        return init_adam, step  # RMSprop ignores mu; AdamState keeps
        # the TrainState pytree structure stable across optimizer choices
    def step(grads, state, params, lr, extrapolate, lr_scales=None):
        return adam_step(grads, state, params, lr=lr, lr_scales=lr_scales,
                         b1=b1)
    return init_adam, step


# --------------------------------------------------------------------------
# LR schedules (functions of epoch, reference optim.py:10-51)
# --------------------------------------------------------------------------


def make_lr_schedule(opt_conf) -> Callable[[int], float]:
    policy = opt_conf.get("lr_policy")
    gamma = float(opt_conf.get("lr_gamma", 0.5))
    step_size = int(opt_conf.get("lr_step_size", 5) or 5)
    milestones = opt_conf.get("lr_milestones")

    if policy in (None, "constant", {}):
        return lambda epoch: 1.0
    if policy == "step":
        return lambda epoch: gamma ** (int(epoch) // step_size)
    if policy == "multi_step":
        if isinstance(milestones, int):
            ms = list(range(int(milestones), 1000, step_size))
        else:
            ms = [int(m) for m in (milestones or [])]

        def sched(epoch: int) -> float:
            return gamma ** sum(1 for m in ms if int(epoch) >= m)

        return sched
    raise NotImplementedError(f"lr policy {policy}")


def build_lr_scales(params: PyTree, rules: dict, default: float = 1.0) -> PyTree:
    """Pytree of lr multipliers: leaf scale = rules[first matching top-level
    module prefix] / default-lr. ``rules`` maps param-path prefixes (joined
    with '/') to absolute LRs relative to the default LR."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    scales = []
    for path, _ in flat[0]:
        key = "/".join(
            getattr(p, "key", getattr(p, "name", str(p))) for p in path
        )
        scale = default
        for prefix, s in rules.items():
            if key.startswith(prefix):
                scale = s
                break
        scales.append(scale)
    return treedef.unflatten(scales)


def clamp_params(params: PyTree, lo: float, hi: float) -> PyTree:
    """WGAN weight clipping (reference trainer.py:1489-1494)."""
    return jax.tree_util.tree_map(lambda p: jnp.clip(p, lo, hi), params)

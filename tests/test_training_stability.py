"""Short-horizon training stability: 30 jitted G+D ExtraAdam steps on the
tiny config must stay finite, update both players, and move the losses."""
import jax
import numpy as np

from climategan_tpu.train_step import StepBuilder
from climategan_tpu.utils.testing import tiny_opts
from tests.test_train_step import _batch


def test_thirty_steps_stay_finite():
    opts = tiny_opts(image_size=64)
    builder = StepBuilder(opts, vgg_variables=None)
    rng = jax.random.PRNGKey(0)
    batch = _batch()
    state = builder.init_state(rng, batch)
    step = jax.jit(builder.train_step, donate_argnums=(0,))

    g_losses, d_losses = [], []
    for i in range(30):
        state, metrics = step(state, batch)
        g = float(metrics["g_total"])
        d = float(metrics["d_total"])
        assert np.isfinite(g), f"G loss non-finite at step {i}"
        assert np.isfinite(d), f"D loss non-finite at step {i}"
        g_losses.append(g)
        d_losses.append(d)

    # losses actually move (optimizer is doing something)
    assert abs(g_losses[-1] - g_losses[0]) > 1e-3
    # supervised parts should descend on a fixed batch
    assert g_losses[-1] < g_losses[0]
    # all params finite
    for leaf in jax.tree_util.tree_leaves(state.g_params):
        assert np.isfinite(np.asarray(leaf)).all()

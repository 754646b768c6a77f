"""End-to-end fused inference on a tiny config: one jitted graph produces
flood / wildfire / smog uint8 outputs (reference scenario: infer_all,
trainer.py:217-334)."""
import jax
import jax.numpy as jnp
import numpy as np

from climategan_tpu.inference import build_infer_fn
from climategan_tpu.utils.testing import tiny_opts


def test_infer_all_tiny():
    opts = tiny_opts(image_size=64)
    G, infer = build_infer_fn(opts, dtype=jnp.float32, donate=False)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (2, 64, 64, 3), minval=-1.0, maxval=1.0)
    variables = G.init(rng, x)

    out = infer(variables, x, rng)
    for k in ("flood", "wildfire", "smog"):
        assert out[k].shape == (2, 64, 64, 3), k
        assert out[k].dtype == jnp.uint8, k
        v = np.asarray(out[k])
        assert v.max() > 0 and v.min() < 255, f"{k} degenerate output"
    assert out["mask"].shape == (2, 64, 64, 1)


def test_infer_batch_sharded_on_mesh():
    """Data-parallel inference over the 8-device CPU mesh (BASELINE config 4
    analog): batch sharded on the 'data' axis, params replicated."""
    from climategan_tpu.parallel.mesh import make_mesh, shard_batch, replicate

    opts = tiny_opts(image_size=64)
    G, infer = build_infer_fn(opts, dtype=jnp.float32, donate=False)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (8, 64, 64, 3), minval=-1.0, maxval=1.0)
    variables = G.init(rng, x[:1])

    mesh = make_mesh()
    xs = shard_batch(mesh, x)
    vs = replicate(mesh, variables)
    out = infer(vs, xs, rng)
    assert out["flood"].shape == (8, 64, 64, 3)
    np.asarray(out["flood"])  # materialize

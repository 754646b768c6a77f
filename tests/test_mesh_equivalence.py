"""SPMD correctness: data-parallel sharded inference must produce the same
outputs as single-device execution (the collectives/sharding layer cannot
change the math)."""
import jax
import jax.numpy as jnp
import numpy as np

from climategan_tpu.inference import build_infer_fn
from climategan_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from climategan_tpu.utils.testing import tiny_opts


def test_sharded_inference_matches_single_device():
    opts = tiny_opts(image_size=64)
    G, infer = build_infer_fn(opts, dtype=jnp.float32, donate=False)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (8, 64, 64, 3), minval=-1.0, maxval=1.0)
    variables = G.init(rng, x[:1])

    single = infer(variables, x, rng)

    mesh = make_mesh()
    sharded = infer(
        replicate(mesh, variables), shard_batch(mesh, x), rng
    )

    for k in ("flood", "wildfire", "smog"):
        a = np.asarray(single[k]).astype(np.int32)
        b = np.asarray(sharded[k]).astype(np.int32)
        # uint8 quantization: allow 1 LSB from fp reassociation across
        # different partitionings
        assert np.abs(a - b).max() <= 1, k
    np.testing.assert_allclose(
        np.asarray(single["mask"]), np.asarray(sharded["mask"]),
        rtol=1e-5, atol=1e-5,
    )

"""BN folding: the rewrite must be numerically exact in eval mode
(reference bn_fusion.py becomes compile-time constant folding; this test
pins the explicit fold)."""
import jax
import jax.numpy as jnp
import numpy as np

from climategan_tpu.models.blocks import Conv2dBlock
from climategan_tpu.utils.bn_fold import fold_generator_bns


def test_fold_conv_bn_exact():
    m = Conv2dBlock(8, 3, 1, 1, norm="batch", activation="lrelu",
                    pad_type="reflect", bias=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 10, 4))
    variables = m.init(jax.random.PRNGKey(1), x)

    # non-trivial running stats + affine
    k = jax.random.PRNGKey(2)
    bs = variables["batch_stats"]
    ps = jax.tree_util.tree_map(lambda v: v, variables["params"])
    bn = ps["norm"]["BatchNorm_0"]
    bn["scale"] = jax.random.normal(k, bn["scale"].shape) + 1.0
    bn["bias"] = jax.random.normal(k, bn["bias"].shape)
    bs["norm"]["BatchNorm_0"]["mean"] = jax.random.normal(
        k, bs["norm"]["BatchNorm_0"]["mean"].shape
    )
    bs["norm"]["BatchNorm_0"]["var"] = (
        jax.random.uniform(k, bs["norm"]["BatchNorm_0"]["var"].shape) + 0.5
    )
    variables = {"params": ps, "batch_stats": bs}

    want = m.apply(variables, x)
    folded = fold_generator_bns(variables)
    # folded conv now carries a bias
    got = m.apply(folded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_baked_spectral_frozen_inference_matches():
    """bake_spectral_norm + frozen_spectral must reproduce the normal
    spectral path exactly (sigma of a baked kernel is 1)."""
    import jax.numpy as jnp
    from climategan_tpu.inference import build_infer_fn
    from climategan_tpu.utils.bn_fold import bake_spectral_norm
    from climategan_tpu.utils.testing import tiny_opts

    opts = tiny_opts(image_size=64)
    G, infer = build_infer_fn(opts, dtype=jnp.float32, donate=False)
    _, infer_frozen = build_infer_fn(opts, dtype=jnp.float32, donate=False,
                                     freeze_spectral=True)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (1, 64, 64, 3), minval=-1, maxval=1)
    variables = G.init(rng, x)

    a = infer(variables, x, rng)
    b = infer_frozen(bake_spectral_norm(variables), x, rng)
    for k in ("flood", "wildfire", "smog"):
        np.testing.assert_allclose(np.asarray(a[k]).astype(np.int32),
                                   np.asarray(b[k]).astype(np.int32),
                                   atol=1)

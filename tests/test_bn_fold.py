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

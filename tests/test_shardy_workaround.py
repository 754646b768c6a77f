"""Regression guard for an XLA Shardy partitioner miscompilation.

Discovered while validating hybrid (data x space) sharding
(test_mesh_equivalence.py): on jax 0.9.0 with the default Shardy
partitioner, a convolution whose KERNEL is scaled by any traced scalar
returns outputs multiplied by the spatial-shard count when the conv
input is sharded along a spatial (window) dimension of a multi-axis
mesh. Replicated operands, pure math — the partitioner seems to treat
the broadcast-scaled kernel as a partial value and all-reduces an
already-complete product. The legacy GSPMD partitioner
(jax_use_shardy_partitioner=False) compiles the same graph exactly.

This hit the spectral-norm path (sigma-scaled kernels): sigma came out
applied twice under a 2x2 mesh, i.e. every spectral conv's output was
doubled. Fix: SNConv scales the conv OUTPUT by 1/sigma instead of the
kernel (identical math — conv is linear in the kernel;
models/norms.spectral_sigma).

test_raw_kernel_scale_is_miscompiled documents the upstream bug and is
expected to FAIL (xfail strict=False) once jax fixes it — at which point
the workaround can be retired.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _mesh_2d():
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 virtual devices")
    return Mesh(np.asarray(devs[:4]).reshape(2, 2), ("data", "space"))


def _conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _data():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 2, 2, 32)).astype(np.float32)
    k = rng.normal(size=(3, 3, 32, 32)).astype(np.float32) * 0.1
    return x, k


@pytest.mark.xfail(
    strict=False,
    reason="upstream XLA Shardy bug: traced-scalar-scaled conv kernel "
    "with spatially sharded input on a multi-axis mesh (jax 0.9.0); "
    "passes once fixed upstream",
)
def test_raw_kernel_scale_is_miscompiled():
    x, k = _data()

    def f(x, kernel):
        s = jnp.sum(kernel) * 1e-3 + 1.0
        return _conv(x, kernel / s)

    jf = jax.jit(f)
    ref = np.asarray(jf(x, k))
    mesh = _mesh_2d()
    out = np.asarray(jf(
        jax.device_put(x, NamedSharding(mesh, P("data", "space"))),
        jax.device_put(k, NamedSharding(mesh, P())),
    ))
    np.testing.assert_allclose(ref, out, rtol=1e-5, atol=1e-5)


def test_output_scale_workaround_is_exact():
    """The formulation SNConv uses: conv with the raw kernel, scalar on
    the output. Must stay exact under the adversarial sharding."""
    x, k = _data()

    def f(x, kernel):
        s = jnp.sum(kernel) * 1e-3 + 1.0
        return _conv(x, kernel) / s

    jf = jax.jit(f)
    ref = np.asarray(jf(x, k))
    mesh = _mesh_2d()
    out = np.asarray(jf(
        jax.device_put(x, NamedSharding(mesh, P("data", "space"))),
        jax.device_put(k, NamedSharding(mesh, P())),
    ))
    np.testing.assert_allclose(ref, out, rtol=1e-5, atol=1e-5)


def test_snconv_exact_under_hybrid_sharding():
    """End-to-end guard on the real module: a spectral SNConv forward
    under (data, space) input sharding matches single-device."""
    from climategan_tpu.models.norms import SNConv

    mod = SNConv(16, (3, 3), padding=(1, 1), spectral=True)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 8, 12))
    variables = mod.init(rng, x)

    jf = jax.jit(lambda v, x: mod.apply(v, x))
    ref = np.asarray(jf(variables, x))

    mesh = _mesh_2d()
    repl = NamedSharding(mesh, P())
    v_r = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, repl), variables
    )
    x_s = jax.device_put(x, NamedSharding(mesh, P("data", "space")))
    out = np.asarray(jf(v_r, x_s))
    np.testing.assert_allclose(ref, out, rtol=1e-5, atol=1e-5)

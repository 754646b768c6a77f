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


def test_sharded_training_matches_single_device():
    """DP training analog (VERDICT r2 item 3): N steps of the full G+D
    train step on a device mesh with the batch sharded must track the
    single-device trajectory with the same GLOBAL batch — the sharding
    layer (replicated params, XLA-inserted gradient psum, batch-global
    reductions) cannot change the math.

    Runs on a 2-device mesh: with 8 virtual devices on this 1-core host
    the training graph's first all-reduce hits XLA:CPU's hard 40 s
    rendezvous termination (all participants execute serially on one
    core) and aborts the process. 2 participants validate the same DP
    semantics; 8-device execution of the full step is covered by the
    driver's dryrun_multichip and test_dryrun_multichip_8."""
    from climategan_tpu.train_step import StepBuilder

    from tests.test_train_step import _batch

    opts = tiny_opts(image_size=64)
    opts.train.bf16 = False  # f32 so the trajectories compare tightly
    builder = StepBuilder(opts, vgg_variables=None)
    rng = jax.random.PRNGKey(0)
    batch = _batch(n=4)
    state0 = builder.init_state(rng, batch)
    step = jax.jit(builder.train_step)

    s_single = state0
    for _ in range(3):
        s_single, m_single = step(s_single, batch)

    mesh = make_mesh(2)
    s_shard = replicate(mesh, state0)
    sbatch = shard_batch(mesh, batch)
    for _ in range(3):
        s_shard, m_shard = step(s_shard, sbatch)

    np.testing.assert_allclose(float(m_single["g_total"]),
                               float(m_shard["g_total"]),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(float(m_single["d_total"]),
                               float(m_shard["d_total"]),
                               rtol=5e-4, atol=5e-5)
    # parameter trajectories agree across all leaves after 3 G+D updates
    la = jax.tree_util.tree_leaves(s_single.g_params)
    lb = jax.tree_util.tree_leaves(s_shard.g_params)
    worst = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                for a, b in zip(la, lb))
    assert worst < 5e-4, f"g_params drifted by {worst}"
    ld_a = jax.tree_util.tree_leaves(s_single.d_params)
    ld_b = jax.tree_util.tree_leaves(s_shard.d_params)
    worst_d = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                  for a, b in zip(ld_a, ld_b))
    assert worst_d < 5e-4, f"d_params drifted by {worst_d}"


def test_hybrid_sharded_training_matches_single_device():
    """2-D hybrid (data x space) training (SURVEY §2.4 greenfield): batch
    split over the 'data' axis AND rows split over the 'space' axis of a
    2x2 mesh, params/optimizer replicated. XLA's SPMD partitioner now has
    to insert BOTH the gradient all-reduce (over both axes) and the conv
    halo exchanges / spatial-stat collectives inside every layer of the
    G+D step. One step must match the single-device step — the hybrid
    partitioning cannot change the math. This is the sharding layout for
    scaling past DP (large images at fixed per-chip memory).

    Tolerances are calibrated to the one true fp effect of row sharding:
    spatial-reduction reassociation perturbs gradients at the ~1e-8
    noise floor, and Adam-family first-step updates are ±lr regardless
    of gradient magnitude — so elements whose true gradient is ~0 can
    flip sign and land a full lr quantum (1e-4) apart. g_total is
    computed BEFORE the update and must match tightly; d_total is
    computed after the G update and inherits the quantum flips;
    parameter leaves may differ by a few lr quanta on zero-gradient
    elements. (A systematic error looks different: the Shardy
    kernel-scale miscompilation this test originally caught made every
    spectral conv output exactly 2x — see tests/test_shardy_workaround
    .py and models/norms.spectral_sigma.)"""
    from climategan_tpu.parallel.mesh import make_mesh_2d, shard_hybrid
    from climategan_tpu.train_step import StepBuilder

    from tests.test_train_step import _batch

    opts = tiny_opts(image_size=64)
    opts.train.bf16 = False
    builder = StepBuilder(opts, vgg_variables=None)
    rng = jax.random.PRNGKey(0)
    batch = _batch(n=4)
    state0 = builder.init_state(rng, batch)
    step = jax.jit(builder.train_step)

    s_single, m_single = step(state0, batch)

    mesh = make_mesh_2d(2, 2)
    s_shard, m_shard = step(
        replicate(mesh, state0), shard_hybrid(mesh, batch)
    )

    np.testing.assert_allclose(float(m_single["g_total"]),
                               float(m_shard["g_total"]),
                               rtol=5e-4, atol=5e-5)
    # post-G-update metric: lr-quantum sign flips admit a few percent
    np.testing.assert_allclose(float(m_single["d_total"]),
                               float(m_shard["d_total"]),
                               rtol=5e-2, atol=5e-3)
    la = jax.tree_util.tree_leaves(s_single.g_params)
    lb = jax.tree_util.tree_leaves(s_shard.g_params)
    worst = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                for a, b in zip(la, lb))
    # a few lr quanta (lr=1e-4): zero-gradient elements may flip sign
    assert worst < 5e-4, f"g_params drifted by {worst}"


def test_spatial_sharded_inference_matches_single_device():
    """Model-parallel (row-sharded) inference (SURVEY §2.4 ">640^2
    painter" door): the H axis of every NHWC tensor is split across the
    mesh, so XLA's SPMD partitioner must insert conv halo exchanges and
    all-reduce every spatial reduction (instance-norm stats, event color
    statistics, the banded-matmul blur). The outputs must equal the
    single-device run — the partitioning cannot change the math."""
    from climategan_tpu.parallel.mesh import shard_spatial

    opts = tiny_opts(image_size=64)
    G, infer = build_infer_fn(opts, dtype=jnp.float32, donate=False)
    rng = jax.random.PRNGKey(1)
    x = jax.random.uniform(rng, (2, 64, 64, 3), minval=-1.0, maxval=1.0)
    variables = G.init(rng, x[:1])

    single = infer(variables, x, rng)

    mesh = make_mesh(2)  # rows split 2-way (the 8-way CPU rendezvous of
    # the full event graph hits XLA:CPU's 40 s all-reduce termination on
    # this 1-core host, same as the training test above)
    sharded = infer(
        replicate(mesh, variables), shard_spatial(mesh, x), rng
    )

    for k in ("flood", "wildfire", "smog"):
        a = np.asarray(single[k]).astype(np.int32)
        b = np.asarray(sharded[k]).astype(np.int32)
        assert np.abs(a - b).max() <= 1, k
    np.testing.assert_allclose(
        np.asarray(single["mask"]), np.asarray(sharded["mask"]),
        rtol=1e-5, atol=1e-5,
    )

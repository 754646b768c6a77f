"""Multi-host (pod) door — parallel/distributed.py.

Single-process semantics must be exactly unchanged (the pod path only
activates under multi-host env), and the trigger logic must never
initialize jax.distributed in a plain single-host run.
"""
import jax
import numpy as np
import pytest

from climategan_tpu.parallel.distributed import (
    maybe_init_distributed,
    make_global_array,
)
from climategan_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    shard_batch,
)


@pytest.fixture(autouse=True)
def _clean_env(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID", "JAX_MULTIHOST", "SLURM_NTASKS"):
        monkeypatch.delenv(var, raising=False)
    yield


def test_no_trigger_single_host():
    assert maybe_init_distributed() is False
    assert not getattr(maybe_init_distributed, "_done", False)


def test_kill_switch_beats_slurm(monkeypatch):
    monkeypatch.setenv("SLURM_NTASKS", "4")
    monkeypatch.setenv("JAX_MULTIHOST", "0")
    assert maybe_init_distributed() is False


def test_slurm_single_task_no_trigger(monkeypatch):
    monkeypatch.setenv("SLURM_NTASKS", "1")
    assert maybe_init_distributed() is False


def test_make_global_array_matches_device_put():
    """process_count==1: the pod input path must be device_put exactly
    (value and sharding), so routing shard_batch through it cannot
    change any single-host behavior."""
    mesh = make_mesh()
    sh = batch_sharding(mesh)
    x = np.arange(8 * 4 * 4 * 3, dtype=np.float32).reshape(8, 4, 4, 3)
    a = make_global_array(x, sh)
    b = jax.device_put(x, sh)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.sharding.is_equivalent_to(b.sharding, a.ndim)


def test_shard_batch_roundtrip_values():
    mesh = make_mesh()
    batch = {"x": np.random.default_rng(0).normal(size=(8, 6, 6, 3))
             .astype(np.float32)}
    out = shard_batch(mesh, batch)
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])

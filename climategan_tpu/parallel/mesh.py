"""Device mesh + sharding helpers (greenfield — SURVEY.md §2.4/§2.5).

The reference is single-device; parallelism here is designed TPU-first:
a 1-D ``data`` mesh axis for batch-parallel inference/training over ICI,
with replicated parameters and ``NamedSharding`` annotations letting XLA
insert the collectives (gradient psum) itself. Multi-axis (model-sharded
painter at high resolution) can extend the same mesh without touching the
model code.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data",
              devices=None) -> Mesh:
    devs = jax.devices() if devices is None else list(devices)
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_mesh_2d(dp: int, sp: int,
                 axes: tuple = ("data", "space")) -> Mesh:
    """2-D hybrid mesh: ``dp`` data-parallel groups x ``sp`` spatial
    (row-sharded) shards. Device order keeps each data group's spatial
    shards adjacent, so conv halo exchanges (the chatty, per-layer
    collective) ride nearest-neighbor ICI links while the once-per-step
    gradient all-reduce spans the slower outer axis."""
    devs = jax.devices()
    need = dp * sp
    assert len(devs) >= need, f"need {need} devices, have {len(devs)}"
    return Mesh(np.asarray(devs[:need]).reshape(dp, sp), axes)


def hybrid_batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch for the 2-D mesh: N split over 'data', H over 'space'."""
    data_ax, space_ax = mesh.axis_names
    return NamedSharding(mesh, P(data_ax, space_ax))


def shard_hybrid(mesh: Mesh, batch):
    """Device-put a pytree of NHWC arrays with N x H sharded over the
    2-D mesh. Rank<4 leaves (e.g. int seg maps NHW) shard N and H too;
    rank-1/0 leaves replicate."""
    from climategan_tpu.parallel.distributed import make_global_array

    def put(x):
        nd = getattr(x, "ndim", 0)
        data_ax, space_ax = mesh.axis_names
        if nd >= 3:
            spec = P(data_ax, space_ax)
        elif nd >= 1:
            spec = P(data_ax)
        else:
            spec = P()
        return make_global_array(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim of NHWC tensors across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Shard a pytree of batch-leading arrays over the mesh.

    Single-host this is a device_put; on a multi-host pod each process
    passes its LOCAL batch shard and the global array is assembled via
    jax.make_array_from_process_local_data (parallel/distributed.py)."""
    from climategan_tpu.parallel.distributed import make_global_array

    s = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: make_global_array(x, s), batch)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), tree)


def spatial_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the H (row) dim of NHWC tensors across the mesh.

    Model-parallel inference for huge images at small batch (the SURVEY
    §2.4 "painter at >640^2" door): with rows sharded, XLA's SPMD
    partitioner inserts the conv halo exchanges and turns every spatial
    reduction (instance-norm stats, event color statistics, the wildfire
    banded-matmul blur) into the matching ICI collective automatically —
    the model code is untouched and the math is exactly the single-device
    math (tests/test_mesh_equivalence.py::test_spatial_sharded_inference
    _matches_single_device)."""
    return NamedSharding(mesh, P(None, axis))


def shard_spatial(mesh: Mesh, batch, axis: str = "data"):
    """Device-put a pytree of NHWC arrays with rows sharded over the mesh."""
    s = spatial_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)

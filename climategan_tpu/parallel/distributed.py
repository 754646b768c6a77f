"""Multi-host (pod) runtime door — SURVEY.md §2.5.

The reference is strictly single-process (no torch.distributed anywhere;
SURVEY §2.4), so this layer is greenfield and TPU-idiomatic:

* ``maybe_init_distributed()`` brings up JAX's coordination service when
  the process is part of a multi-host job (TPU pod metadata, SLURM, or
  explicit ``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/
  ``JAX_PROCESS_ID`` env). After it, ``jax.devices()`` is the GLOBAL
  device list and every ``NamedSharding`` spans the pod — the existing
  mesh/trainer code needs no changes.
* ``shard_batch``/``shard_hybrid`` (parallel/mesh.py) route through
  :func:`make_global_array` here, so on a pod each host contributes its
  process-LOCAL batch shard and JAX assembles the logical global array
  (``jax.make_array_from_process_local_data``) — the host->device path
  stays local (no cross-DCN input scatter), which is the standard JAX
  multi-host input pipeline.

Single-process behavior is exactly unchanged (``make_array_from_
process_local_data`` == ``device_put`` when process_count == 1), which
is what the CPU-mesh equivalence tests pin.
"""
from __future__ import annotations

import os

import jax
from jax.sharding import NamedSharding


def _explicit_env():
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    n = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if addr and n and pid is not None:
        return addr, int(n), int(pid)
    return None


def _slurm_world_size() -> int:
    try:
        return int(os.environ.get("SLURM_NTASKS", "1"))
    except ValueError:
        return 1


def maybe_init_distributed(verbose: int = 0) -> bool:
    """Initialize ``jax.distributed`` iff this process is part of a
    multi-host job; no-op (returns False) for the common single-host
    case so CLIs keep working unchanged on one chip/host.

    Triggers, in precedence order:
      1. explicit ``JAX_COORDINATOR_ADDRESS`` + ``JAX_NUM_PROCESSES`` +
         ``JAX_PROCESS_ID`` (any launcher);
      2. SLURM multi-task allocations (``SLURM_NTASKS > 1`` — the
         launcher analog of the reference's sbatch.py submission path,
         /root/reference/sbatch.py); jax auto-derives coordinator/rank
         from the SLURM env;
      3. ``JAX_MULTIHOST=1`` on TPU pod slices where libtpu metadata
         provides the topology (``jax.distributed.initialize()`` with
         no args).
    """
    if getattr(maybe_init_distributed, "_done", False):
        return True
    if os.environ.get("JAX_MULTIHOST") == "0":  # explicit kill-switch
        return False

    explicit = _explicit_env()
    slurm_n = _slurm_world_size()
    flagged = os.environ.get("JAX_MULTIHOST") == "1"
    if explicit is None and slurm_n <= 1 and not flagged:
        return False

    if explicit is not None:
        addr, num, pid = explicit
        jax.distributed.initialize(
            coordinator_address=addr, num_processes=num, process_id=pid
        )
    else:
        # SLURM / TPU-pod metadata: jax's cluster auto-detection
        jax.distributed.initialize()
    maybe_init_distributed._done = True
    if verbose:
        print(
            f"jax.distributed up: process {jax.process_index()}/"
            f"{jax.process_count()}, {jax.local_device_count()} local / "
            f"{jax.device_count()} global devices"
        )
    return True


def make_global_array(x, sharding: NamedSharding):
    """Build the logical global array from this process's LOCAL data.

    Single-process this is ``device_put`` (identical result and cost);
    on a pod each host passes only its own batch shard and JAX stitches
    the global array across processes without any host-side gather. A
    fully-addressable (host-local) mesh on a pod — the independent
    per-host serving pattern in apply_events --mesh — also goes through
    plain device_put: there is no cross-process array to assemble.
    """
    if jax.process_count() == 1 or sharding.is_fully_addressable:
        return jax.device_put(x, sharding)
    import numpy as np

    return jax.make_array_from_process_local_data(
        sharding, np.asarray(x)
    )

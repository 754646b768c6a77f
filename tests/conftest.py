"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU via
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4) — the driver
separately dry-runs the multi-chip path; the real chip only runs bench.py.
"""
import os

# Force CPU: the environment pre-sets JAX_PLATFORMS=axon (remote TPU tunnel),
# which would funnel every test compile through the tunnel.
# CLIMATEGAN_TEST_TPU=1 opts OUT of the CPU override so the TPU-gated
# tests (e.g. the compiled-Pallas parity test) can run on the real chip:
#   CLIMATEGAN_TEST_TPU=1 pytest tests/test_pallas_spade.py -k compiled
_USE_TPU = os.environ.get("CLIMATEGAN_TEST_TPU") == "1"
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

# The environment's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon (remote TPU tunnel), locking the config before this
# file runs — override the config value itself, not just the env var.
if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: this host has a single CPU core and XLA
# compiles dominate test wall-time; cache across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU via
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4) — the driver
separately dry-runs the multi-chip path; the real chip only runs bench.py.
"""
import os

# Force CPU: the environment pre-sets JAX_PLATFORMS=axon (remote TPU tunnel),
# which would funnel every test compile through the tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

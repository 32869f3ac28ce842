"""Test configuration: run everything on CPU with 8 virtual devices so the
data-parallel sharding paths are exercised without TPU hardware
(SURVEY.md §4 test strategy, item e).

jax is imported at interpreter startup by the environment's sitecustomize, so
plain env vars are too late here — the platform must be forced through
jax.config. XLA_FLAGS is still honored because the CPU client has not been
created yet when conftest runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

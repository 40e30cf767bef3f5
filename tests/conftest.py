"""Test harness: force CPU with 8 virtual devices so multi-chip sharding logic is
testable without a TPU pod (SURVEY.md §4 test-pyramid layer 4).

Note: the session environment pre-imports jax and registers a TPU backend via
sitecustomize, so env vars alone are too late — jax.config.update is required.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

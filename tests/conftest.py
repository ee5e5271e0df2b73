"""Test configuration: run everything on CPU with 8 virtual devices.

Matches the multi-device test strategy in SURVEY.md §4: unit tests need no
TPU; sharding tests use XLA's host-platform device virtualization.

Note: this environment pre-imports jax via sitecustomize (axon TPU tunnel),
so JAX_PLATFORMS env vars set here are too late — use jax.config instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

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

# Persistent compilation cache: the reparam-under-grad tests compile for
# minutes on XLA:CPU (and that compile is where the rare in-suite segfault
# lives) — warm runs skip those compiles entirely.  Only slow compiles are
# cached (>2s) to keep the directory small.  Gitignored; safe to delete.
_cache_dir = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_test_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

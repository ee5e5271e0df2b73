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
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# NOTE: do NOT enable jax_compilation_cache_dir here — this jaxlib's XLA:CPU
# executable DESERIALIZATION segfaults (measured: crash inside
# compilation_cache.get_executable_and_time on a scan-transpose executable),
# so a persistent cache trades a slow compile for a hard crash.


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    The suite's heaviest grad compiles (reparam warp) segfault XLA:CPU's
    backend_compile ONLY when run late in a long shared process while
    passing standalone — accumulated executables/tracing state is the one
    variable.  Clearing per module keeps peak state bounded.
    """
    yield
    jax.clear_caches()

"""fireflies-tpu: TPU-native differentiable structured-light simulation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
Henningson/Fireflies (see SURVEY.md): pythonic scene randomization
(train/eval), a differentiable path-tracing renderer, structured-light laser
projection, pattern initialization/optimization, and dataset generation —
designed for vmap/shard_map scale-out on TPU meshes.
"""

__version__ = "0.1.0"

from fireflies_tpu import sampling, utils  # noqa: F401

__all__ = ["sampling", "utils", "__version__"]

"""fireflies-tpu: TPU-native differentiable structured-light simulation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
Henningson/Fireflies (see SURVEY.md): pythonic scene randomization
(train/eval), a differentiable path-tracing renderer, structured-light laser
projection, pattern initialization/optimization, and dataset generation —
designed for vmap/shard_map scale-out on TPU meshes.
"""

__version__ = "0.1.0"

from fireflies_tpu import (  # noqa: F401
    emitter,
    entity,
    graphics,
    material,
    projection,
    sampling,
    utils,
)
from fireflies_tpu.emitter import Light  # noqa: F401
from fireflies_tpu.entity import Curve, Mesh, Transformable  # noqa: F401
from fireflies_tpu.material import Material  # noqa: F401
from fireflies_tpu.scene import Scene  # noqa: F401

# Subsystems imported lazily by name to keep `import fireflies_tpu` light:
# fireflies_tpu.render, .optim, .datagen, .parallel, .postprocessing,
# .estimation, .assets, .scene_io, .native


def load_scene(path):
    """Load a YAML scene description; returns (Scene, bridge_kwargs)."""
    from fireflies_tpu.scene_io import load_scene as _load  # noqa: PLC0415

    return _load(path)


__all__ = [
    "Scene",
    "Mesh",
    "Transformable",
    "Curve",
    "Light",
    "Material",
    "load_scene",
    "sampling",
    "utils",
    "entity",
    "emitter",
    "material",
    "graphics",
    "projection",
    "__version__",
]

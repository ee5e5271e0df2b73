"""Sampling layer: functional samplers + blue-noise generators.

Mirrors the reference export surface (fireflies/sampling/__init__.py) with a
pure-function protocol; see fireflies_tpu.sampling.base for semantics.
"""

from fireflies_tpu.sampling.base import ConstantSampler, Sampler
from fireflies_tpu.sampling.noise_texture_lerp import (
    NoiseTextureLerpSampler,
    rand_perlin_2d,
    rand_perlin_2d_octaves,
)
from fireflies_tpu.sampling.poisson import bridson, dart_throwing
from fireflies_tpu.sampling.samplers import (
    AnimationSampler,
    GaussianSampler,
    UniformIntegerSampler,
    UniformSampler,
    UniformScalarToVec3Sampler,
)

__all__ = [
    "Sampler",
    "ConstantSampler",
    "UniformSampler",
    "GaussianSampler",
    "UniformIntegerSampler",
    "UniformScalarToVec3Sampler",
    "AnimationSampler",
    "NoiseTextureLerpSampler",
    "rand_perlin_2d",
    "rand_perlin_2d_octaves",
    "bridson",
    "dart_throwing",
]

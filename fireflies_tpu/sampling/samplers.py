"""Concrete samplers.

Functional re-designs of the reference sampler zoo:
  UniformSampler            (fireflies/sampling/uniform.py)
  GaussianSampler           (fireflies/sampling/gaussian_distribution.py)
  UniformIntegerSampler     (fireflies/sampling/uniform_integer.py)
  UniformScalarToVec3Sampler(fireflies/sampling/uniform_scalar_to_vec3.py)
  AnimationSampler          (fireflies/sampling/animation.py)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from fireflies_tpu.sampling.base import Sampler, _as_f32
from fireflies_tpu.utils import math as ffmath

Array = jax.Array


class UniformSampler(Sampler):
    """U(min, max) elementwise (reference sampling/uniform.py:16-19)."""

    def sample_train(self, key: Array) -> Array:
        return ffmath.random_between(key, self.min_range, self.max_range)


class GaussianSampler(Sampler):
    """N(mean, std) — min_range is the mean, max_range the std, matching the
    reference's (ab)use of the base fields (sampling/gaussian_distribution.py:19).
    Not clamped (the reference doesn't clamp either)."""

    def sample_train(self, key: Array) -> Array:
        return (
            jax.random.normal(key, self.min_range.shape, jnp.float32) * self.max_range
            + self.min_range
        )

    def sample_eval(self, step: Array) -> Array:
        # A sweep over a gaussian's support is ill-defined; the reference sweeps
        # mean -> mean+std.  We return mean + (sweep over [0, std]).
        return super().sample_eval(step)


class UniformIntegerSampler(Sampler):
    """Uniform integers in [min, max) for train; integer sweep for eval
    (reference sampling/uniform_integer.py:20-29).  Returns int32."""

    def sample_train(self, key: Array) -> Array:
        lo = self.min_range.astype(jnp.int32)
        hi = self.max_range.astype(jnp.int32)
        return jax.random.randint(key, self.min_range.shape, lo, jnp.maximum(hi, lo + 1))

    def sample_eval(self, step: Array) -> Array:
        lo = self.min_range.astype(jnp.int32)
        hi = self.max_range.astype(jnp.int32)
        n = jnp.maximum(hi - lo, 1)
        return lo + (step % n)


class UniformScalarToVec3Sampler(Sampler):
    """One scalar U(min, max) broadcast to a vec3 — correlated channels
    (reference sampling/uniform_scalar_to_vec3.py:18-36; used for grey-scale
    light intensity at main.py:119-123)."""

    @classmethod
    def create(cls, minimum: float, maximum: float, eval_step_size: float = 0.01, **kw):
        import numpy as np

        return cls(
            min_range=np.full((3,), float(minimum), np.float32),
            max_range=np.full((3,), float(maximum), np.float32),
            eval_step_size=float(eval_step_size),
            **kw,
        )

    def sample_train(self, key: Array) -> Array:
        scalar = jax.random.uniform(key, ())
        return self.min_range + scalar * (self.max_range - self.min_range)


class AnimationSampler(Sampler):
    """Frame-index sampler with separate train/eval frame intervals
    (reference sampling/animation.py: train randint over [train_min, train_max),
    eval sequential sweep over [eval_min, eval_max)).  Returns int32 scalar."""

    train_min: Array = struct.field(default=None)
    train_max: Array = struct.field(default=None)
    eval_min: Array = struct.field(default=None)
    eval_max: Array = struct.field(default=None)

    @classmethod
    def create(  # type: ignore[override]
        cls, train_min: int, train_max: int, eval_min: int, eval_max: int, **kw
    ):
        import numpy as np

        return cls(
            min_range=_as_f32(train_min),
            max_range=_as_f32(train_max),
            train_min=np.int32(train_min),
            train_max=np.int32(train_max),
            eval_min=np.int32(eval_min),
            eval_max=np.int32(eval_max),
            **kw,
        )

    def set_train_interval(self, lo: int, hi: int) -> "AnimationSampler":
        import numpy as np

        return self.replace(train_min=np.int32(lo), train_max=np.int32(hi))

    def set_eval_interval(self, lo: int, hi: int) -> "AnimationSampler":
        import numpy as np

        return self.replace(eval_min=np.int32(lo), eval_max=np.int32(hi))

    def sample_train(self, key: Array) -> Array:
        return jax.random.randint(
            key, (), self.train_min, jnp.maximum(self.train_max, self.train_min + 1)
        )

    def sample_eval(self, step: Array) -> Array:
        n = jnp.maximum(self.eval_max - self.eval_min, 1)
        return self.eval_min + (step % n)

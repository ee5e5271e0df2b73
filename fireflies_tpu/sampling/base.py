"""Functional sampler protocol.

The reference's samplers are stateful objects: train() draws from torch's
global RNG, eval() advances a mutable sweep counter
(reference: fireflies/sampling/base.py:54-74).  Here a sampler is a frozen
pytree with a pure ``sample(key, step, train)``:

* ``train=True``  -> stochastic draw from the explicit PRNG ``key``;
* ``train=False`` -> deterministic sweep ``min + (step % n_steps) * eval_step``
  (wraps past ``max`` exactly like the reference's counter reset; returns the
  constant when min == max).

``train`` is a Python bool (static at trace time, mirroring the reference's
scene-wide train()/eval() switch), ``step`` is a traced int32 so eval sweeps
vmap across variants.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


def _as_f32(x):
    """Normalize interval bounds to HOST numpy.

    Sampler fields must be numpy, not jax.Array: jitted closures that
    capture device-resident arrays permanently degrade dispatch latency on
    the axon TPU tunnel (~30 ms/call), while numpy captures bake into the
    executable as constants.  (jnp inputs pay one D2H here at build time —
    builders should pass numpy/python values.)
    """
    import numpy as np

    arr = np.asarray(x, np.float32)
    if arr.ndim == 0:
        arr = arr[None]
    return arr


class Sampler(struct.PyTreeNode):
    """Base sampler: uniform-interval state + eval-sweep semantics."""

    min_range: Array
    max_range: Array
    eval_step_size: float = struct.field(pytree_node=False, default=0.01)

    # -- constructors -------------------------------------------------------

    @classmethod
    def create(cls, minimum, maximum, eval_step_size: float = 0.01, **kw):
        return cls(
            min_range=_as_f32(minimum),
            max_range=_as_f32(maximum),
            eval_step_size=float(eval_step_size),
            **kw,
        )

    # -- builder-style updates (immutable: return a new sampler) ------------

    def set_sample_interval(self, minimum, maximum) -> "Sampler":
        return self.replace(min_range=_as_f32(minimum), max_range=_as_f32(maximum))

    def set_index_interval(self, index: int, minimum: float, maximum: float) -> "Sampler":
        """Update one component's range (reference update_index_from_sampler,
        entity/base.py:144-149)."""
        import numpy as np

        mn = np.array(self.min_range, np.float32)
        mx = np.array(self.max_range, np.float32)
        mn[index] = minimum
        mx[index] = maximum
        return self.replace(min_range=mn, max_range=mx)

    # -- sampling ------------------------------------------------------------

    def sample(self, key: Array, step: Array | int = 0, train: bool = True) -> Array:
        if train:
            return self.sample_train(key)
        return self.sample_eval(jnp.asarray(step, jnp.int32))

    def sample_train(self, key: Array) -> Array:
        raise NotImplementedError

    def sample_eval(self, step: Array) -> Array:
        """Deterministic sweep min -> max with wraparound.

        The reference counter starts at min, adds eval_step_size per call, and
        resets to min once *any* component exceeds max
        (sampling/base.py:64-74) — i.e. the number of distinct values is
        ``floor(min_component_span / step) + 1``.
        """
        span = self.max_range - self.min_range
        step_size = jnp.float32(self.eval_step_size)
        n_steps = jnp.floor(jnp.min(span) / step_size).astype(jnp.int32) + 1
        n_steps = jnp.maximum(n_steps, 1)
        frac = (step % n_steps).astype(jnp.float32) * step_size
        value = self.min_range + frac
        return jnp.where(span == 0.0, self.min_range, value)

    # -- introspection -------------------------------------------------------

    @property
    def shape(self):
        return self.min_range.shape

    def get_min(self) -> Array:
        return self.min_range

    def get_max(self) -> Array:
        return self.max_range


class ConstantSampler(Sampler):
    """Always returns ``min_range`` (used for non-randomized attributes)."""

    @classmethod
    def of(cls, value):
        v = _as_f32(value)
        return cls(min_range=v, max_range=v)

    def sample_train(self, key: Array) -> Array:
        return self.min_range

    def sample_eval(self, step: Array) -> Array:
        return self.min_range

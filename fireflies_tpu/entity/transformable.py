"""Transformable: the randomizable-entity builder.

Mirrors the reference API (fireflies/entity/base.py): per-axis rotation /
translation intervals, parent-child links, float/vec3 attribute samplers,
train()/eval().  Unlike the reference — where randomize() mutates the object —
a Transformable here is a *spec builder*: `sample_world(key, step, train)` and
`sample_attributes(...)` are pure functions the Scene compiles into its
jit/vmap-able randomize pipeline.

Pose composition matches entity/base.py:220-228:
    randomized_world = (T + centroid) @ R @ base_world
with parent-first chaining `world = parent_world @ randomized_world`
(entity/base.py:239-244).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from fireflies_tpu import sampling
from fireflies_tpu.utils import math as ffmath

Array = jax.Array


class Transformable:
    def __init__(self, name: str):
        self._name = name
        self._randomizable = False
        self._parent: Optional[Transformable] = None
        self._child: Optional[Transformable] = None

        zeros = np.zeros(3, np.float32)
        self._rotation_sampler: sampling.Sampler = sampling.UniformSampler.create(
            zeros, zeros
        )
        self._translation_sampler: sampling.Sampler = sampling.UniformSampler.create(
            zeros, zeros
        )

        self._world = np.eye(4, dtype=np.float32)
        self._centroid = np.zeros(3, dtype=np.float32)

        self._float_attributes: dict[str, sampling.Sampler] = {}
        self._vec3_attributes: dict[str, sampling.Sampler] = {}

    # -- identity / hierarchy -------------------------------------------------

    def name(self) -> str:
        return self._name

    def parent(self) -> Optional["Transformable"]:
        return self._parent

    def child(self) -> Optional["Transformable"]:
        return self._child

    def set_parent(self, parent: "Transformable") -> None:
        self._parent = parent
        parent._child = self

    # Reference-style alias (entity/base.py:128-131).
    setParent = set_parent

    def relative(self) -> bool:
        return self._parent is not None

    def randomizable(self) -> bool:
        return self._randomizable

    def set_randomizable(self, value: bool) -> None:
        self._randomizable = value

    # -- pose spec -------------------------------------------------------------

    def set_world(self, world) -> None:
        self._world = np.asarray(world, np.float32).reshape(4, 4)

    def set_centroid(self, centroid) -> None:
        self._centroid = np.asarray(centroid, np.float32).reshape(3)

    def set_rotation_sampler(self, sampler: sampling.Sampler) -> None:
        self._randomizable = True
        self._rotation_sampler = sampler

    def set_translation_sampler(self, sampler: sampling.Sampler) -> None:
        self._randomizable = True
        self._translation_sampler = sampler

    def rotate_x(self, min_rot: float, max_rot: float) -> None:
        self._randomizable = True
        self._rotation_sampler = self._rotation_sampler.set_index_interval(0, min_rot, max_rot)

    def rotate_y(self, min_rot: float, max_rot: float) -> None:
        self._randomizable = True
        self._rotation_sampler = self._rotation_sampler.set_index_interval(1, min_rot, max_rot)

    def rotate_z(self, min_rot: float, max_rot: float) -> None:
        self._randomizable = True
        self._rotation_sampler = self._rotation_sampler.set_index_interval(2, min_rot, max_rot)

    def rotate(self, minimum, maximum) -> None:
        self._randomizable = True
        self._rotation_sampler = self._rotation_sampler.set_sample_interval(minimum, maximum)

    def translate_x(self, min_t: float, max_t: float) -> None:
        self._randomizable = True
        self._translation_sampler = self._translation_sampler.set_index_interval(0, min_t, max_t)

    def translate_y(self, min_t: float, max_t: float) -> None:
        self._randomizable = True
        self._translation_sampler = self._translation_sampler.set_index_interval(1, min_t, max_t)

    def translate_z(self, min_t: float, max_t: float) -> None:
        self._randomizable = True
        self._translation_sampler = self._translation_sampler.set_index_interval(2, min_t, max_t)

    def translate(self, minimum, maximum) -> None:
        self._randomizable = True
        self._translation_sampler = self._translation_sampler.set_sample_interval(minimum, maximum)

    # -- attribute spec ----------------------------------------------------------

    def add_float_key(self, key: str, minimum: float, maximum: float) -> None:
        self._randomizable = True
        self._float_attributes[key] = sampling.UniformSampler.create(minimum, maximum)

    def add_float_sampler(self, key: str, sampler: sampling.Sampler) -> None:
        self._randomizable = True
        self._float_attributes[key] = sampler

    def add_vec3_key(self, key: str, minimum, maximum) -> None:
        self._randomizable = True
        self._vec3_attributes[key] = sampling.UniformSampler.create(
            np.asarray(minimum, np.float32).reshape(3),
            np.asarray(maximum, np.float32).reshape(3),
        )

    def add_vec3_sampler(self, key: str, sampler: sampling.Sampler) -> None:
        self._randomizable = True
        self._vec3_attributes[key] = sampler

    def float_attributes(self) -> dict:
        return self._float_attributes

    def vec3_attributes(self) -> dict:
        return self._vec3_attributes

    # -- pure sampling (called from Scene's compiled randomize) -----------------

    def sample_own_world(self, key: Array, step, train: bool) -> Array:
        """Randomized local world (parent composition happens in Scene).

        (T + centroid) @ R @ base_world.  A non-randomizable entity still
        recomposes its centroid (vertices are stored centroid-aligned,
        reference scene.py:118-132) so emitted positions match the original.
        """
        if not self._randomizable:
            return ffmath.translation_matrix(jnp.asarray(self._centroid)) @ jnp.asarray(
                self._world
            )
        k_t, k_r = jax.random.split(key)
        t = self._translation_sampler.sample(k_t, step, train)
        angles = self._rotation_sampler.sample(k_r, step, train)
        t_mat = ffmath.translation_matrix(t + jnp.asarray(self._centroid))
        r_mat = ffmath.to_mat4x4(ffmath.euler_to_rotation(angles))
        return t_mat @ r_mat @ jnp.asarray(self._world)

    def sample_attributes(self, key: Array, step, train: bool) -> dict[str, Array]:
        """Sample every float/vec3 attribute; returns {attr_key: value}."""
        out: dict[str, Array] = {}
        items = list(self._float_attributes.items()) + list(self._vec3_attributes.items())
        for i, (attr_key, sampler) in enumerate(items):
            out[attr_key] = sampler.sample(jax.random.fold_in(key, i), step, train)
        return out

    def non_randomized_world(self) -> np.ndarray:
        if self._parent is None:
            return self._world
        return self._parent.non_randomized_world() @ self._world


class Curve(Transformable):
    """Moves an entity along a NURBS path, oriented to the tangent.

    Reference: fireflies/entity/curve.py — train picks a random curve
    parameter t ~ U(0,1); eval marches t by `interp_delta` per step.  The
    local world becomes translation(curve(t)) @ align(-Z -> tangent(t)).
    """

    def __init__(self, name: str, curve, interp_delta: float = 0.01):
        super().__init__(name)
        self._curve = curve
        self._interp_delta = float(interp_delta)
        self._randomizable = True

    def curve(self):
        return self._curve

    def sample_own_world(self, key: Array, step, train: bool) -> Array:
        if train:
            t = jax.random.uniform(key, ())
        else:
            n_steps = max(int(1.0 / self._interp_delta), 1)
            t = (jnp.asarray(step, jnp.int32) % n_steps).astype(jnp.float32) * self._interp_delta
        point = self._curve.evaluate(t)
        tangent = self._curve.tangent(t)
        # Align the entity's forward axis (-Z, camera convention) to the tangent.
        r = ffmath.rotation_matrix_from_vectors(jnp.array([0.0, 0.0, -1.0]), tangent)
        m = ffmath.to_mat4x4(r)
        m = m.at[:3, 3].set(point)
        return m @ jnp.asarray(self._world)


AnimationFunc = Callable[[Array, Array], Array]

"""Projective camera model shared by sensor and laser.

Reference: fireflies/projection/camera.py.  A Camera wraps a Transformable
(pose) plus intrinsics (fov, clips).  `points_to_ndc` is the working version
of the reference's pointsToNDC (camera.py:67-74, broken there via the empty
transforms module).

Pose resolution: methods accept an optional randomized param dict (the output
of Scene.compile()); if it contains "<name>.to_world" that pose is used,
otherwise the entity's static world.  This keeps the pythonic API while the
hot paths stay pure.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from fireflies_tpu.entity.transformable import Transformable
from fireflies_tpu.utils import math as ffmath
from fireflies_tpu.utils.io import build_projection_matrix

Array = jax.Array


class Camera:
    MITSUBA_KEYS = {"fov": "x_fov", "f": "x_fov", "to_world": "to_world", "world": "to_world"}
    _id_counter = 0

    def __init__(
        self,
        transformable: Transformable,
        fov: float = 45.0,
        near_clip: float = 0.01,
        far_clip: float = 1000.0,
    ):
        self._transformable = transformable
        self._fov = float(fov)
        self._near_clip = float(near_clip)
        self._far_clip = float(far_clip)
        self._perspective = build_projection_matrix(fov, near_clip, far_clip)
        self._key = self._generate_key()
        Camera._id_counter += 1

    def _generate_key(self) -> str:
        if Camera._id_counter == 0:
            return "PerspectiveCamera"
        return f"PerspectiveCamera_{Camera._id_counter}"

    # -- accessors (reference camera.py:37-66) --------------------------------

    def key(self) -> str:
        return self._key

    def full_key(self, key: str) -> str:
        return self._key + "." + self.MITSUBA_KEYS[key]

    def fov(self) -> float:
        return self._fov

    def near_clip(self) -> float:
        return self._near_clip

    def far_clip(self) -> float:
        return self._far_clip

    def perspective(self) -> Array:
        return self._perspective

    def transformable(self) -> Transformable:
        return self._transformable

    def world(self, params: Optional[dict] = None) -> Array:
        if params is not None:
            key = self._transformable.name() + ".to_world"
            if key in params:
                return jnp.asarray(params[key])
        return jnp.asarray(self._transformable.non_randomized_world())

    def origin(self, params: Optional[dict] = None) -> Array:
        return self.world(params)[:3, 3]

    # -- projection ------------------------------------------------------------

    def points_to_ndc(self, points: Array, params: Optional[dict] = None) -> Array:
        """World points (N, 3) -> NDC (x, y in [-1, 1], z = view depth)."""
        return points_to_ndc(points, self.world(params), self._fov)

    # Reference-style alias.
    pointsToNDC = points_to_ndc


# ---------------------------------------------------------------------------
# Pure functions (jit/vmap/grad-safe cores)
# ---------------------------------------------------------------------------


def points_to_ndc(points: Array, to_world: Array, fov_deg: float | Array) -> Array:
    view = ffmath.transform_points(points, jnp.linalg.inv(to_world))
    depth = -view[:, 2]
    tan_half = jnp.tan(jnp.deg2rad(jnp.asarray(fov_deg, jnp.float32)) / 2.0)
    safe = jnp.where(jnp.abs(depth) < 1e-8, 1e-8, depth)
    return jnp.stack(
        [view[:, 0] / (safe * tan_half), view[:, 1] / (safe * tan_half), depth], axis=-1
    )


def directions_to_ndc(dirs_local: Array, fov_deg: float | Array) -> Array:
    """Local-space directions (N, 3) (looking down -Z) -> NDC (N, 2)."""
    z = -dirs_local[:, 2]
    safe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    tan_half = jnp.tan(jnp.deg2rad(jnp.asarray(fov_deg, jnp.float32)) / 2.0)
    return jnp.stack(
        [dirs_local[:, 0] / (safe * tan_half), dirs_local[:, 1] / (safe * tan_half)],
        axis=-1,
    )


def ndc_to_directions(ndc: Array, fov_deg: float | Array) -> Array:
    """NDC points (N, 2) -> unit local directions looking down -Z."""
    tan_half = jnp.tan(jnp.deg2rad(jnp.asarray(fov_deg, jnp.float32)) / 2.0)
    d = jnp.stack(
        [ndc[:, 0] * tan_half, ndc[:, 1] * tan_half, -jnp.ones_like(ndc[:, 0])], axis=-1
    )
    return ffmath.normalize_vectors(d)

"""Geometric intersection predicates (pure JAX).

Reference: fireflies/utils/intersections.py (rayPlane :5, sphereSphere :26).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def ray_plane(
    ray_origin: Array,
    ray_direction: Array,
    plane_origin: Array,
    plane_normal: Array,
    eps: float = 1e-6,
) -> Array:
    """Batched ray/plane intersection points.

    Inputs broadcast over leading dims; returns (..., 3) intersection points.
    Degenerate (parallel) rays get a guarded denominator like the reference's
    epsilon clamp (intersections.py:8-12) — callers should mask with
    `ray_plane_t` validity if needed.
    """
    t = ray_plane_t(ray_origin, ray_direction, plane_origin, plane_normal, eps)
    return ray_origin + t[..., None] * ray_direction


def ray_plane_t(
    ray_origin: Array,
    ray_direction: Array,
    plane_origin: Array,
    plane_normal: Array,
    eps: float = 1e-6,
) -> Array:
    """Parametric distance of ray/plane intersection; (...,) array."""
    denom = jnp.sum(ray_direction * plane_normal, axis=-1)
    denom = jnp.where(jnp.abs(denom) < eps, jnp.where(denom < 0, -eps, eps), denom)
    diff = plane_origin - ray_origin
    return jnp.sum(diff * plane_normal, axis=-1) / denom


def sphere_sphere(
    center_a: Array, radius_a: Array, center_b: Array, radius_b: Array
) -> Array:
    """True where two spheres overlap (intersections.py:26-33)."""
    dist = jnp.linalg.norm(center_a - center_b, axis=-1)
    return dist <= (radius_a + radius_b)


def ray_aabb(
    ray_origin: Array,
    inv_direction: Array,
    box_min: Array,
    box_max: Array,
    t_min: Array | float = 0.0,
    t_max: Array | float = jnp.inf,
):
    """Slab test. Returns (hit, t_near). Broadcasts over leading dims.

    `inv_direction` = 1/d with infs allowed (IEEE slab test handles them).
    """
    t0 = (box_min - ray_origin) * inv_direction
    t1 = (box_max - ray_origin) * inv_direction
    t_small = jnp.minimum(t0, t1)
    t_big = jnp.maximum(t0, t1)
    t_near = jnp.maximum(jnp.max(t_small, axis=-1), t_min)
    t_far = jnp.minimum(jnp.min(t_big, axis=-1), t_max)
    return t_near <= t_far, t_near

"""NURBS curve evaluation in pure JAX (replaces the reference's geomdl dep).

The reference imports Blender-exported NURBS curves and evaluates points /
tangents along them to drive camera paths (fireflies/entity/curve.py:52-74,
fireflies/utils/io.py:142-177).  We evaluate with the Cox-de Boor recursion,
vectorized over control points so it is jit/vmap/grad-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


class NURBSCurve(struct.PyTreeNode):
    """A (possibly rational) B-spline curve.

    Attributes:
      control_points: (N, 3) control points.
      weights: (N,) rational weights (ones for plain B-splines).
      knots: (N + degree + 1,) non-decreasing knot vector.
      degree: spline degree (static).
    """

    control_points: Array
    weights: Array
    knots: Array
    degree: int = struct.field(pytree_node=False, default=3)

    @classmethod
    def create(cls, control_points, knots, degree: int, weights=None) -> "NURBSCurve":
        # Host numpy storage (device arrays captured in jit closures degrade
        # the axon tunnel; see sampling.base._as_f32).
        import numpy as np

        cp = np.asarray(control_points, np.float32)
        if weights is None:
            weights = np.ones((cp.shape[0],), np.float32)
        return cls(
            control_points=cp,
            weights=np.asarray(weights, np.float32),
            knots=np.asarray(knots, np.float32),
            degree=int(degree),
        )

    # -- evaluation ----------------------------------------------------------

    def _basis(self, u: Array) -> Array:
        """All nonrational basis functions N_{i,p}(u), shape (N,)."""
        n_ctrl = self.control_points.shape[0]
        p = self.degree
        knots = jnp.asarray(self.knots)
        # Clamp u strictly inside the valid domain so the half-open basis
        # intervals behave at the right end.
        lo = knots[p]
        hi = knots[n_ctrl]
        eps = 1e-6 * (hi - lo)
        u = jnp.clip(u, lo, hi - eps)

        # Degree-0 basis: indicator of [knots[i], knots[i+1]).
        t0 = knots[:-1]
        t1 = knots[1:]
        basis = ((u >= t0) & (u < t1)).astype(jnp.float32)  # (len(knots)-1,)

        for d in range(1, p + 1):
            left_den = knots[d:-1] - knots[: -d - 1]
            right_den = knots[d + 1 :] - knots[1:-d]
            left_den = jnp.where(left_den == 0, 1.0, left_den)
            right_den = jnp.where(right_den == 0, 1.0, right_den)
            left = (u - knots[: -d - 1]) / left_den * basis[:-1]
            right = (knots[d + 1 :] - u) / right_den * basis[1:]
            basis = left + right
        return basis[:n_ctrl]

    def evaluate(self, t: Array) -> Array:
        """Point on the curve at normalized parameter t in [0, 1]; (3,)."""
        u = self._param(t)
        basis = self._basis(u) * jnp.asarray(self.weights)
        denom = jnp.sum(basis)
        denom = jnp.where(denom == 0, 1.0, denom)
        return (basis @ jnp.asarray(self.control_points)) / denom

    def tangent(self, t: Array, eps: float = 1e-4) -> Array:
        """Unit tangent at t via central differences (adequate for camera
        pathing; exact derivative basis is a round-2 nicety)."""
        t = jnp.clip(t, eps, 1.0 - eps)
        p0 = self.evaluate(t - eps)
        p1 = self.evaluate(t + eps)
        d = p1 - p0
        return d / (jnp.linalg.norm(d) + 1e-20)

    def evaluate_many(self, ts: Array) -> Array:
        """(K,) params -> (K, 3) points."""
        return jax.vmap(self.evaluate)(ts)

    def _param(self, t: Array) -> Array:
        knots = jnp.asarray(self.knots)
        lo = knots[self.degree]
        hi = knots[self.control_points.shape[0]]
        return lo + jnp.asarray(t, jnp.float32) * (hi - lo)

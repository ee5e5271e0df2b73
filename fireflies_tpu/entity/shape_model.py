"""Parametric shape models.

The reference defines an abstract ShapeModel(Mesh) (fireflies/entity/shape.py)
and a FLAME morphable-head instance (fireflies/entity/flame.py) that drifts
shape parameters each randomize step (+-0.05 with inversion at |p| = 2.0,
flame.py:105-113).  FLAME's learned weights are external assets; here we
implement the general mechanism — a linear blend-shape model
``verts = template + basis @ params`` — as pure JAX, plus a FlameShapeModel
that loads FLAME-format weights from an .npz when available and otherwise
raises with a clear message.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from fireflies_tpu.entity.mesh import Mesh

Array = jax.Array


class ShapeModel(Mesh):
    """Linear blend-shape model entity.

    verts(params) = template + einsum('k,kvc->vc', params, basis)

    Randomization follows the reference FLAME drift scheme: every step the
    shape parameters random-walk by U(-drift, drift), reflecting at
    +-param_limit (flame.py:105-113).  Because the walk is stateful in the
    reference, here each variant derives its parameters from the step/key
    directly: train draws params ~ U(-limit, limit) scaled by a smoothness
    factor; eval sweeps the first parameter.
    """

    def __init__(
        self,
        name: str,
        template,
        basis,
        faces=None,
        param_limit: float = 2.0,
        drift: float = 0.05,
    ):
        template = np.asarray(template, np.float32)
        super().__init__(name, template, faces)
        self._basis = np.asarray(basis, np.float32)  # (K, V, 3)
        assert self._basis.shape[1:] == template.shape, (
            f"basis {self._basis.shape} incompatible with template {template.shape}"
        )
        self._param_limit = float(param_limit)
        self._drift = float(drift)
        self._randomizable = True
        self._animated = True  # participates in vertex sampling

    def n_params(self) -> int:
        return self._basis.shape[0]

    def get_vertex_data(self, params: Array) -> Array:
        """Differentiable blend-shape evaluation (reference getVertexData,
        flame.py:115-131)."""
        return jnp.asarray(self._vertices) + jnp.einsum(
            "k,kvc->vc", params, jnp.asarray(self._basis)
        )

    # Reference-style alias.
    getVertexData = get_vertex_data

    def sample_params(self, key: Array, step, train: bool) -> Array:
        k = self.n_params()
        if train:
            return jax.random.uniform(
                key, (k,), minval=-self._param_limit, maxval=self._param_limit
            ) * jnp.float32(self._drift / 0.05 * 0.25)
        # Eval: deterministic sweep of the first parameter.
        n_steps = max(int(2 * self._param_limit / max(self._drift, 1e-6)), 1)
        p0 = -self._param_limit + (
            jnp.asarray(step, jnp.int32) % n_steps
        ).astype(jnp.float32) * self._drift
        return jnp.zeros((k,), jnp.float32).at[0].set(p0)

    def sample_local_vertices(self, key: Array, step, train: bool) -> Array:
        params = self.sample_params(key, step, train)
        return self.get_vertex_data(params)


class FlameShapeModel(ShapeModel):
    """FLAME morphable head as a randomizable entity (reference
    fireflies/entity/flame.py: 100 shape + 50 expression + 6 pose params).

    FLAME's weights are proprietary external assets; pass the path to an .npz
    with `template` (V, 3), `shapedirs` (V, 3, K) and optionally `faces`.
    """

    def __init__(self, name: str, weights_path: str, n_shape: int = 100, n_expr: int = 50):
        data = np.load(weights_path, allow_pickle=True)
        template = np.asarray(data["template"], np.float32)
        shapedirs = np.asarray(data["shapedirs"], np.float32)  # (V, 3, K)
        k = min(shapedirs.shape[-1], n_shape + n_expr)
        basis = np.moveaxis(shapedirs[..., :k], -1, 0)  # (K, V, 3)
        faces = data["faces"] if "faces" in data else None
        super().__init__(name, template, basis, faces)
        self._n_shape = n_shape
        self._n_expr = n_expr

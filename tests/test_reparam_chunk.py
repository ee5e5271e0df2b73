"""Chunked warp application (reparam_chunk) is exactly equivalent.

The warp is row-wise with a key-shared aux constellation, so lax.map over
ray chunks must reproduce the full-film application bit-for-bit (values AND
theta-gradients) — the chunking exists purely to bound peak memory (a full
512^2 film's warp transients OOM a 16 GiB chip; see
reparam._apply_warp_chunked).  A non-dividing chunk size exercises the
padding path.
"""

import numpy as np
import jax
import jax.numpy as jnp

from fireflies_tpu.render.reparam import reparam_direction, reparam_ndc
from fireflies_tpu.render.types import Camera, Geometry


def _geo(dx=0.0):
    verts = jnp.asarray(
        [
            [-2.0, -2.0, -3.0], [2.0, -2.0, -3.0], [2.0, 2.0, -3.0],
            [-2.0, 2.0, -3.0],
            [-0.5 + dx, -0.5, -1.5], [0.5 + dx, -0.5, -1.5],
            [0.5 + dx, 0.5, -1.5],
        ],
        jnp.float32,
    )
    faces = jnp.asarray([[0, 1, 2], [0, 2, 3], [4, 5, 6]], jnp.int32)
    return Geometry(
        vertices=verts, faces=faces,
        face_mat=jnp.zeros(3, jnp.int32), face_mesh=jnp.zeros(3, jnp.int32),
    )


def test_reparam_ndc_chunked_equivalent():
    cam = Camera.create(jnp.eye(4), fov=60.0)
    n = 100  # chunk=32 leaves a remainder -> padding path
    u = jax.random.uniform(jax.random.key(1), (n, 2), minval=-0.8, maxval=0.8)
    coeff = jax.random.normal(jax.random.key(2), (n, 2))

    def functional(dx, chunk):
        geo = _geo(dx)
        u_new, area = reparam_ndc(
            cam, u, geo, jax.random.key(5), k_aux=4, radius=0.1,
            tri_chunk=16, chunk=chunk,
        )
        return jnp.sum(u_new * coeff) + jnp.sum(area * coeff[:, 0])

    v0, g0 = jax.value_and_grad(functional)(jnp.float32(0.05), 0)
    v1, g1 = jax.value_and_grad(functional)(jnp.float32(0.05), 32)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    np.testing.assert_allclose(float(g0), float(g1), rtol=1e-5)
    assert abs(float(g0)) > 1e-9  # the functional actually sees the warp


def test_reparam_direction_chunked_equivalent():
    n = 70
    k = jax.random.key(3)
    x = jnp.tile(jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32), (n, 1))
    w = jax.random.normal(k, (n, 3)) * jnp.asarray([[0.3, 0.3, 1.0]])
    w = -jnp.abs(w)  # look towards -z where the geometry sits
    w = w / jnp.linalg.norm(w, axis=-1, keepdims=True)
    coeff = jax.random.normal(jax.random.key(4), (n, 3))

    def functional(dx, chunk):
        geo = _geo(dx)
        d_new, area = reparam_direction(
            x, w, geo, jax.random.key(6), k_aux=4, radius=0.15,
            tri_chunk=16, chunk=chunk,
        )
        return jnp.sum(d_new * coeff) + jnp.sum(area * coeff[:, 0])

    v0, g0 = jax.value_and_grad(functional)(jnp.float32(0.02), 0)
    v1, g1 = jax.value_and_grad(functional)(jnp.float32(0.02), 32)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    np.testing.assert_allclose(float(g0), float(g1), rtol=1e-5)

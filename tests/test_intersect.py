import numpy as np
import jax
import jax.numpy as jnp
import pytest

import fireflies_tpu.render.intersect as intersect
from fireflies_tpu.render.types import Geometry


def _single_triangle(z=-2.0):
    verts = jnp.array([[-1.0, -1.0, z], [1.0, -1.0, z], [0.0, 1.0, z]], jnp.float32)
    faces = jnp.array([[0, 1, 2]], jnp.int32)
    return Geometry(
        vertices=verts,
        faces=faces,
        face_mat=jnp.zeros(1, jnp.int32),
        face_mesh=jnp.zeros(1, jnp.int32),
    )


def test_single_triangle_hit():
    geo = _single_triangle(z=-2.0)
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    hit = intersect.intersect_brute(o, d, geo)
    assert bool(hit.valid[0])
    assert float(hit.t[0]) == pytest.approx(2.0, abs=1e-5)
    assert int(hit.prim[0]) == 0


def test_miss_outside_triangle():
    geo = _single_triangle()
    o = jnp.array([[5.0, 5.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    hit = intersect.intersect_brute(o, d, geo)
    assert not bool(hit.valid[0])
    assert int(hit.prim[0]) == -1
    assert float(hit.t[0]) == 0.0


def test_closest_of_two_triangles():
    verts = jnp.array(
        [
            [-1, -1, -2], [1, -1, -2], [0, 1, -2],   # near
            [-1, -1, -5], [1, -1, -5], [0, 1, -5],   # far
        ],
        jnp.float32,
    )
    faces = jnp.array([[3, 4, 5], [0, 1, 2]], jnp.int32)  # far one listed first
    geo = Geometry(
        vertices=verts,
        faces=faces,
        face_mat=jnp.zeros(2, jnp.int32),
        face_mesh=jnp.arange(2, dtype=jnp.int32),
    )
    o = jnp.zeros((1, 3))
    d = jnp.array([[0.0, 0.0, -1.0]])
    hit = intersect.intersect_brute(o, d, geo)
    assert int(hit.prim[0]) == 1  # the near triangle
    assert float(hit.t[0]) == pytest.approx(2.0, abs=1e-5)


def test_chunking_consistency():
    # Random soup: chunk sizes must not change results.
    rng = np.random.default_rng(0)
    verts = jnp.asarray(rng.normal(size=(300, 3)), jnp.float32)
    faces = jnp.asarray(rng.integers(0, 300, size=(211, 3)), jnp.int32)
    geo = Geometry(
        vertices=verts,
        faces=faces,
        face_mat=jnp.zeros(211, jnp.int32),
        face_mesh=jnp.zeros(211, jnp.int32),
    )
    o = jnp.asarray(rng.normal(size=(64, 3)) * 3, jnp.float32)
    d = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    h1 = intersect.intersect_brute(o, d, geo, tri_chunk=16)
    h2 = intersect.intersect_brute(o, d, geo, tri_chunk=211)
    np.testing.assert_array_equal(h1.prim, h2.prim)
    np.testing.assert_allclose(h1.t, h2.t, rtol=1e-5)


def test_occlusion():
    geo = _single_triangle(z=-2.0)
    o = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -4.0], [0.0, 0.0, 4.0]])  # toward / away
    blocked = intersect.occluded(o, d, geo, t_max=1.0)
    assert bool(blocked[0]) and not bool(blocked[1])
    # Segment ends before the triangle -> not blocked.
    short = intersect.occluded(o[:1], jnp.array([[0.0, 0.0, -1.0]]), geo, t_max=1.0)
    assert not bool(short[0])


def test_hit_attributes_barycentric_and_normal():
    geo = _single_triangle(z=-2.0)
    o = jnp.array([[0.1, -0.2, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    hit = intersect.intersect_brute(o, d, geo)
    attrs = intersect.hit_attributes(o, d, hit, geo)
    np.testing.assert_allclose(attrs["position"][0], [0.1, -0.2, -2.0], atol=1e-5)
    np.testing.assert_allclose(np.abs(attrs["normal"][0]), [0, 0, 1], atol=1e-5)
    assert float(attrs["t"][0]) == pytest.approx(2.0, abs=1e-5)


def test_gradient_wrt_vertices():
    # d(depth)/d(vertex z) for a triangle facing the camera should be ~1/3
    # per-vertex at the centroid (barycentric weights).
    o = jnp.array([[0.0, 0.0, 0.0]])
    # Aim at the centroid of the triangle below.
    faces = jnp.array([[0, 1, 2]], jnp.int32)

    def depth_of(verts):
        geo = Geometry(
            vertices=verts,
            faces=faces,
            face_mat=jnp.zeros(1, jnp.int32),
            face_mesh=jnp.zeros(1, jnp.int32),
        )
        centroid = verts.mean(0)
        d = centroid / jnp.linalg.norm(centroid)
        hit = intersect.intersect_brute(o, d[None], geo)
        hit = jax.tree.map(jax.lax.stop_gradient, hit)
        attrs = intersect.hit_attributes(o, d[None], hit, geo)
        return attrs["t"][0]

    verts0 = jnp.array([[-1.0, -1.0, -2.0], [1.0, -1.0, -2.0], [0.0, 1.0, -2.0]])
    g = jax.grad(depth_of)(verts0)
    # The ray tracks the centroid, so t = |centroid| and
    # d t / d v_z summed over vertices = c_z / |c|.
    c = np.asarray(verts0.mean(0))
    expected = c[2] / np.linalg.norm(c)
    assert float(g[:, 2].sum()) == pytest.approx(expected, abs=1e-3)

    # Finite-difference check on one vertex.
    eps = 1e-3
    vp = verts0.at[0, 2].add(eps)
    vm = verts0.at[0, 2].add(-eps)
    fd = (depth_of(vp) - depth_of(vm)) / (2 * eps)
    assert float(g[0, 2]) == pytest.approx(float(fd), abs=1e-2)

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fireflies_tpu.utils import math as ffmath
from fireflies_tpu.utils import intersections


def test_rotations_orthonormal():
    for fn in (ffmath.rot_x, ffmath.rot_y, ffmath.rot_z):
        r = fn(0.7)
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
        assert jnp.linalg.det(r) == pytest.approx(1.0, abs=1e-6)


def test_rot_z_rotates_x_to_y():
    r = ffmath.rot_z(jnp.pi / 2)
    np.testing.assert_allclose(r @ jnp.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)


def test_euler_composition_order():
    angles = jnp.array([0.1, 0.2, 0.3])
    r = ffmath.euler_to_rotation(angles)
    expected = ffmath.rot_z(0.3) @ ffmath.rot_y(0.2) @ ffmath.rot_x(0.1)
    np.testing.assert_allclose(r, expected, atol=1e-6)


def test_transform_points_translation():
    m = ffmath.translation_matrix(jnp.array([1.0, 2.0, 3.0]))
    pts = jnp.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
    out = ffmath.transform_points(pts, m)
    np.testing.assert_allclose(out, [[1, 2, 3], [2, 3, 4]], atol=1e-6)


def test_transform_directions_ignores_translation():
    m = ffmath.translation_matrix(jnp.array([5.0, 5.0, 5.0]))
    d = jnp.array([[0.0, 0.0, -1.0]])
    np.testing.assert_allclose(ffmath.transform_directions(d, m), d, atol=1e-6)


def test_rotation_matrix_from_vectors():
    v1 = jnp.array([1.0, 0.0, 0.0])
    v2 = jnp.array([0.0, 1.0, 0.0])
    r = ffmath.rotation_matrix_from_vectors(v1, v2)
    np.testing.assert_allclose(r @ v1, v2, atol=1e-5)
    # Parallel case -> identity.
    r_id = ffmath.rotation_matrix_from_vectors(v1, v1)
    np.testing.assert_allclose(r_id, np.eye(3), atol=1e-5)
    # Anti-parallel case still maps v1 -> -v1.
    r_anti = ffmath.rotation_matrix_from_vectors(v1, -v1)
    np.testing.assert_allclose(r_anti @ v1, -v1, atol=1e-5)


def test_look_at():
    m = ffmath.look_at(jnp.array([0.0, 0, 5]), jnp.array([0.0, 0, 0]), jnp.array([0.0, 1, 0]))
    # Camera at (0,0,5) looking at origin: forward (-Z camera axis) = (0,0,-1).
    fwd_world = ffmath.transform_directions(jnp.array([[0.0, 0, -1]]), m)[0]
    np.testing.assert_allclose(fwd_world, [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(m[:3, 3], [0, 0, 5], atol=1e-6)


def test_random_between_bounds():
    key = jax.random.key(0)
    lo = jnp.array([-1.0, 0.0, 2.0])
    hi = jnp.array([1.0, 0.0, 5.0])
    for i in range(5):
        v = ffmath.random_between(jax.random.fold_in(key, i), lo, hi)
        assert jnp.all(v >= lo) and jnp.all(v <= hi)
        assert v[1] == 0.0


def test_ray_plane():
    o = jnp.array([[0.0, 0, 5], [0.0, 0, 5]])
    d = jnp.array([[0.0, 0, -1], [0.0, 1, 0]])  # second is parallel to plane
    p0 = jnp.zeros(3)
    n = jnp.array([0.0, 0, 1.0])
    pts = intersections.ray_plane(o, d, p0, n)
    np.testing.assert_allclose(pts[0], [0, 0, 0], atol=1e-5)


def test_ray_aabb():
    o = jnp.array([0.0, 0, 5])
    d = jnp.array([0.0, 0, -1.0])
    hit, t = intersections.ray_aabb(o, 1.0 / d, jnp.array([-1.0, -1, -1]), jnp.array([1.0, 1, 1]))
    assert bool(hit)
    assert t == pytest.approx(4.0, abs=1e-5)
    miss, _ = intersections.ray_aabb(
        o, 1.0 / jnp.array([0.0, 0, 1.0]), jnp.array([-1.0, -1, -1]), jnp.array([1.0, 1, 1])
    )
    assert not bool(miss)


def test_normalize():
    x = jnp.array([2.0, 4.0, 6.0])
    np.testing.assert_allclose(ffmath.normalize(x), [0, 0.5, 1.0], atol=1e-6)

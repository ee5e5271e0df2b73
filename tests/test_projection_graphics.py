import numpy as np
import jax
import jax.numpy as jnp
import pytest

import fireflies_tpu as ff
from fireflies_tpu import projection
from fireflies_tpu.graphics import rasterization as raster
from fireflies_tpu.projection import laser as laser_mod


def test_rasterize_points_peak_at_point():
    pts = jnp.array([[0.5, 0.5]])
    img = raster.rasterize_points(pts, sigma=10.0, texture_size=(64, 64))
    assert img.shape == (1, 64, 64)
    iy, ix = np.unravel_index(np.argmax(np.asarray(img[0])), (64, 64))
    assert abs(iy - 32) <= 1 and abs(ix - 32) <= 1
    assert float(img[0].max()) == pytest.approx(1.0, abs=1e-3)


def test_softor_vs_sum():
    pts = jnp.array([[0.3, 0.3], [0.3, 0.3]])  # two coincident points
    stack = raster.rasterize_points(pts, 10.0, (32, 32))
    s = raster.sum_(stack)
    o = raster.softor(stack)
    # Sum double-counts, softor saturates at 1.
    assert float(s.max()) == pytest.approx(2.0, abs=1e-2)
    assert float(o.max()) <= 1.0 + 1e-5


def test_reduced_rasterizers_match_naive():
    key = jax.random.key(0)
    pts = jax.random.uniform(key, (37, 2))
    stack = raster.rasterize_points(pts, 20.0, (48, 48))
    np.testing.assert_allclose(
        raster.sum_points(pts, 20.0, (48, 48), chunk=8),
        raster.sum_(stack),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        raster.softor_points(pts, 20.0, (48, 48), chunk=8),
        raster.softor(stack),
        rtol=1e-4, atol=1e-5,
    )


def test_rasterize_lines():
    lines = jnp.array([[[0.25, 0.5], [0.75, 0.5]]])
    img = raster.rasterize_lines(lines, sigma=30.0, texture_size=(64, 64))
    arr = np.asarray(img[0])
    # Bright along the horizontal midline segment, dark far away.
    assert arr[32, 32] > 0.9
    assert arr[32, 10] < arr[32, 32]  # off-segment endpoint cap
    assert arr[5, 5] < 0.1


def test_rasterization_is_differentiable():
    pts = jnp.array([[0.4, 0.6]])

    def brightness_at_center(p):
        return raster.softor_points(p, 50.0, (32, 32))[16, 16]

    g = jax.grad(brightness_at_center)(pts)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0.0


def test_uniform_rays_grid():
    rays = laser_mod.generate_uniform_rays(0.05, 5, 5)
    assert rays.shape == (25, 3)
    np.testing.assert_allclose(jnp.linalg.norm(rays, axis=-1), 1.0, atol=1e-5)
    assert float(rays[12, 2]) == pytest.approx(-1.0, abs=1e-5)  # center beam


def test_rays_by_count_inside_fov():
    rays = laser_mod.generate_uniform_rays_by_count(4, 4, fov_deg=30.0)
    ndc = projection.directions_to_ndc(rays, 30.0)
    assert float(jnp.abs(ndc).max()) < 1.0


def test_ndc_roundtrip():
    ndc = jnp.array([[0.3, -0.7], [-0.9, 0.2], [0.0, 0.0]])
    rays = projection.ndc_to_directions(ndc, 40.0)
    back = projection.directions_to_ndc(rays, 40.0)
    np.testing.assert_allclose(back, ndc, atol=1e-5)


def test_blue_noise_rays():
    rays = laser_mod.generate_blue_noise_rays(128, 128, 64, fov_deg=30.0, seed=0)
    assert rays.shape[0] > 20
    ndc = projection.directions_to_ndc(rays, 30.0)
    assert float(jnp.abs(ndc).max()) <= 1.0 + 1e-4


def test_clamp_and_respawn():
    # A ray far outside the frustum.
    rays = jnp.array([[0.9, 0.0, -0.3], [0.0, 0.0, -1.0]])
    rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    clamped = laser_mod.clamp_rays_to_fov(rays, 30.0, clamp_val=0.95)
    ndc = projection.directions_to_ndc(clamped, 30.0)
    assert float(jnp.abs(ndc).max()) <= 0.95 + 1e-4

    respawned = laser_mod.respawn_out_of_bounds(jax.random.key(0), rays, 30.0)
    ndc2 = projection.directions_to_ndc(respawned, 30.0)
    assert float(jnp.abs(ndc2).max()) <= 1.0 + 1e-4
    # The in-bounds ray is untouched.
    np.testing.assert_allclose(respawned[1], rays[1], atol=1e-5)


def test_laser_texture_and_save_load(tmp_path):
    proj = ff.Transformable("Projector")
    rays = laser_mod.generate_uniform_rays_by_count(3, 3, 30.0)
    laser = projection.Laser(proj, rays, fov=30.0)
    tex = laser.generate_texture(10.0, (64, 64))
    assert tex.shape == (9, 64, 64)
    summed = laser.generate_texture_summed(10.0, (64, 64))
    np.testing.assert_allclose(summed, raster.sum_(tex), rtol=1e-4, atol=1e-5)

    path = str(tmp_path / "laser.yml")
    laser.save(path)
    loaded = projection.Laser.load(path, proj)
    np.testing.assert_allclose(loaded.local_rays(), laser.local_rays(), atol=1e-6)
    assert loaded.fov() == laser.fov()


def test_epipolar_lines_render():
    proj_t = ff.Transformable("Projector")
    w = np.eye(4, dtype=np.float32)
    w[:3, 3] = [0.5, 0.0, 2.0]
    proj_t.set_world(w)
    cam_t = ff.Transformable("PerspectiveCamera")
    cw = np.eye(4, dtype=np.float32)
    cw[:3, 3] = [0.0, 0.0, 2.0]
    cam_t.set_world(cw)
    cam = projection.Camera(cam_t, fov=60.0, near_clip=1.0, far_clip=4.0)
    rays = laser_mod.generate_uniform_rays_by_count(2, 2, 20.0)
    laser = projection.Laser(proj_t, rays, fov=20.0, near_clip=1.0, far_clip=4.0)
    img = laser.render_epipolar_lines(cam, sigma=30.0, texture_size=(32, 32))
    assert img.shape == (4, 32, 32)
    assert float(img.max()) > 0.5  # lines visible

"""Soft-shadow aperture sampling (Lights.radius / Projector.aperture).

Geometry: camera+point light at the origin looking down -Z; receiver quad
at z=-2; occluder half-plane at z=-1 covering x<0.  A shadow segment from
receiver point (x_p, y, -2) to a disk sample (x_s, y_s, 0) crosses z=-1 at
x=(x_p+x_s)/2, so it is blocked iff x_s < -x_p: receiver points with
0 < x_p < r sit in the penumbra of a radius-r aperture, while any x_p > r
is fully lit (and everything x_p > 0 is lit for the hard delta light).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fireflies_tpu.render import RenderConfig, render_rgb
from fireflies_tpu.render.types import Camera, Geometry, Lights, Materials, RenderScene

W = 33


def _scene(radius, occluder=True):
    verts = jnp.array(
        [
            # receiver at z=-2
            [-10, -10, -2], [10, -10, -2], [10, 10, -2], [-10, 10, -2],
            # occluder half-plane x<0 at z=-1 (degenerate sliver if disabled)
            [-10, -10, -1], [0, -10, -1], [0, 10, -1], [-10, 10, -1],
        ],
        jnp.float32,
    )
    if not occluder:
        verts = verts.at[4:].set(jnp.array([-100.0, -100.0, -1.0], jnp.float32))
    faces = jnp.array(
        [[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], jnp.int32
    )
    geo = Geometry(
        vertices=verts,
        faces=faces,
        face_mat=jnp.zeros(4, jnp.int32),
        face_mesh=jnp.array([0, 0, 1, 1], jnp.int32),
    )
    mats = Materials.default(1).replace(
        base_color=jnp.full((1, 3), 0.6, jnp.float32),
        specular=jnp.zeros((1,)),
        roughness=jnp.ones((1,)),
    )
    lights = Lights(
        kinds=jnp.zeros(1, jnp.int32),
        to_world=jnp.eye(4, dtype=jnp.float32)[None],
        intensity=jnp.full((1, 3), 4.0, jnp.float32),
        cutoff_cos=jnp.zeros(1),
        beam_cos=jnp.ones(1),
        active=jnp.ones(1, bool),
        radius=None if radius is None else jnp.asarray([radius], jnp.float32),
    )
    cam = Camera.create(jnp.eye(4), fov=45.0)
    return RenderScene(geometry=geo, materials=mats, lights=lights, camera=cam)


def _col(x_p):
    """Film column whose center ray hits the receiver at x = x_p."""
    half = 2.0 * np.tan(np.deg2rad(45.0 / 2.0))  # receiver half-extent seen
    ndc = x_p / half
    return int(round((ndc + 1.0) * 0.5 * (W - 1)))


def _render(radius, spp=64, occluder=True):
    cfg = RenderConfig(width=W, height=W, spp=spp, max_bounces=1, tri_chunk=64)
    return np.asarray(
        render_rgb(_scene(radius, occluder=occluder), jax.random.key(0), cfg)
    )


def _visibility(radius, spp):
    """Occluded render / unoccluded render — removes the 1/r^2 + cosine
    shading profile, leaving the pure shadow factor per pixel."""
    shadowed = _render(radius, spp=spp)
    free = _render(radius, spp=spp, occluder=False)
    return shadowed[W // 2, :, 0] / np.maximum(free[W // 2, :, 0], 1e-9)


def test_hard_shadow_without_radius():
    vis = _visibility(None, spp=8)
    # Delta light: everything the camera sees at x_p > 0 is fully lit.
    assert vis[_col(0.25)] == pytest.approx(1.0, abs=0.05)
    assert vis[_col(0.7)] == pytest.approx(1.0, abs=0.05)


def test_aperture_penumbra():
    vis = _visibility(0.5, spp=64)
    assert vis[_col(0.7)] == pytest.approx(1.0, abs=0.1)  # x_p > r: outside
    pen = vis[_col(0.2)]  # 0 < x_p < r: inside the penumbra
    assert 0.05 < pen < 0.9
    # Monotone across the penumbra.
    assert pen < vis[_col(0.4)] <= 1.1


def test_zero_radius_matches_hard():
    hard = _render(None, spp=4)
    soft0 = _render(0.0, spp=4)
    np.testing.assert_allclose(soft0, hard, atol=1e-5)

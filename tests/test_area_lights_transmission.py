"""Area-light NEE (+MIS) and thin-transmission tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fireflies_tpu.render import RenderConfig, render_rgb
from fireflies_tpu.render import bsdf as bsdf_mod
from fireflies_tpu.render import lights as lights_mod
from fireflies_tpu.render.types import Camera, Geometry, Lights, Materials, RenderScene


def _area_light_scene(le=5.0, light_size=0.4, light_z=1.0):
    """Diffuse floor quad + overhead emissive quad; camera above the floor."""
    s = light_size
    verts = jnp.array(
        [
            # floor at z = -2 (facing camera at origin)
            [-10, -10, -2], [10, -10, -2], [10, 10, -2], [-10, 10, -2],
            # emitter at z = light_z (small, behind/above the camera)
            [-s, -s, light_z], [s, -s, light_z], [s, s, light_z], [-s, s, light_z],
        ],
        jnp.float32,
    )
    faces = jnp.array([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], jnp.int32)
    geo = Geometry(
        vertices=verts,
        faces=faces,
        face_mat=jnp.asarray([0, 0, 1, 1], jnp.int32),
        face_mesh=jnp.asarray([0, 0, 1, 1], jnp.int32),
        emissive_faces=jnp.asarray([2, 3], jnp.int32),
    )
    mats = Materials.default(2).replace(
        base_color=jnp.asarray([[0.7, 0.7, 0.7], [0.0, 0.0, 0.0]], jnp.float32),
        specular=jnp.zeros((2,)),
        roughness=jnp.ones((2,)),
        emission=jnp.asarray([[0, 0, 0], [le, le, le]], jnp.float32),
    )
    cam = Camera.create(jnp.eye(4), fov=45.0)
    return RenderScene(
        geometry=geo, materials=mats, lights=Lights.empty(), camera=cam
    )


def test_area_light_illuminates_floor_analytically():
    """Small emitter ~ point source: E = Le * A * cos^2 / d^2 at the floor
    point under it; floor radiance = albedo/pi * E."""
    le, s = 5.0, 0.2
    scene = _area_light_scene(le=le, light_size=s)
    cfg = RenderConfig(width=16, height=16, spp=64, max_bounces=1, tri_chunk=16)
    img = render_rgb(scene, jax.random.key(0), cfg)
    center = float(img[8, 8, 0])
    area = (2 * s) ** 2
    d = 3.0  # floor z=-2, light z=+1
    expected = 0.7 / np.pi * le * area / (d * d)
    assert center == pytest.approx(expected, rel=0.15)


def test_area_light_mis_consistency():
    """NEE+MIS (bounces>=2 includes BSDF-sampled emitter hits) must agree
    with the bounce-1 NEE-only estimate for a directly lit diffuse floor."""
    scene = _area_light_scene(le=3.0, light_size=0.5)
    cfg1 = RenderConfig(width=8, height=8, spp=128, max_bounces=1, tri_chunk=16)
    cfg2 = RenderConfig(width=8, height=8, spp=128, max_bounces=2, tri_chunk=16)
    a = float(jnp.mean(render_rgb(scene, jax.random.key(1), cfg1)))
    b = float(jnp.mean(render_rgb(scene, jax.random.key(2), cfg2)))
    # bounce-2 adds a little indirect light; must not double count (2x).
    assert b == pytest.approx(a, rel=0.25)
    assert b >= a * 0.9


def test_emitter_visible_directly():
    scene = _area_light_scene(le=2.0, light_size=5.0, light_z=-1.0)
    # Big emitter in front of the camera: camera pixels see Le directly.
    cfg = RenderConfig(width=8, height=8, spp=4, max_bounces=1, tri_chunk=16)
    img = render_rgb(scene, jax.random.key(0), cfg)
    assert float(img[4, 4, 0]) == pytest.approx(2.0, rel=0.01)


def test_sample_area_light_distribution():
    scene = _area_light_scene(light_size=0.3)
    p = jnp.zeros((256, 3))
    x, n_l, le, pdf = lights_mod.sample_area_light(
        scene.geometry, scene.materials, p, jax.random.key(0)
    )
    assert x.shape == (256, 3)
    # All samples on the emitter plane and inside its extent.
    np.testing.assert_allclose(np.asarray(x[:, 2]), 1.0, atol=1e-5)
    assert float(jnp.abs(x[:, 0]).max()) <= 0.3 + 1e-5
    np.testing.assert_allclose(np.asarray(le), 5.0, atol=1e-5)
    # pdf = 1/total_area.
    np.testing.assert_allclose(np.asarray(pdf), 1.0 / (0.6 * 0.6), rtol=1e-4)


def test_thin_transmission_lobe():
    mats = Materials.default(1).replace(
        spec_trans=jnp.asarray([0.8]),
        thin=jnp.asarray([1.0]),
        base_color=jnp.asarray([[0.64, 0.64, 0.64]]),
    )
    params = bsdf_mod.gather_params(mats, jnp.zeros(1, jnp.int32))
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    wo = jnp.asarray([[0.0, 0.0, 1.0]])
    wi_down = jnp.asarray([[0.0, 0.0, -1.0]])
    f = bsdf_mod.evaluate(params, n, wo, wi_down)
    expected = np.sqrt(0.64) / np.pi * 0.8
    assert float(f[0, 0]) == pytest.approx(expected, rel=1e-3)
    # Sampling produces downward directions a meaningful fraction of the time.
    params_n = jax.tree.map(lambda x: jnp.repeat(x, 512, axis=0), params)
    nn = jnp.tile(n, (512, 1))
    wos = jnp.tile(wo, (512, 1))
    wi, pdf, fs = bsdf_mod.sample(params_n, nn, wos, jax.random.key(0))
    frac_down = float(jnp.mean(wi[:, 2] < 0))
    assert 0.1 < frac_down < 0.6
    # pdf positive for sampled directions.
    assert float(jnp.min(pdf)) > 0


def test_transmission_energy_through_thin_sheet():
    """A backlit translucent sheet glows: the point light sits BEHIND the
    sheet relative to the camera, so all visible energy arrives through the
    thin-transmission lobe (transmission-side NEE)."""
    verts = jnp.array(
        [[-3, -3, -1], [3, -3, -1], [3, 3, -1], [-3, 3, -1]], jnp.float32
    )
    faces = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)

    def scene_with(spec_trans):
        geo = Geometry(
            vertices=verts, faces=faces,
            face_mat=jnp.zeros(2, jnp.int32),
            face_mesh=jnp.zeros(2, jnp.int32),
        )
        mats = Materials.default(1).replace(
            base_color=jnp.asarray([[0.9, 0.9, 0.9]], jnp.float32),
            specular=jnp.zeros((1,)),
            roughness=jnp.ones((1,)),
            spec_trans=jnp.asarray([spec_trans]),
            thin=jnp.ones((1,)),
        )
        lw = np.eye(4, dtype=np.float32)
        lw[:3, 3] = [0, 0, -3.0]  # behind the sheet (camera side is +z)
        lights = Lights(
            kinds=jnp.zeros(1, jnp.int32),
            to_world=jnp.asarray(lw)[None],
            intensity=jnp.full((1, 3), 10.0, jnp.float32),
            cutoff_cos=jnp.zeros(1), beam_cos=jnp.ones(1),
            active=jnp.ones(1, bool),
        )
        cam = Camera.create(jnp.eye(4), fov=30.0)
        return RenderScene(geometry=geo, materials=mats, lights=lights, camera=cam)

    cfg = RenderConfig(width=8, height=8, spp=16, max_bounces=1, tri_chunk=16)
    opaque = float(jnp.mean(render_rgb(scene_with(0.0), jax.random.key(0), cfg)))
    translucent = float(jnp.mean(render_rgb(scene_with(0.9), jax.random.key(0), cfg)))
    assert opaque == pytest.approx(0.0, abs=1e-5)  # backlit opaque sheet: dark
    # Analytic: f_trans * I * cos / d^2 at sheet center (d=2, cos=1).
    expected = np.sqrt(0.9) / np.pi * 0.9 * 10.0 / 4.0
    center_scene = scene_with(0.9)
    img = render_rgb(center_scene, jax.random.key(1), cfg)
    assert float(img[4, 4, 0]) == pytest.approx(expected, rel=0.1)
    assert translucent > 0.1

"""Physical-correctness tests for the path tracer and BSDF.

These are the golden/parity harness the reference lacks (SURVEY.md §4):
analytic scenes with closed-form answers, energy-conservation (furnace-style)
bounds, Monte-Carlo estimator consistency.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fireflies_tpu.render import RenderConfig, render_rgb
from fireflies_tpu.render import bsdf as bsdf_mod
from fireflies_tpu.render.types import Camera, Geometry, Lights, Materials, RenderScene


def _quad_scene(albedo=0.6, intensity=4.0, light_pos=(0.0, 0.0, 0.0), z=-2.0, **mat):
    verts = jnp.array(
        [[-30, -30, z], [30, -30, z], [30, 30, z], [-30, 30, z]], jnp.float32
    )
    faces = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
    geo = Geometry(
        vertices=verts,
        faces=faces,
        face_mat=jnp.zeros(2, jnp.int32),
        face_mesh=jnp.zeros(2, jnp.int32),
    )
    defaults = dict(
        base_color=jnp.full((1, 3), albedo, jnp.float32),
        specular=jnp.zeros((1,)),
        roughness=jnp.ones((1,)),
    )
    defaults.update({k: jnp.full((1,) + np.shape(v)[1:], v) if not hasattr(v, "shape") else v for k, v in mat.items()})
    mats = Materials.default(1).replace(**defaults)
    lw = np.eye(4, dtype=np.float32)
    lw[:3, 3] = light_pos
    lights = Lights(
        kinds=jnp.zeros(1, jnp.int32),
        to_world=jnp.asarray(lw)[None],
        intensity=jnp.full((1, 3), intensity, jnp.float32),
        cutoff_cos=jnp.zeros(1),
        beam_cos=jnp.ones(1),
        active=jnp.ones(1, bool),
    )
    cam = Camera.create(jnp.eye(4), fov=45.0)
    return RenderScene(geometry=geo, materials=mats, lights=lights, camera=cam)


def test_inverse_square_falloff():
    """Center-pixel radiance must scale with 1/r^2 of the quad distance."""
    cfg = RenderConfig(width=8, height=8, spp=4, max_bounces=1, tri_chunk=16)
    l2 = float(render_rgb(_quad_scene(z=-2.0), jax.random.key(0), cfg)[4, 4, 0])
    l4 = float(render_rgb(_quad_scene(z=-4.0), jax.random.key(0), cfg)[4, 4, 0])
    assert l2 / l4 == pytest.approx(4.0, rel=0.05)


def test_cosine_falloff_off_axis():
    """Oblique incidence dims by cos(theta) * 1/r^2 (point light geometry)."""
    cfg = RenderConfig(width=64, height=64, spp=8, max_bounces=1, tri_chunk=16)
    img = render_rgb(_quad_scene(z=-2.0), jax.random.key(0), cfg)
    center = float(img[32, 32, 0])
    # Pixel at NDC x=0.5 -> surface point (x = 2*tan(22.5)*0.5, 0, -2).
    x = 2.0 * np.tan(np.deg2rad(22.5)) * (48.5 / 32 - 1.0)
    r2 = x * x + 4.0
    cos_theta = 2.0 / np.sqrt(r2)
    expected_ratio = (4.0 / r2) * cos_theta
    measured_ratio = float(img[32, 48, 0]) / center
    assert measured_ratio == pytest.approx(expected_ratio, rel=0.08)


def test_energy_conservation_bound():
    """A white-furnace-ish bound: total reflected radiance from a fully
    diffuse albedo-1 surface never exceeds the incident radiance."""
    cfg = RenderConfig(width=8, height=8, spp=16, max_bounces=3, tri_chunk=16)
    scene = _quad_scene(albedo=1.0, intensity=4.0)
    img = render_rgb(scene, jax.random.key(0), cfg)
    # Incident at center: I/r^2 = 1.0; Lambertian exitance bound: rho/pi * E.
    assert float(img[4, 4, 0]) <= 1.0 / np.pi * 1.0 * 1.35  # slack for retro term


def test_spp_consistency():
    """MC estimator converges: high-spp renders agree across keys."""
    cfg = RenderConfig(width=8, height=8, spp=32, max_bounces=2, tri_chunk=16)
    scene = _quad_scene()
    a = render_rgb(scene, jax.random.key(1), cfg)
    b = render_rgb(scene, jax.random.key(2), cfg)
    rel = float(jnp.mean(jnp.abs(a - b)) / (jnp.mean(a) + 1e-9))
    assert rel < 0.1


def test_bsdf_reciprocity():
    """f(wo, wi) == f(wi, wo) for the principled lobes we implement."""
    mats = Materials.default(1).replace(
        roughness=jnp.asarray([0.4]),
        metallic=jnp.asarray([0.3]),
        clearcoat=jnp.asarray([0.5]),
        sheen=jnp.asarray([0.4]),
    )
    params = bsdf_mod.gather_params(mats, jnp.zeros(1, jnp.int32))
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    wo = jnp.asarray([[0.3, 0.1, 0.8]])
    wo = wo / jnp.linalg.norm(wo)
    wi = jnp.asarray([[-0.4, 0.2, 0.6]])
    wi = wi / jnp.linalg.norm(wi)
    f1 = bsdf_mod.evaluate(params, n, wo, wi)
    f2 = bsdf_mod.evaluate(params, n, wi, wo)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-4)


def test_bsdf_sampling_consistency():
    """Importance sampling integrates the BSDF: E[f cos / pdf] ~ directional
    albedo, cross-checked against uniform-hemisphere integration."""
    mats = Materials.default(1).replace(
        roughness=jnp.asarray([0.5]), metallic=jnp.asarray([0.2])
    )
    params_one = bsdf_mod.gather_params(mats, jnp.zeros(1, jnp.int32))
    n_samples = 8192
    params = jax.tree.map(lambda x: jnp.repeat(x, n_samples, axis=0), params_one)
    n = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n_samples, 1))
    wo = jnp.tile(jnp.asarray([[0.4, 0.0, 0.9165151]]), (n_samples, 1))

    # Importance-sampled estimate.
    wi, pdf, f = bsdf_mod.sample(params, n, wo, jax.random.key(0))
    cos_i = jnp.maximum(wi[:, 2], 0.0)
    w = jnp.where(pdf > 1e-6, cos_i / jnp.maximum(pdf, 1e-6), 0.0)
    est_is = jnp.mean(f[:, 0] * w)

    # Uniform-hemisphere reference.
    key = jax.random.key(1)
    u = jax.random.uniform(key, (n_samples, 2))
    cos_t = u[:, 0]
    sin_t = jnp.sqrt(1 - cos_t**2)
    phi = 2 * jnp.pi * u[:, 1]
    wi_u = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], -1)
    f_u = bsdf_mod.evaluate(params, n, wo, wi_u)
    est_ref = jnp.mean(f_u[:, 0] * cos_t) * 2 * jnp.pi

    assert float(est_is) == pytest.approx(float(est_ref), rel=0.1)


def test_pdf_normalizes():
    """The sampling pdf integrates to ~1 over the hemisphere."""
    mats = Materials.default(1).replace(roughness=jnp.asarray([0.6]))
    n_samples = 16384
    params_one = bsdf_mod.gather_params(mats, jnp.zeros(1, jnp.int32))
    params = jax.tree.map(lambda x: jnp.repeat(x, n_samples, axis=0), params_one)
    n = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n_samples, 1))
    wo = jnp.tile(jnp.asarray([[0.2, -0.3, 0.9327379]]), (n_samples, 1))
    u = jax.random.uniform(jax.random.key(2), (n_samples, 2))
    cos_t = u[:, 0]
    sin_t = jnp.sqrt(1 - cos_t**2)
    phi = 2 * jnp.pi * u[:, 1]
    wi_u = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], -1)
    pdf = bsdf_mod.pdf_fn(params, n, wo, wi_u)
    integral = float(jnp.mean(pdf) * 2 * jnp.pi)
    assert integral == pytest.approx(1.0, rel=0.1)


def test_indirect_color_bleed():
    """Cornell-style GI: a red wall bleeds color onto a grey box side at
    bounce 2 — validates the indirect BSDF-sampled path."""
    from fireflies_tpu.assets import scenes as ff_scenes
    from fireflies_tpu.render import SceneBridge

    scene, kwargs = ff_scenes.cornell_like()
    bridge = SceneBridge(scene, **kwargs)
    params = scene.compile()(jax.random.key(0), 0)
    rs = bridge.assemble(params)
    cfg1 = RenderConfig(width=48, height=48, spp=8, max_bounces=1, tri_chunk=64)
    cfg3 = RenderConfig(width=48, height=48, spp=8, max_bounces=3, tri_chunk=64)
    direct = render_rgb(rs, jax.random.key(1), cfg1)
    gi = render_rgb(rs, jax.random.key(1), cfg3)
    # Indirect light adds energy overall.
    assert float(jnp.mean(gi)) > float(jnp.mean(direct)) * 1.05
    # Pixels near the red wall gain more red than blue from the bleed.
    left = gi[:, 2:8] - direct[:, 2:8]
    assert float(jnp.mean(left[..., 0])) > float(jnp.mean(left[..., 2]))


def test_anisotropic_ggx():
    """Anisotropy elongates the specular lobe along the bitangent (alpha_y
    grows): f drops slower for wi tilted along y than along x, and
    anisotropic=0 matches the isotropic formulas exactly."""
    def f_at(aniso, direction):
        mats = Materials.default(1).replace(
            roughness=jnp.asarray([0.3]),
            metallic=jnp.asarray([1.0]),
            anisotropic=jnp.asarray([aniso]),
        )
        params = bsdf_mod.gather_params(mats, jnp.zeros(1, jnp.int32))
        n = jnp.asarray([[0.0, 0.0, 1.0]])
        tangent = jnp.asarray([[1.0, 0.0, 0.0]])
        wo = jnp.asarray([[0.0, 0.0, 1.0]])
        wi = jnp.asarray([direction], jnp.float32)
        wi = wi / jnp.linalg.norm(wi)
        return float(bsdf_mod.evaluate(params, n, wo, wi, tangent=tangent)[0, 0])

    tilt_x = [0.35, 0.0, 0.94]
    tilt_y = [0.0, 0.35, 0.94]
    # Isotropic: symmetric.
    assert f_at(0.0, tilt_x) == pytest.approx(f_at(0.0, tilt_y), rel=1e-4)
    # Anisotropic (ax > ay): rougher along the tangent -> the lobe is WIDER
    # for tilts along x than along y.
    fx = f_at(0.9, tilt_x)
    fy = f_at(0.9, tilt_y)
    assert fx > 2.0 * fy

    # Sampling consistency still holds with anisotropy.
    mats = Materials.default(1).replace(
        roughness=jnp.asarray([0.4]), anisotropic=jnp.asarray([0.8])
    )
    n_s = 8192
    params = jax.tree.map(
        lambda x: jnp.repeat(x, n_s, axis=0),
        bsdf_mod.gather_params(mats, jnp.zeros(1, jnp.int32)),
    )
    n = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n_s, 1))
    tang = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (n_s, 1))
    wo = jnp.tile(jnp.asarray([[0.3, 0.1, 0.9486833]]), (n_s, 1))
    wi, pdf, f = bsdf_mod.sample(params, n, wo, jax.random.key(0), tangent=tang)
    cos_i = jnp.maximum(wi[:, 2], 0.0)
    est_is = jnp.mean(jnp.where(pdf > 1e-6, f[:, 0] * cos_i / jnp.maximum(pdf, 1e-6), 0.0))
    u = jax.random.uniform(jax.random.key(1), (n_s, 2))
    ct = u[:, 0]; st = jnp.sqrt(1 - ct**2); ph = 2 * jnp.pi * u[:, 1]
    wi_u = jnp.stack([st * jnp.cos(ph), st * jnp.sin(ph), ct], -1)
    f_u = bsdf_mod.evaluate(params, n, wo, wi_u, tangent=tang)
    est_ref = jnp.mean(f_u[:, 0] * ct) * 2 * jnp.pi
    assert float(est_is) == pytest.approx(float(est_ref), rel=0.15)

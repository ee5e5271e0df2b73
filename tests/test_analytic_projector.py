"""Analytic beam-splat projector (Projector beam mode).

The texture route rasterizes the laser pattern onto a grid
(rays_to_texture_rgb -> params["tex.data"]) and the emitter bilinearly
samples it at every NEE vertex; beam mode evaluates the same continuous
splat field exp(-((d_px^2)/sigma)^2) (graphics/rasterization falloff,
reference raster.py:31-35) analytically from the (K, 2) projector-NDC beam
coordinates.  These tests pin value parity against the texture route (up to
its rasterization/bilinear discretization) and that pattern gradients flow
to the beam coordinates.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fireflies_tpu.assets import scenes as ff_scenes
from fireflies_tpu.projection import laser as laser_mod
from fireflies_tpu.render import RenderConfig, SceneBridge, render_rgb
from fireflies_tpu.render import lights as lights_mod
from fireflies_tpu.render.types import Projector
from fireflies_tpu.render.vec3 import from_array

FOV = 30.0


def _pattern_rays():
    return laser_mod.generate_uniform_rays(0.0275, 4, 4)  # 16 beams


def _projector(texture=None, beams=None, hw=(512, 512), sigma=40.0):
    to_world = np.eye(4, dtype=np.float32)
    to_world[2, 3] = 2.0  # looks down -Z from z=2
    return Projector.create(
        to_world,
        texture=texture,
        fov=FOV,
        scale=1.0,
        beams_ndc=beams,
        beam_sigma=sigma,
        beam_color=(0.0, 1.0, 0.0),
        beam_hw=hw,
    )


def test_analytic_matches_texture_route():
    rays = _pattern_rays()
    hw, sigma = (512, 512), 40.0
    tex = laser_mod.rays_to_texture_rgb(
        rays, FOV, sigma=sigma, texture_size=hw, blur_kernel=0
    )
    proj_tex = _projector(texture=tex)
    proj_ana = _projector(beams=laser_mod.directions_to_ndc(rays, FOV),
                          hw=hw, sigma=sigma)

    # Probe points on the z=0 plane inside the projector frustum.
    xs = np.linspace(-0.4, 0.4, 31, dtype=np.float32)
    ys = np.linspace(-0.4, 0.4, 29, dtype=np.float32)
    gx, gy = np.meshgrid(xs, ys)
    p = np.stack([gx, gy, np.zeros_like(gx)], -1).reshape(-1, 3)

    _, _, rad_tex = lights_mod.eval_projector(proj_tex, jnp.asarray(p))
    _, _, rad_ana = lights_mod.eval_projector(proj_ana, jnp.asarray(p))
    rad_tex = np.asarray(rad_tex)
    rad_ana = np.asarray(rad_ana)
    # Bilinear sampling of a 512^2 rasterization is a close but not exact
    # stand-in for the continuous field (the analytic value is the ground
    # truth): a few texels at splat peaks deviate by several %, the bulk is
    # tight.
    peak = rad_tex.max()
    assert peak > 0
    diff = np.abs(rad_ana - rad_tex)
    assert diff.max() < 0.08 * peak
    assert diff.mean() < 0.005 * peak
    # Component form agrees with the array form.
    _, _, rad_v = lights_mod.eval_projector_v(proj_ana, from_array(jnp.asarray(p)))
    np.testing.assert_allclose(np.asarray(rad_v.to_array()), rad_ana, atol=1e-6)


def test_render_parity_and_beam_gradients():
    scene, kw = ff_scenes.vocalfold(resolution=8, n_anim_frames=2)
    bridge = SceneBridge(scene, **kw)
    randomize = scene.compile()
    cfg = RenderConfig(width=48, height=48, spp=1, max_bounces=2, tri_chunk=64)
    rays = _pattern_rays()
    key = jax.random.key(0)
    base = dict(randomize(key, 0))

    # Texture route (fine grid so discretization is small).
    p_tex = dict(base)
    p_tex["tex.data"] = laser_mod.rays_to_texture_rgb(
        rays, 30.0, sigma=10.0, texture_size=(512, 512), blur_kernel=0
    )
    img_tex = render_rgb(bridge.assemble(p_tex), key, cfg)

    # Analytic route, same pattern/metric.
    p_ana = dict(base)
    p_ana.update(
        laser_mod.rays_to_beam_params(
            rays, 30.0, sigma=10.0, texture_size=(512, 512)
        )
    )
    img_ana = render_rgb(bridge.assemble(p_ana), key, cfg)

    t = np.asarray(img_tex)
    a = np.asarray(img_ana)
    assert t.max() > 0
    diff = np.abs(a - t)
    # Rasterization under-resolves the sqrt(sigma)~3px splat peaks; a couple
    # of highlight pixels deviate by several %, the image as a whole is tight.
    assert diff.max() < 0.08 * t.max()
    assert diff.mean() < 0.005 * t.max()

    # Pattern gradients flow to the beam coordinates (the north-star
    # pattern-optimization loop differentiates exactly this).
    def loss(beams_ndc):
        p = dict(base)
        p.update(
            laser_mod.rays_to_beam_params(
                rays, 30.0, sigma=10.0, texture_size=(512, 512)
            )
        )
        p["tex.beams"] = beams_ndc
        return jnp.mean(render_rgb(bridge.assemble(p), key, cfg))

    g = jax.grad(loss)(laser_mod.directions_to_ndc(rays, 30.0))
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 0


def test_pattern_optimization_with_analytic_projector():
    """optimize_pattern_through_render drives beam directions through the
    analytic projector (pattern_params_fn route) — loss finite, beams move,
    stay unit."""
    from fireflies_tpu import optim

    scene, kw = ff_scenes.vocalfold(resolution=8, n_anim_frames=2)
    bridge = SceneBridge(scene, **kw)
    randomize = scene.compile()
    cfg = RenderConfig(width=32, height=32, spp=1, max_bounces=2, tri_chunk=64)
    rays0 = _pattern_rays()

    loss_fn = optim.make_variant_loss(
        randomize,
        bridge.assemble,
        lambda sc, k: render_rgb(sc, k, cfg),
        optim.dot_coverage_objective(),
        pattern_params_fn=lambda r: laser_mod.rays_to_beam_params(
            r, 30.0, sigma=10.0, texture_size=(256, 256)
        ),
    )
    res = optim.optimize_pattern_through_render(
        loss_fn, rays0, jax.random.key(3), steps=2, batch=2,
        learning_rate=1e-2,
    )
    assert np.all(np.isfinite(np.asarray(res.losses)))
    moved = np.abs(np.asarray(res.rays) - np.asarray(rays0)).max()
    assert moved > 0
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(res.rays), axis=-1), 1.0, atol=1e-5
    )

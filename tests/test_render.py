import numpy as np
import jax
import jax.numpy as jnp
import pytest

import fireflies_tpu as ff
from fireflies_tpu.assets import scenes as ff_scenes
from fireflies_tpu.render import (
    RenderConfig,
    SceneBridge,
    render_depth,
    render_depth_differentiable,
    render_rgb,
    render_segmentation,
)
from fireflies_tpu.render.types import Camera, Geometry, Lights, Materials, RenderScene
from fireflies_tpu.utils import math as ffmath

CFG = RenderConfig(width=32, height=32, spp=2, max_bounces=2, tri_chunk=64)


def _facing_quad_scene(z=-2.0, light_pos=(0.0, 0.0, 0.0), intensity=4.0, albedo=0.6):
    """Camera at origin looking down -Z at a large quad; point light."""
    verts = jnp.array(
        [[-10, -10, z], [10, -10, z], [10, 10, z], [-10, 10, z]], jnp.float32
    )
    faces = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
    geo = Geometry(
        vertices=verts,
        faces=faces,
        face_mat=jnp.zeros(2, jnp.int32),
        face_mesh=jnp.zeros(2, jnp.int32),
    )
    mats = Materials.default(1).replace(
        base_color=jnp.full((1, 3), albedo, jnp.float32),
        specular=jnp.zeros((1,)),  # pure-diffuse analytic check
        roughness=jnp.ones((1,)),
    )
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


def test_depth_center_pixel():
    scene = _facing_quad_scene(z=-2.0)
    depth = render_depth(scene, CFG)
    # Center ray is perpendicular -> depth 2; corners are longer.
    assert float(depth[16, 16]) == pytest.approx(2.0, abs=0.01)
    assert float(depth[0, 0]) > 2.0
    assert float(depth.min()) > 0.0  # quad covers the whole view


def test_depth_miss_is_zero():
    scene = _facing_quad_scene(z=+2.0)  # behind the camera
    depth = render_depth(scene, CFG)
    assert float(jnp.abs(depth).max()) == 0.0


def test_segmentation_ids():
    scene, kwargs = ff_scenes.hello_world(randomize_rotation=False)
    bridge = SceneBridge(scene, **kwargs)
    params = scene.compile()(jax.random.key(0), 0)
    rs = bridge.assemble(params)
    seg = render_segmentation(rs, CFG)
    vals = set(np.unique(np.asarray(seg)).tolist())
    assert vals == {0, 1}  # background + the cube


def test_rgb_analytic_point_light():
    # Lambertian quad, light co-located with camera: L = albedo/pi * I / r^2
    # at the center pixel (cos=1, r=2).
    albedo, intensity = 0.6, 4.0
    scene = _facing_quad_scene(z=-2.0, intensity=intensity, albedo=albedo)
    cfg = RenderConfig(width=16, height=16, spp=8, max_bounces=1, tri_chunk=64)
    img = render_rgb(scene, jax.random.key(0), cfg)
    expected = albedo / np.pi * intensity / 4.0
    # Burley diffuse at normal incidence ~ Lambert (retro term small).
    assert float(img[8, 8, 0]) == pytest.approx(expected, rel=0.15)
    assert float(jnp.abs(img[8, 8, 0] - img[8, 8, 1])) < 1e-6  # grey


def test_rgb_shadowing():
    # An occluder on the light->quad-center segment (off the camera axis)
    # must shadow the center pixel while leaving off-center pixels lit.
    z = -2.0
    verts = jnp.array(
        [
            [-10, -10, z], [10, -10, z], [10, 10, z], [-10, 10, z],  # big quad
            [-0.3, 0.7, -1.5], [0.3, 0.7, -1.5], [0.0, 1.3, -1.5],  # occluder
        ],
        jnp.float32,
    )
    faces = jnp.array([[0, 1, 2], [0, 2, 3], [4, 5, 6]], jnp.int32)
    geo = Geometry(
        vertices=verts,
        faces=faces,
        face_mat=jnp.zeros(3, jnp.int32),
        face_mesh=jnp.asarray([0, 0, 1], jnp.int32),
    )
    base = _facing_quad_scene(z=z, light_pos=(0.0, 2.0, -1.0))
    scene = base.replace(geometry=geo)
    cfg = RenderConfig(width=32, height=32, spp=4, max_bounces=1, tri_chunk=64)
    img = render_rgb(scene, jax.random.key(0), cfg)
    center = float(img[16, 16, 0])  # shadowed quad point
    side = float(img[16, 28, 0])  # lit quad point
    assert center < 0.25 * side


def test_render_hello_world_end_to_end():
    scene, kwargs = ff_scenes.hello_world()
    bridge = SceneBridge(scene, **kwargs)
    randomize = scene.compile()

    def render_variant(key):
        params = randomize(key, 0)
        return render_rgb(bridge.assemble(params), key, CFG)

    img = jax.jit(render_variant)(jax.random.key(1))
    assert img.shape == (32, 32, 3)
    assert float(img.max()) > 0.01  # something is lit
    assert bool(jnp.all(jnp.isfinite(img)))

    # vmapped variants differ (rotation randomized).
    imgs = jax.vmap(render_variant)(jax.random.split(jax.random.key(0), 3))
    assert float(jnp.std(imgs.mean(axis=(1, 2, 3)))) >= 0.0


def test_depth_gradient_wrt_scene():
    scene = _facing_quad_scene(z=-2.0)

    def mean_depth(dz):
        moved = scene.replace(
            geometry=scene.geometry.replace(
                vertices=scene.geometry.vertices + jnp.array([0.0, 0.0, -1.0]) * dz
            )
        )
        cfg = RenderConfig(width=8, height=8, spp=1, max_bounces=1, tri_chunk=64)
        return jnp.mean(render_depth_differentiable(moved, cfg))

    g = jax.grad(mean_depth)(0.0)
    # Moving the quad away increases depth: gradient ~ +1 (cos-scaled >= 1).
    assert 0.9 < float(g) < 1.3


def test_rgb_gradient_wrt_light_intensity():
    scene = _facing_quad_scene(z=-2.0)

    def brightness(scale):
        s = scene.replace(
            lights=scene.lights.replace(intensity=scene.lights.intensity * scale)
        )
        cfg = RenderConfig(width=8, height=8, spp=2, max_bounces=1, tri_chunk=64)
        return jnp.mean(render_rgb(s, jax.random.key(0), cfg))

    g = jax.grad(brightness)(1.0)
    assert float(g) > 0.0
    # Radiance is linear in intensity: f(2) = 2 f(1).
    assert float(brightness(2.0)) == pytest.approx(2 * float(brightness(1.0)), rel=1e-4)


def test_vocalfold_scene_builds_and_renders():
    scene, kwargs = ff_scenes.vocalfold(resolution=8, n_anim_frames=2)
    bridge = SceneBridge(scene, **kwargs)
    params = scene.compile()(jax.random.key(0), 0)
    rs = bridge.assemble(params)
    cfg = RenderConfig(width=24, height=24, spp=1, max_bounces=1, tri_chunk=128)
    depth = render_depth(rs, cfg)
    assert float((depth > 0).mean()) > 0.9  # folds+tube fill the view
    img = render_rgb(rs, jax.random.key(0), cfg)
    assert bool(jnp.all(jnp.isfinite(img))) and float(img.max()) > 0.0


def test_ray_chunk_path_matches_unchunked():
    scene = _facing_quad_scene(z=-2.0)
    cfg_a = RenderConfig(width=16, height=16, spp=2, max_bounces=2, tri_chunk=64)
    cfg_b = cfg_a.replace(ray_chunk=64)
    a = render_rgb(scene, jax.random.key(3), cfg_a)
    b = render_rgb(scene, jax.random.key(3), cfg_b)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_randomized_sweep_no_nans():
    """64 random vocalfold variants: every AOV finite (debug-nans sweep)."""
    scene, kwargs = ff_scenes.vocalfold(resolution=8, n_anim_frames=2)
    scene.mesh("mesh-Vocalfold").scale_x(0.5, 2.0)
    scene.material("mat-Mucosa").add_float_key("roughness", 0.0, 1.0)
    scene.material("mat-Mucosa").add_float_key("spec_trans", 0.0, 0.4)
    scene.material("mat-Mucosa").add_float_key("anisotropic", 0.0, 1.0)
    bridge = SceneBridge(scene, **kwargs)
    randomize = scene.compile()
    cfg = RenderConfig(width=12, height=12, spp=1, max_bounces=2, tri_chunk=128)

    def one(k):
        rs = bridge.assemble(randomize(k, 0))
        return render_rgb(rs, k, cfg)

    imgs = jax.vmap(one)(jax.random.split(jax.random.key(0), 64))
    assert bool(jnp.all(jnp.isfinite(imgs)))


def test_render_from_laser():
    """Structured-light sparse depth: beams hit the quad; camera sees dots."""
    from fireflies_tpu.render import render_from_laser
    from fireflies_tpu.projection import laser as laser_mod

    scene = _facing_quad_scene(z=-2.0)
    rays_local = laser_mod.generate_uniform_rays_by_count(3, 3, 30.0)
    origins = jnp.zeros((9, 3)) + jnp.asarray([0.3, 0.0, 0.0])  # offset projector
    cfg = RenderConfig(width=32, height=32, tri_chunk=16)
    ndc, depth, valid, image = render_from_laser(scene, origins, rays_local, cfg, sigma=1.0)
    assert bool(jnp.all(valid))  # all beams land on the big quad in view
    np.testing.assert_allclose(np.asarray(depth), 2.0, atol=0.1)  # view depth ~2
    assert float(image.max()) > 1.0  # depth-weighted splats present
    # Differentiable wrt beam directions.
    g = jax.grad(
        lambda r: jnp.sum(render_from_laser(scene, origins, r, cfg, sigma=1.0)[3])
    )(rays_local)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_randomized_perlin_base_color_texture():
    """The reference's production texture-randomization flow (main.py:132-136):
    a NoiseTextureLerpSampler on 'brdf_0.base_color.data' drives the mucosa
    albedo texture each randomize step, end to end through the renderer."""
    from fireflies_tpu import sampling

    scene, kwargs = ff_scenes.vocalfold(resolution=8, n_anim_frames=2)
    mat = scene.material("mat-Mucosa")
    mat.add_vec3_sampler(
        "brdf_0.base_color.data",
        sampling.NoiseTextureLerpSampler.create(
            color_a=[1.0, 0.0, 0.0], color_b=[0.9, 0.1, 0.0],  # red family
            texture_shape=(32, 32),
        ),
    )
    bridge = SceneBridge(scene, **kwargs)
    randomize = scene.compile()
    params = randomize(jax.random.key(0), 0)
    # Texture emitted under the user's key; base_color field NOT clobbered.
    tex_keys = [k for k in params if k.endswith("base_color.data")]
    assert tex_keys and params[tex_keys[0]].shape == (3, 32, 32)
    assert params["mat-Mucosa.base_color"].shape == (3,)

    rs = bridge.assemble(params)
    assert rs.materials.textures is not None
    assert bool(rs.materials.has_texture[0])
    cfg = RenderConfig(width=24, height=24, spp=2, max_bounces=1, tri_chunk=128)
    img = render_rgb(rs, jax.random.key(0), cfg)
    # Red-family texture dominates the fold pixels.
    assert float(img[..., 0].mean()) > 2.0 * float(img[..., 2].mean())
    # Different keys give different textures -> different images.
    img2 = render_rgb(
        bridge.assemble(randomize(jax.random.key(3), 0)), jax.random.key(0), cfg
    )
    assert float(jnp.abs(img - img2).max()) > 1e-3


def test_tiled_ray_order_roundtrip():
    """Arithmetic tile-major ray order must equal the permutation path, and
    unpermute_rows must invert it exactly (it replaces per-row-bound gathers
    with a reshape/transpose on evenly-tiled films)."""
    import numpy as np

    from fireflies_tpu.render.rays import (
        _tile_permutation,
        camera_rays,
        camera_rays_tiled,
        unpermute_rows,
    )
    from fireflies_tpu.render.types import Camera

    cam = Camera(
        to_world=jnp.eye(4), fov=60.0, near=0.01, far=100.0
    )
    w, h = 256, 32  # divides (128, 16) exactly -> arithmetic path
    o, d, inv = camera_rays_tiled(cam, w, h)
    assert inv is None
    o_ref, d_ref = camera_rays(cam, w, h)
    perm, _ = _tile_permutation(w, h, 128, 16)
    np.testing.assert_allclose(
        np.asarray(d), np.asarray(d_ref)[perm], atol=1e-6
    )
    # roundtrip: unpermute recovers row-major
    np.testing.assert_allclose(
        np.asarray(unpermute_rows(d, None, w, h)), np.asarray(d_ref), atol=1e-6
    )
    # odd size -> permutation fallback, x[inv] roundtrip
    o2, d2, inv2 = camera_rays_tiled(cam, 96, 24)
    assert inv2 is not None
    o2_ref, d2_ref = camera_rays(cam, 96, 24)
    np.testing.assert_allclose(
        np.asarray(unpermute_rows(d2, inv2, 96, 24)), np.asarray(d2_ref),
        atol=1e-6,
    )

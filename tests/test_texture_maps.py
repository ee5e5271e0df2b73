"""Roughness and normal texture maps (Mitsuba: textured `roughness` on the
principled BSDF; `normalmap` BSDF wrapper — reference scenes attach these the
same way as base_color textures, main.py:127-136)."""

import numpy as np
import jax
import jax.numpy as jnp

from fireflies_tpu.render import RenderConfig
from fireflies_tpu.render.pathtracer import render_rgb
from fireflies_tpu.render.types import (
    LIGHT_POINT,
    Camera,
    Geometry,
    Lights,
    Materials,
    RenderScene,
)


def _quad_scene(materials, light_pos=(0.0, 0.0, 0.0)):
    """Unit quad at z=-2 facing the camera, with UVs spanning [0,1]^2."""
    verts = jnp.array(
        [[-1, -1, -2], [1, -1, -2], [1, 1, -2], [-1, 1, -2]], jnp.float32
    )
    faces = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
    uvs = jnp.array([[0, 0], [1, 0], [1, 1], [0, 1]], jnp.float32)
    geo = Geometry(
        vertices=verts,
        faces=faces,
        face_mat=jnp.zeros(2, jnp.int32),
        face_mesh=jnp.zeros(2, jnp.int32),
        uvs=uvs,
    )
    to_world = jnp.eye(4).at[:3, 3].set(jnp.asarray(light_pos, jnp.float32))
    lights = Lights(
        kinds=jnp.asarray([LIGHT_POINT], jnp.int32),
        to_world=to_world[None],
        intensity=jnp.full((1, 3), 10.0),
        cutoff_cos=jnp.zeros((1,)),
        beam_cos=jnp.zeros((1,)),
        active=jnp.ones((1,), bool),
    )
    return RenderScene(
        geometry=geo,
        materials=materials,
        lights=lights,
        camera=Camera.create(jnp.eye(4), fov=60.0),
    )


CFG = RenderConfig(width=48, height=48, spp=1, max_bounces=1, tri_chunk=16)


def _render(scene):
    return np.asarray(render_rgb(scene, jax.random.key(0), CFG))


def test_constant_roughness_map_matches_scalar():
    base = Materials.default(1).replace(roughness=jnp.asarray([0.2]))
    img_scalar = _render(_quad_scene(base))
    mapped = base.replace(
        roughness=jnp.asarray([0.77]),  # should be overridden by the map
        roughness_tex=jnp.full((1, 8, 8, 1), 0.2),
        has_roughness_tex=jnp.asarray([True]),
    )
    img_map = _render(_quad_scene(mapped))
    np.testing.assert_allclose(img_map, img_scalar, atol=1e-6)


def test_roughness_map_halves_differ():
    """Left half mirror-ish, right half rough: the specular response must
    differ across the u=0.5 texture seam while a flat map stays uniform."""
    tex = np.full((8, 8, 1), 0.9, np.float32)
    tex[:, :4, 0] = 0.05  # u < 0.5 -> glossy
    mats = Materials.default(1).replace(
        metallic=jnp.asarray([1.0]),
        roughness_tex=jnp.asarray(tex)[None],
        has_roughness_tex=jnp.asarray([True]),
    )
    # Light near the camera: the mirror half reflects it away from the
    # sensor (dark), the rough half scatters back (bright).
    img = _render(_quad_scene(mats, light_pos=(0.0, 0.0, -0.2)))
    left = img[:, :20].mean()
    right = img[:, 28:].mean()
    assert right > left * 1.5, (left, right)


def test_flat_normal_map_is_identity():
    base = Materials.default(1)
    img_plain = _render(_quad_scene(base, light_pos=(2.0, 0.0, -0.5)))
    flat = base.replace(
        normal_tex=jnp.full((1, 8, 8, 3), 0.5).at[..., 2].set(1.0),
        has_normal_tex=jnp.asarray([True]),
    )
    img_flat = _render(_quad_scene(flat, light_pos=(2.0, 0.0, -0.5)))
    np.testing.assert_allclose(img_flat, img_plain, atol=1e-5)


def test_normal_map_tilts_shading():
    """Tilting normals toward an off-axis light brightens the diffuse
    response; tilting away darkens it.  n = 2 rgb - 1 with tangent +u."""

    def tilted(tx):
        n = np.array([tx, 0.0, np.sqrt(1.0 - tx * tx)], np.float32)
        rgb = (n + 1.0) / 2.0
        tex = np.broadcast_to(rgb, (8, 8, 3)).copy()
        return Materials.default(1).replace(
            normal_tex=jnp.asarray(tex)[None],
            has_normal_tex=jnp.asarray([True]),
        )

    light = (3.0, 0.0, -0.5)  # off to the +x side, in front of the quad
    img_flat = _render(_quad_scene(tilted(0.0), light_pos=light))
    img_toward = _render(_quad_scene(tilted(0.6), light_pos=light))
    img_away = _render(_quad_scene(tilted(-0.6), light_pos=light))
    center = (slice(16, 32), slice(16, 32))
    assert img_toward[center].mean() > img_flat[center].mean() * 1.2
    assert img_away[center].mean() < img_flat[center].mean() * 0.8


def test_bridge_stacks_maps_and_param_override():
    """SceneBridge: static maps from Material entities + per-step override
    via Mitsuba-style '<mat>.roughness.data' params."""
    import fireflies_tpu as ff
    from fireflies_tpu.assets import procedural
    from fireflies_tpu.render import SceneBridge

    scene = ff.Scene()
    verts, faces, uvs = procedural.make_plane(1.0, 1)
    scene.add_mesh(ff.Mesh("m", verts, faces, uvs=uvs), material="mat0")
    mat = ff.Material("mat0", base_color=(0.6, 0.6, 0.6))
    mat.set_roughness_texture(np.full((4, 4), 0.3, np.float32))
    mat.set_normal_texture(np.full((4, 4, 3), 0.5, np.float32))
    scene.add_material(mat)
    cam = ff.Transformable("PerspectiveCamera")
    scene.set_camera(cam)

    bridge = SceneBridge(scene)
    randomize = scene.compile()
    params = dict(randomize(jax.random.key(0), 0))
    rs = bridge.assemble(params)
    assert rs.materials.roughness_tex is not None
    assert rs.materials.roughness_tex.shape == (1, 4, 4, 1)
    assert bool(rs.materials.has_roughness_tex[0])
    assert rs.materials.normal_tex.shape == (1, 4, 4, 3)
    # Per-step override wins over the static map.
    params["mat0.roughness.data"] = jnp.full((4, 4), 0.9)
    rs2 = bridge.assemble(params)
    np.testing.assert_allclose(np.asarray(rs2.materials.roughness_tex), 0.9)

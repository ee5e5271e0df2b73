"""Smooth (Phong-interpolated) vertex-normal shading.

Mitsuba interpolates vertex normals unless a mesh sets face_normals=true;
the reference's scenes inherit that default, so coarse meshes (vocalfold at
resolution 24) shade smoothly there.  Here Geometry.normals carries
area-weighted vertex normals (types.compute_vertex_normals, recomputed per
assembled variant so they track randomization and stay differentiable),
hit attributes interpolate them, and the pathtracer uses the result as the
base shading normal.  Reference capability: Mitsuba mesh shading frames
behind /root/reference/main.py:6.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import fireflies_tpu as ff
from fireflies_tpu.assets.procedural import make_sphere
from fireflies_tpu.render import RenderConfig, SceneBridge, render_rgb
from fireflies_tpu.render.intersect import closest_hit, hit_attributes_table
from fireflies_tpu.render.intersect import build_face_table
from fireflies_tpu.render.types import (
    Camera,
    Geometry,
    Lights,
    Materials,
    RenderScene,
    compute_vertex_normals,
)
from fireflies_tpu.render.vec3 import from_array


def _sphere_geometry(rings=12, segments=24, smooth=True):
    verts, faces, _ = make_sphere(radius=1.0, rings=rings, segments=segments)
    verts = jnp.asarray(verts, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    normals = compute_vertex_normals(verts, faces) if smooth else None
    return Geometry(
        vertices=verts,
        faces=faces,
        face_mat=jnp.zeros(faces.shape[0], jnp.int32),
        face_mesh=jnp.zeros(faces.shape[0], jnp.int32),
        normals=normals,
    )


def test_vertex_normals_match_analytic_sphere():
    geo = _sphere_geometry()
    radial = np.array(np.asarray(geo.vertices))
    radial /= np.linalg.norm(radial, axis=1, keepdims=True)
    radial = -radial  # make_sphere winds inward (renderer flips per-ray)
    vn = np.asarray(geo.normals)
    # Area-weighted normals on a tessellated sphere point radially (with
    # the winding).  Unreferenced seam duplicates keep the zero-row
    # (flat-fallback) marker.
    referenced = np.linalg.norm(vn, axis=1) > 0.5
    assert referenced.mean() > 0.9
    dots = (vn[referenced] * radial[referenced]).sum(axis=1)
    assert dots.min() > 0.97


def test_interpolated_normal_beats_geometric_at_hit():
    geo = _sphere_geometry()
    table = build_face_table(geo)
    # Rays from +Z toward off-axis points on the sphere (mid-triangle hits).
    n = 64
    xs = np.linspace(-0.6, 0.6, 8)
    ys = np.linspace(-0.6, 0.6, 8)
    gx, gy = np.meshgrid(xs, ys)
    o = jnp.stack(
        [gx.ravel(), gy.ravel(), np.full(n, 3.0)], axis=1
    ).astype(jnp.float32)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))
    hit = closest_hit(o, d, geo, tri_chunk=64)
    assert bool(jnp.all(hit.valid))
    attrs = hit_attributes_table(
        from_array(o), from_array(d), hit, table, has_uvs=False, has_normals=True
    )
    p = attrs["position"].to_array()
    # Inward winding: un-flipped normals point toward the center.
    analytic = -p / jnp.linalg.norm(p, axis=1, keepdims=True)
    sm = attrs["smooth_normal"].to_array()
    gm = attrs["normal"].to_array()
    err_sm = float(jnp.mean(jnp.linalg.norm(sm - analytic, axis=1)))
    err_gm = float(jnp.mean(jnp.linalg.norm(gm - analytic, axis=1)))
    assert err_sm < 0.02
    assert err_sm < 0.25 * err_gm


def _sphere_scene(smooth):
    geo = _sphere_geometry(rings=8, segments=16, smooth=smooth)
    mats = Materials.default(1).replace(
        base_color=jnp.full((1, 3), 0.8, jnp.float32),
        specular=jnp.zeros((1,)),
        roughness=jnp.ones((1,)),
    )
    lw = np.eye(4, dtype=np.float32)
    lw[:3, 3] = (0.0, 0.0, 4.0)
    lights = Lights(
        kinds=jnp.zeros(1, jnp.int32),
        to_world=jnp.asarray(lw)[None],
        intensity=jnp.full((1, 3), 30.0, jnp.float32),
        cutoff_cos=jnp.zeros(1),
        beam_cos=jnp.ones(1),
        active=jnp.ones(1, bool),
    )
    cw = np.eye(4, dtype=np.float32)
    cw[2, 3] = 4.0  # camera at +4z looking down -z
    cam = Camera.create(jnp.asarray(cw), fov=35.0)
    return RenderScene(geometry=geo, materials=mats, lights=lights, camera=cam)


def test_render_smooth_vs_flat_banding():
    """Faceted shading has large brightness jumps across facet edges on a
    coarse sphere; Phong interpolation removes them.  Compare the max
    second difference along the horizontal mid-scanline."""
    cfg = RenderConfig(width=48, height=48, spp=1, max_bounces=1, tri_chunk=64)
    key = jax.random.key(3)
    img_flat = render_rgb(_sphere_scene(False), key, cfg)[..., 0]
    img_sm = render_rgb(_sphere_scene(True), key, cfg)[..., 0]
    row_f = np.asarray(img_flat)[24, 10:38]
    row_s = np.asarray(img_sm)[24, 10:38]
    band_f = np.abs(np.diff(row_f, n=2)).max()
    band_s = np.abs(np.diff(row_s, n=2)).max()
    assert band_s < 0.5 * band_f
    # Same overall energy scale (smooth shading is not a brightness change).
    assert float(img_sm.mean()) == pytest.approx(float(img_flat.mean()), rel=0.15)


def test_bridge_populates_normals_only_for_smooth_meshes():
    verts, faces, _ = make_sphere(radius=1.0, rings=6, segments=12)
    scene = ff.Scene()
    mesh = ff.Mesh("mesh-ball", verts - verts.mean(0), faces, smooth=True)
    scene.add_mesh(mesh)
    cam = ff.Transformable("PerspectiveCamera")
    lw = np.eye(4, dtype=np.float32)
    lw[2, 3] = 4.0
    cam.set_world(lw)
    scene.set_camera(cam)
    bridge = SceneBridge(scene)
    randomize = scene.compile()
    rs = bridge.assemble(randomize(jax.random.key(0), 0))
    assert rs.geometry.normals is not None
    vn = np.asarray(rs.geometry.normals)
    lens = np.linalg.norm(vn, axis=1)
    # Referenced vertices get unit normals; seam duplicates stay zero.
    assert np.all((np.abs(lens - 1.0) < 1e-4) | (lens < 1e-6))
    assert (np.abs(lens - 1.0) < 1e-4).mean() > 0.9

    mesh.set_smooth(False)
    bridge2 = SceneBridge(scene)
    rs2 = bridge2.assemble(randomize(jax.random.key(0), 0))
    assert rs2.geometry.normals is None


def test_smooth_normals_differentiable():
    """d(mean smooth-shaded image)/d(uniform scale) exists and is finite —
    the per-variant normal recompute keeps gradients flowing to vertices."""
    cfg = RenderConfig(width=16, height=16, spp=1, max_bounces=1, tri_chunk=64)

    def loss(s):
        scene = _sphere_scene(True)
        geo = scene.geometry
        verts = geo.vertices * s
        geo = geo.replace(
            vertices=verts, normals=compute_vertex_normals(verts, geo.faces)
        )
        return jnp.mean(render_rgb(scene.replace(geometry=geo), jax.random.key(0), cfg))

    g = float(jax.grad(loss)(jnp.asarray(1.0)))
    assert np.isfinite(g)
    assert abs(g) > 1e-6

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import fireflies_tpu as ff
from fireflies_tpu import sampling
from fireflies_tpu.utils import math as ffmath


def _unit_quad(name="mesh-quad"):
    verts = np.array(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return ff.Mesh(name, verts, faces)


def test_non_randomized_mesh_keeps_world():
    scene = ff.Scene()
    mesh = scene.add_mesh(_unit_quad())
    params = scene.compile()(jax.random.key(0), 0)
    np.testing.assert_allclose(
        params["mesh-quad.vertex_positions"], mesh.get_vertices(), atol=1e-6
    )
    np.testing.assert_allclose(params["mesh-quad.to_world"], np.eye(4), atol=1e-6)


def test_translation_randomization_bounds():
    scene = ff.Scene()
    mesh = scene.add_mesh(_unit_quad())
    mesh.translate_x(-2.0, 2.0)
    fn = scene.compile()
    for i in range(10):
        params = fn(jax.random.key(i), 0)
        w = params["mesh-quad.to_world"]
        assert -2.0 <= float(w[0, 3]) <= 2.0
        assert float(w[1, 3]) == 0.0


def test_centroid_composition():
    # A mesh whose original centroid was (5,0,0): stored verts are aligned,
    # centroid recorded; with no extra randomization the world transform must
    # put it back: world = (T=0 + centroid) @ I @ I.
    verts = np.array([[4, 0, 0], [6, 0, 0], [5, 1, 0]], np.float32)
    centroid = verts.mean(0)
    mesh = ff.Mesh("mesh-m", verts - centroid)
    mesh.set_centroid(centroid)
    mesh.set_randomizable(True)
    scene = ff.Scene()
    scene.add_mesh(mesh)
    params = scene.compile()(jax.random.key(0), 0)
    np.testing.assert_allclose(params["mesh-m.vertex_positions"], verts, atol=1e-5)


def test_scale_applied_before_rotation():
    mesh = _unit_quad()
    mesh.scale(jnp.array([2.0, 2.0, 2.0]), jnp.array([2.0, 2.0, 2.0]))
    scene = ff.Scene()
    scene.add_mesh(mesh)
    params = scene.compile()(jax.random.key(0), 0)
    np.testing.assert_allclose(
        params["mesh-quad.vertex_positions"], mesh.get_vertices() * 2.0, atol=1e-5
    )


def test_parent_child_composition():
    scene = ff.Scene()
    parent = scene.add_mesh(_unit_quad("mesh-parent"))
    child = scene.add_mesh(_unit_quad("mesh-child"))
    child.set_parent(parent)
    parent.translate_x(3.0, 3.0)  # deterministic interval
    parent.set_randomizable(True)
    params = scene.compile()(jax.random.key(0), 0)
    # Child inherits the parent's translation (reference base.py:239-244).
    np.testing.assert_allclose(
        params["mesh-child.vertex_positions"][:, 0],
        child.get_vertices()[:, 0] + 3.0,
        atol=1e-5,
    )


def test_material_and_light_attributes():
    scene = ff.Scene()
    mat = scene.add_material(ff.Material("mat-skin"))
    mat.add_float_key("brdf_0.roughness.value", 0.25, 0.25)
    light = scene.add_light(ff.Light("light-main", kind="point", intensity=(5.0, 5.0, 5.0)))
    light.add_vec3_sampler(
        "intensity.value", sampling.UniformScalarToVec3Sampler.create(2.0, 2.0)
    )
    params = scene.compile()(jax.random.key(0), 0)
    # Canonical alias emitted alongside the user's Mitsuba-style key.
    assert float(params["mat-skin.brdf_0.roughness.value"][0]) == pytest.approx(0.25)
    assert float(params["mat-skin.roughness"][0]) == pytest.approx(0.25)
    # Default params present for the renderer.
    assert params["mat-skin.metallic"].shape == ()
    np.testing.assert_allclose(params["light-main.intensity"], [2.0, 2.0, 2.0], atol=1e-6)


def test_camera_fov_randomization():
    scene = ff.Scene()
    cam = ff.Transformable("PerspectiveCamera")
    cam.set_world(np.asarray(ffmath.look_at(jnp.array([0.0, 0, 5]), jnp.zeros(3), jnp.array([0.0, 1, 0]))))
    cam.add_float_key("x_fov", 70.0, 130.0)
    scene.set_camera(cam)
    params = scene.compile()(jax.random.key(1), 0)
    assert 70.0 <= float(params["PerspectiveCamera.fov"][0]) <= 130.0
    assert params["PerspectiveCamera.to_world"].shape == (4, 4)


def test_animation_frames_train_vs_eval():
    mesh = _unit_quad()
    frames_train = np.stack([mesh.get_vertices() + i for i in range(4)])
    frames_eval = np.stack([mesh.get_vertices() - i for i in range(2)])
    mesh.add_animation(frames_train, frames_eval)
    scene = ff.Scene()
    scene.add_mesh(mesh)

    scene.train()
    fn = scene.compile()
    seen = set()
    for i in range(12):
        v = fn(jax.random.key(i), 0)["mesh-quad.vertex_positions"]
        offset = float(v[0, 0] - mesh.get_vertices()[0, 0])
        seen.add(round(offset))
    assert seen <= {0, 1, 2, 3} and len(seen) > 1

    scene.eval()
    fn = scene.compile()
    v0 = fn(jax.random.key(0), 0)["mesh-quad.vertex_positions"]
    v1 = fn(jax.random.key(0), 1)["mesh-quad.vertex_positions"]
    v2 = fn(jax.random.key(0), 2)["mesh-quad.vertex_positions"]
    assert float(v0[0, 0]) == pytest.approx(mesh.get_vertices()[0, 0], abs=1e-5)
    assert float(v1[0, 0]) == pytest.approx(mesh.get_vertices()[0, 0] - 1, abs=1e-5)
    # eval wraps over the 2 eval frames
    assert float(v2[0, 0]) == pytest.approx(mesh.get_vertices()[0, 0], abs=1e-5)


def test_animation_func():
    mesh = _unit_quad()
    mesh.add_animation_func(lambda v, t: v + t, 1.0, 1.0)
    scene = ff.Scene()
    scene.add_mesh(mesh)
    v = scene.compile()(jax.random.key(0), 0)["mesh-quad.vertex_positions"]
    np.testing.assert_allclose(v, mesh.get_vertices() + 1.0, atol=1e-5)


def test_randomize_batch_vmap():
    scene = ff.Scene()
    mesh = scene.add_mesh(_unit_quad())
    mesh.rotate_z(-3.14, 3.14)
    keys = jax.random.split(jax.random.key(0), 8)
    batch = scene.randomize_batch(keys)
    assert batch["mesh-quad.vertex_positions"].shape == (8, 4, 3)
    # Variants differ.
    assert float(jnp.std(batch["mesh-quad.vertex_positions"][:, 0, 0])) > 0.01


def test_randomize_batch_jits():
    scene = ff.Scene()
    mesh = scene.add_mesh(_unit_quad())
    mesh.translate_y(-1.0, 1.0)
    fn = jax.jit(jax.vmap(scene.compile()))
    keys = jax.random.split(jax.random.key(0), 4)
    out = fn(keys, jnp.zeros(4, jnp.int32))
    assert out["mesh-quad.vertex_positions"].shape == (4, 4, 3)


def test_from_params_ingestion():
    flat = {
        "mesh-Cube.vertex_positions": np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
        "mesh-Cube.faces": np.array([[0, 1, 2]], np.int32),
        "PerspectiveCamera.to_world": np.eye(4, dtype=np.float32),
        "PerspectiveCamera.x_fov": 45.0,
        "emit-Spot.intensity.value": np.array([10.0, 10.0, 10.0], np.float32),
        "mat-Surface.brdf_0.roughness.value": 0.3,
    }
    scene = ff.Scene.from_params(flat)
    assert scene.mesh("mesh-Cube") is not None
    assert scene.camera() is not None
    assert scene.light("emit-Spot") is not None
    assert scene.material("mat-Surface") is not None
    params = scene.compile()(jax.random.key(0), 0)
    # Ingested verts round-trip (centroid split out then recomposed).
    np.testing.assert_allclose(
        params["mesh-Cube.vertex_positions"], flat["mesh-Cube.vertex_positions"], atol=1e-5
    )
    assert float(params["emit-Spot.intensity.value"][0]) == 10.0


def test_curve_parent_drives_camera():
    from fireflies_tpu.utils.nurbs import NURBSCurve

    # Straight-line "curve" along +X.
    cps = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0]], np.float32)
    knots = [0, 0, 0, 0, 1, 1, 1, 1]
    curve = NURBSCurve.create(cps, knots, 3)
    scene = ff.Scene()
    ff_curve = scene.add_curve(ff.Curve("curve-path", curve, interp_delta=0.5))
    cam = ff.Transformable("PerspectiveCamera")
    cam.set_parent(ff_curve)
    scene.set_camera(cam)
    scene.eval()
    fn = scene.compile()
    w0 = fn(jax.random.key(0), 0)["PerspectiveCamera.to_world"]
    w1 = fn(jax.random.key(0), 1)["PerspectiveCamera.to_world"]
    # Camera marches along +X between eval steps.
    assert float(w1[0, 3]) > float(w0[0, 3])


def test_material_warns_on_spatial_ops():
    mat = ff.Material("mat-x")
    with pytest.warns(UserWarning):
        mat.rotate_x(0.0, 1.0)


def test_shape_model_blend():
    from fireflies_tpu.entity import ShapeModel

    template = np.zeros((4, 3), np.float32)
    basis = np.zeros((2, 4, 3), np.float32)
    basis[0, :, 0] = 1.0  # param 0 moves all verts in +x
    sm = ShapeModel("mesh-shape", template, basis)
    out = sm.get_vertex_data(jnp.array([0.5, 0.0]))
    np.testing.assert_allclose(out[:, 0], 0.5, atol=1e-6)
    scene = ff.Scene()
    scene.add_mesh(sm)
    v = scene.compile()(jax.random.key(0), 0)["mesh-shape.vertex_positions"]
    assert v.shape == (4, 3)


def test_load_curve_from_blender_obj(tmp_path):
    p = tmp_path / "curve.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 2 0 0\nv 3 0 0\n"
        "deg 3\n"
        "parm u 0 0 0 0 1 1 1 1\n"
    )
    scene = ff.Scene()
    curve = scene.load_curve(str(p), name="curve-path")
    assert scene.curves()[0] is curve
    pt = curve.curve().evaluate(jnp.asarray(0.5))
    np.testing.assert_allclose(pt, [1.5, 0, 0], atol=1e-5)


def test_second_perspective_sensor_becomes_projector():
    """Reference convention: PerspectiveCamera_1 is the laser projector
    (laser_estimation.py:256-268)."""
    flat = {
        "PerspectiveCamera.to_world": np.eye(4, dtype=np.float32),
        "PerspectiveCamera.x_fov": 45.0,
        "PerspectiveCamera_1.to_world": np.eye(4, dtype=np.float32),
        "PerspectiveCamera_1.x_fov": 20.0,
        "mesh-m.vertex_positions": np.zeros((3, 3), np.float32),
        "mesh-m.faces": np.array([[0, 1, 2]], np.int32),
    }
    scene = ff.Scene.from_params(flat)
    assert scene.camera().name() == "PerspectiveCamera"
    assert scene.projector() is not None
    assert scene.projector().name() == "PerspectiveCamera_1"

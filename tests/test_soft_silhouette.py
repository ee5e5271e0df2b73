"""Soft silhouette rendering: coverage correctness + silhouette gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fireflies_tpu import optim
from fireflies_tpu.render import RenderConfig, render_soft_silhouette
from fireflies_tpu.render.soft import soft_silhouette
from fireflies_tpu.render.types import Camera, Geometry, Lights, Materials, RenderScene


def _quad_scene(offset_x=0.0, half=0.5, z=-2.0):
    verts = jnp.array(
        [
            [-half + offset_x, -half, z],
            [half + offset_x, -half, z],
            [half + offset_x, half, z],
            [-half + offset_x, half, z],
        ],
        jnp.float32,
    )
    faces = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
    geo = Geometry(
        vertices=verts,
        faces=faces,
        face_mat=jnp.zeros(2, jnp.int32),
        face_mesh=jnp.zeros(2, jnp.int32),
    )
    return RenderScene(
        geometry=geo,
        materials=Materials.default(1),
        lights=Lights.empty(),
        camera=Camera.create(jnp.eye(4), fov=60.0),
    )


def test_coverage_inside_outside():
    scene = _quad_scene()
    cfg = RenderConfig(width=64, height=64)
    mask = render_soft_silhouette(scene, cfg, sigma=1e-5)
    assert float(mask[32, 32]) > 0.95  # center covered
    assert float(mask[2, 2]) < 0.05  # corner empty
    assert mask.shape == (64, 64)


def test_coverage_matches_hard_area():
    # Quad of half-extent 0.5 at z=2 with fov 60: NDC half-extent
    # = 0.5 / (2 * tan30) = 0.433 -> covered fraction = 0.433^2.
    scene = _quad_scene()
    cfg = RenderConfig(width=128, height=128)
    mask = render_soft_silhouette(scene, cfg, sigma=1e-6)
    frac = float(jnp.mean(mask))
    expected = (0.5 / (2 * np.tan(np.deg2rad(30)))) ** 2
    assert frac == pytest.approx(expected, rel=0.05)


def test_lateral_gradient_nonzero():
    """THE silhouette-gradient test: moving the quad sideways changes the
    mask IoU — the detached path tracer can't see this; soft rendering can."""
    cfg = RenderConfig(width=32, height=32)
    target = render_soft_silhouette(_quad_scene(0.3), cfg, sigma=1e-4)

    def loss(dx):
        mask = render_soft_silhouette(_quad_scene(dx), cfg, sigma=1e-4)
        return jnp.mean((mask - target) ** 2)

    g = jax.grad(loss)(0.0)
    assert abs(float(g)) > 1e-3  # nonzero lateral gradient
    # Points toward the target (loss decreases toward +0.3).
    assert float(g) < 0


def test_recover_lateral_offset():
    """Optimize the lateral offset via the soft mask (example-08 intent,
    now including the silhouette direction)."""
    cfg = RenderConfig(width=32, height=32)
    target = render_soft_silhouette(_quad_scene(0.25), cfg, sigma=2e-4)

    def loss_fn(trainable, key):
        mask = render_soft_silhouette(_quad_scene(trainable["dx"]), cfg, sigma=2e-4)
        return jnp.mean((mask - target) ** 2)

    res = optim.optimize_params(
        {"dx": jnp.asarray(0.0)}, loss_fn, jax.random.key(0), steps=150,
        learning_rate=2e-2,
    )
    assert float(res.params["dx"]) == pytest.approx(0.25, abs=0.02)


def test_mesh_id_mask():
    # Two meshes: restrict coverage to one.
    verts = jnp.array(
        [
            [-1.5, -0.4, -2], [-0.5, -0.4, -2], [-1.0, 0.4, -2],  # left tri
            [0.5, -0.4, -2], [1.5, -0.4, -2], [1.0, 0.4, -2],  # right tri
        ],
        jnp.float32,
    )
    faces = jnp.array([[0, 1, 2], [3, 4, 5]], jnp.int32)
    geo = Geometry(
        vertices=verts, faces=faces,
        face_mat=jnp.zeros(2, jnp.int32),
        face_mesh=jnp.asarray([0, 1], jnp.int32),
    )
    scene = RenderScene(
        geometry=geo, materials=Materials.default(1), lights=Lights.empty(),
        camera=Camera.create(jnp.eye(4), fov=60.0),
    )
    cfg = RenderConfig(width=64, height=64)
    m0 = render_soft_silhouette(scene, cfg, sigma=1e-5, mesh_id=0)
    m1 = render_soft_silhouette(scene, cfg, sigma=1e-5, mesh_id=1)
    # Left mesh covers left half only.
    assert float(m0[:, :32].max()) > 0.9 and float(m0[:, 40:].max()) < 0.1
    assert float(m1[:, 40:].max()) > 0.9 and float(m1[:, :24].max()) < 0.1


def test_behind_camera_faces_dropped():
    scene = _quad_scene(z=+2.0)  # behind the camera
    cfg = RenderConfig(width=16, height=16)
    mask = render_soft_silhouette(scene, cfg, sigma=1e-5)
    assert float(mask.max()) < 1e-5


def test_hybrid_pose_recovery():
    """Hybrid appearance+silhouette loss recovers a 2-DoF pose (lateral +
    depth) that neither gradient regime could handle alone."""
    from fireflies_tpu.render import render_depth_differentiable

    cfg = RenderConfig(width=24, height=24, spp=1, max_bounces=1, tri_chunk=16)

    def render_pair(dx, dz):
        scene = _quad_scene(offset_x=dx, z=-2.0 + dz)
        depth = render_depth_differentiable(scene, cfg)[..., None]
        mask = render_soft_silhouette(scene, cfg, sigma=2e-4)
        return depth, mask

    td, tm = render_pair(jnp.asarray(0.2), jnp.asarray(-0.4))

    def loss_fn(tr, key):
        d, m = render_pair(tr["dx"], tr["dz"])
        both = (d[..., 0] > 0) & (td[..., 0] > 0)
        return optim.hybrid_pose_loss(d, td, m, tm, mask_weight=2.0, valid_mask=both)

    res = optim.optimize_params(
        {"dx": jnp.asarray(0.0), "dz": jnp.asarray(0.0)},
        loss_fn, jax.random.key(0), steps=250, learning_rate=2e-2,
    )
    assert float(res.params["dx"]) == pytest.approx(0.2, abs=0.03)
    assert float(res.params["dz"]) == pytest.approx(-0.4, abs=0.05)

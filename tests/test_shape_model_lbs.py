"""FLAME-style pose articulation (LBS) + reference drift-walk semantics.

Covers VERDICT r1 items 7 (pose blendshapes + joint regressor + LBS,
reference flame.py:49-66,115-131 via flame_pytorch) and 8 (stateful drift
random-walk with reflection, flame.py:105-113, expressed statelessly as a
triangle wave of `step`), plus the Bridson `radiusType="normDist"` option
(reference poisson.py:64-68).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fireflies_tpu.entity.shape_model import FlameShapeModel, ShapeModel, lbs
from fireflies_tpu.sampling.poisson import bridson


def _toy_flame_npz(tmp_path, with_pose=True):
    """A 3-joint articulated 'arm' of 12 vertices along +y."""
    rng = np.random.default_rng(0)
    v = 12
    template = np.stack(
        [rng.uniform(-0.1, 0.1, v), np.linspace(0, 3.0, v), np.zeros(v)], -1
    ).astype(np.float32)
    k = 4
    shapedirs = rng.normal(0, 0.01, (v, 3, k)).astype(np.float32)
    faces = np.stack(
        [np.arange(v - 2), np.arange(1, v - 1), np.arange(2, v)], -1
    ).astype(np.int32)
    out = {"template": template, "shapedirs": shapedirs, "faces": faces}
    if with_pose:
        j = 3
        # joints at y = 0, 1, 2; regressor picks nearest template verts
        j_reg = np.zeros((j, v), np.float32)
        for ji, y in enumerate([0.0, 1.0, 2.0]):
            i = int(np.argmin(np.abs(template[:, 1] - y)))
            j_reg[ji, i] = 1.0
        parents = np.array([-1, 0, 1], np.int64)
        # hard skinning by segment
        w = np.zeros((v, j), np.float32)
        for vi in range(v):
            y = template[vi, 1]
            w[vi, 0 if y < 1.0 else (1 if y < 2.0 else 2)] = 1.0
        posedirs = rng.normal(0, 0.001, (9 * (j - 1), v, 3)).astype(np.float32)
        out.update(J_regressor=j_reg, weights=w, parents=parents, posedirs=posedirs)
    path = tmp_path / "toy_flame.npz"
    np.savez(path, **out)
    return str(path), template


def test_lbs_zero_pose_is_identity(tmp_path):
    path, template = _toy_flame_npz(tmp_path)
    model = FlameShapeModel("head", path, n_shape=2, n_expr=2)
    assert model.has_pose() and model.n_joints == 3
    params = jnp.zeros(model.n_params())
    pose = jnp.zeros((3, 3))
    v = model.get_vertex_data(params, pose)
    np.testing.assert_allclose(np.asarray(v), template, atol=1e-5)


def test_lbs_rigid_rotation_of_child_segment(tmp_path):
    """Rotating joint 2 (y = 2) about z rigidly rotates the verts it owns
    around that joint, leaving parent-segment verts fixed."""
    path, template = _toy_flame_npz(tmp_path)
    model = FlameShapeModel("head", path, n_shape=2, n_expr=2)
    model._posedirs = None  # isolate the skinning transform
    ang = 0.7
    pose = jnp.zeros((3, 3)).at[2, 2].set(ang)
    v = np.asarray(model.get_vertex_data(jnp.zeros(model.n_params()), pose))
    joint = np.array([0.0, 2.0, 0.0])
    # nearest-template-vert regressor: joint 2 sits at that vertex
    joint = template[int(np.argmin(np.abs(template[:, 1] - 2.0)))]
    c, s = np.cos(ang), np.sin(ang)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    owned = template[:, 1] >= 2.0
    expected = (template[owned] - joint) @ rot.T + joint
    np.testing.assert_allclose(v[owned], expected, atol=1e-5)
    np.testing.assert_allclose(v[~owned], template[~owned], atol=1e-5)


def test_lbs_pose_gradients_finite_difference(tmp_path):
    path, _ = _toy_flame_npz(tmp_path)
    model = FlameShapeModel("head", path, n_shape=2, n_expr=2)
    params = jnp.zeros(model.n_params())

    def loss(pose_flat):
        v = model.get_vertex_data(params, pose_flat.reshape(3, 3))
        return jnp.sum(v[:, 0] ** 2) + jnp.sum(v[:, 1] * v[:, 2])

    p0 = jnp.asarray(np.random.default_rng(3).normal(0, 0.3, 9), jnp.float32)
    g = np.asarray(jax.grad(loss)(p0))
    eps = 1e-3
    for i in range(9):
        lp = float(loss(p0.at[i].add(eps)))
        lm = float(loss(p0.at[i].add(-eps)))
        fd = (lp - lm) / (2 * eps)
        assert g[i] == pytest.approx(fd, rel=2e-2, abs=2e-3)


def test_lbs_shape_params_still_differentiable(tmp_path):
    path, _ = _toy_flame_npz(tmp_path)
    model = FlameShapeModel("head", path, n_shape=2, n_expr=2)
    pose = jnp.asarray(np.random.default_rng(4).normal(0, 0.2, (3, 3)), jnp.float32)

    def loss(params):
        return jnp.sum(model.get_vertex_data(params, pose) ** 2)

    g = jax.grad(loss)(jnp.zeros(model.n_params()))
    assert np.all(np.isfinite(np.asarray(g))) and float(jnp.abs(g).max()) > 0


def test_drift_walk_reference_semantics():
    """flame.py:105-113 semantics, stateless: consecutive steps move every
    active parameter by exactly +-drift, never leave [-limit, limit], and
    reflect at the limits instead of latching (the reference's _invert
    latch never resets — a bug, not a behavior to copy)."""
    model = ShapeModel(
        "m", np.zeros((4, 3), np.float32), np.zeros((2, 4, 3), np.float32),
        param_limit=0.2, drift=0.05,
    )
    key = jax.random.key(0)
    seq = np.stack(
        [np.asarray(model.sample_params(key, s, True)) for s in range(40)]
    )  # (40, K)
    deltas = np.diff(seq, axis=0)
    # Every step moves by exactly drift except at a reflection, where the
    # fold can shorten it (the random start is not grid-aligned with the
    # limits); never more than drift.
    assert np.all(np.abs(deltas) <= 0.05 + 1e-5)
    assert (np.isclose(np.abs(deltas), 0.05, atol=1e-5).mean()) > 0.85
    assert np.all(np.abs(seq) <= 0.2 + 1e-5)
    # Reflection: the sign of the delta flips somewhere in 40 steps
    # (period = 4 * limit / drift = 16 steps).
    assert (deltas[:, 0] > 0).any() and (deltas[:, 0] < 0).any()
    # Coherence requires the SAME key: a different key starts elsewhere.
    other = np.asarray(model.sample_params(jax.random.key(1), 0, True))
    assert not np.allclose(other, seq[0])


def test_drift_walk_n_active_zeroing():
    model = ShapeModel(
        "m", np.zeros((4, 3), np.float32), np.zeros((6, 4, 3), np.float32),
        param_limit=2.0, drift=0.05, n_active=2,
    )
    p = np.asarray(model.sample_params(jax.random.key(0), 5, True))
    assert np.all(p[2:] == 0.0) and np.any(p[:2] != 0.0)


@pytest.mark.parametrize("radius_type", ["default", "normDist"])
def test_bridson_radius_types(radius_type):
    rmap = np.full((48, 48), 6.0, np.float32)
    n, pts = bridson(rmap, k=20, seed=3, radius_type=radius_type)
    assert n > 10
    d = np.linalg.norm(pts[None] - pts[:, None], axis=-1)
    d[np.arange(n), np.arange(n)] = np.inf
    assert d.min() >= 6.0 - 1e-6  # hard minimum-distance invariant
    if radius_type == "normDist":
        # tighter spacing distribution: nearest-neighbor distances
        # concentrate near 1.5 r
        nn = d.min(axis=1)
        assert 6.0 <= np.median(nn) <= 12.0


def test_bridson_bad_radius_type():
    with pytest.raises(ValueError):
        bridson(np.full((8, 8), 3.0), radius_type="bogus")

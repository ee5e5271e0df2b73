"""3D math utilities (pure JAX).

Functional equivalents of the reference's torch math layer
(reference: fireflies/utils/math.py) plus the transform helpers that the
reference intended to keep in fireflies/utils/transforms.py (empty in the
snapshot; working twins at fireflies/utils/math.py:220,231).

All functions are jit/vmap/grad-safe: no Python branching on traced values,
float32 by default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# Geometry transforms are tiny-K matmuls where TPU's default bf16 passes lose
# ~1e-3 — fatal for ray intersection.  Always run them at full f32 precision
# (negligible cost at K=3/4; the MXU is not the bottleneck here).
_HIGHEST = jax.lax.Precision.HIGHEST


def _mm(a: Array, b: Array) -> Array:
    return jnp.matmul(a, b, precision=_HIGHEST)


# ---------------------------------------------------------------------------
# Rotations (Euler single-axis)
# ---------------------------------------------------------------------------


def rot_z(alpha: Array | float) -> Array:
    """3x3 rotation about +Z ("yaw" in the reference, utils/math.py:24-35)."""
    alpha = jnp.asarray(alpha, jnp.float32)
    c, s = jnp.cos(alpha), jnp.sin(alpha)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, zero], -1),
            jnp.stack([s, c, zero], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        -2,
    )


def rot_y(alpha: Array | float) -> Array:
    """3x3 rotation about +Y ("pitch", utils/math.py:37-48)."""
    alpha = jnp.asarray(alpha, jnp.float32)
    c, s = jnp.cos(alpha), jnp.sin(alpha)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, zero, s], -1),
            jnp.stack([zero, one, zero], -1),
            jnp.stack([-s, zero, c], -1),
        ],
        -2,
    )


def rot_x(alpha: Array | float) -> Array:
    """3x3 rotation about +X ("roll", utils/math.py:50-60)."""
    alpha = jnp.asarray(alpha, jnp.float32)
    c, s = jnp.cos(alpha), jnp.sin(alpha)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([one, zero, zero], -1),
            jnp.stack([zero, c, -s], -1),
            jnp.stack([zero, s, c], -1),
        ],
        -2,
    )


# Reference-compatible aliases (utils/math.py:12-21).
get_yaw_transform = rot_z
get_pitch_transform = rot_y
get_roll_transform = rot_x
get_z_transform = rot_z
get_y_transform = rot_y
get_x_transform = rot_x


def euler_to_rotation(angles: Array) -> Array:
    """Euler XYZ angles (3,) -> 3x3 matrix, composed ``Rz @ Ry @ Rx``.

    Matches reference Transformable.sample_rotation (entity/base.py:194-208):
    zMat(pitch=angles[2]) @ yMat(yaw=angles[1]) @ xMat(roll=angles[0]) where the
    reference's "pitch" builds a Y-rotation from angles[2] etc.  Net effect in
    world axes: Rz(angles[2]') ... the reference mixes its naming; we define the
    unambiguous convention R = Rz(az) @ Ry(ay) @ Rx(ax) with angles=(ax, ay, az).
    """
    ax, ay, az = angles[..., 0], angles[..., 1], angles[..., 2]
    return _mm(_mm(rot_z(az), rot_y(ay)), rot_x(ax))


def to_mat4x4(mat3: Array) -> Array:
    """Embed a 3x3 matrix in a 4x4 homogeneous matrix (utils/math.py:203-210)."""
    m = jnp.eye(4, dtype=mat3.dtype)
    return m.at[:3, :3].set(mat3)


def translation_matrix(t: Array) -> Array:
    """(3,) translation -> 4x4 homogeneous translation matrix."""
    m = jnp.eye(4, dtype=jnp.result_type(t, jnp.float32))
    return m.at[:3, 3].set(t)


def scale_matrix(s: Array) -> Array:
    """(3,) scale -> 4x4 homogeneous scale matrix."""
    s = jnp.asarray(s)
    m = jnp.eye(4, dtype=jnp.result_type(s, jnp.float32))
    return m.at[jnp.arange(3), jnp.arange(3)].set(s)


def rotation_matrix_from_vectors(v1: Array, v2: Array) -> Array:
    """Rotation matrix mapping direction v1 onto v2 (Rodrigues).

    Reference: utils/math.py:67-106.  Safe when v1 ~ v2 (returns identity) and
    when v1 ~ -v2 (rotates around an arbitrary perpendicular axis).
    """
    v1 = v1 / jnp.linalg.norm(v1)
    v2 = v2 / jnp.linalg.norm(v2)
    c = jnp.cross(v1, v2)
    d = jnp.dot(v1, v2)
    s2 = jnp.dot(c, c)  # = sin^2(theta)

    k = skew(c)
    # R = I + K + K^2 * (1 - d) / s2 ; degenerate when s2 ~ 0.
    safe_s2 = jnp.where(s2 < 1e-12, 1.0, s2)
    r = jnp.eye(3, dtype=v1.dtype) + k + _mm(k, k) * ((1.0 - d) / safe_s2)

    # Degenerate branches: parallel -> I; anti-parallel -> 180deg about any
    # axis perpendicular to v1.
    perp = jnp.where(
        jnp.abs(v1[0]) < 0.9,
        jnp.array([1.0, 0.0, 0.0], v1.dtype),
        jnp.array([0.0, 1.0, 0.0], v1.dtype),
    )
    axis = jnp.cross(v1, perp)
    axis = axis / jnp.linalg.norm(axis)
    k180 = skew(axis)
    r_anti = jnp.eye(3, dtype=v1.dtype) + 2.0 * _mm(k180, k180)

    return jnp.where(s2 < 1e-12, jnp.where(d > 0.0, jnp.eye(3, dtype=v1.dtype), r_anti), r)


def skew(v: Array) -> Array:
    """Skew-symmetric cross-product matrix of a 3-vector."""
    zero = jnp.zeros((), v.dtype)
    return jnp.stack(
        [
            jnp.stack([zero, -v[2], v[1]]),
            jnp.stack([v[2], zero, -v[0]]),
            jnp.stack([-v[1], v[0], zero]),
        ]
    )


def look_at_np(origin, target, up=(0.0, 1.0, 0.0)):
    """Pure-numpy look_at for host-side scene construction.

    CRITICAL on the axon TPU tunnel: a single device->host transfer
    (np.asarray of a jnp result) permanently degrades every subsequent
    dispatch in the process to ~30 ms.  Asset/builder code must therefore
    never round-trip through the device — use this, not np.asarray(look_at).
    """
    import numpy as np

    origin = np.asarray(origin, np.float32)
    target = np.asarray(target, np.float32)
    up = np.asarray(up, np.float32)
    fwd = target - origin
    fwd = fwd / (np.linalg.norm(fwd) + 1e-12)
    right = np.cross(fwd, up)
    right = right / (np.linalg.norm(right) + 1e-12)
    true_up = np.cross(right, fwd)
    m = np.eye(4, dtype=np.float32)
    m[:3, 0] = right
    m[:3, 1] = true_up
    m[:3, 2] = -fwd
    m[:3, 3] = origin
    return m


def translation_matrix_np(t):
    import numpy as np

    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = np.asarray(t, np.float32)
    return m


def transform_points_np(points, matrix):
    import numpy as np

    points = np.asarray(points, np.float32)
    homo = np.concatenate([points, np.ones((len(points), 1), np.float32)], -1)
    out = homo @ np.asarray(matrix, np.float32).T
    w = out[:, 3:4]
    w = np.where(np.abs(w) < 1e-8, 1e-8, w)
    return out[:, :3] / w


def look_at(origin: Array, target: Array, up: Array) -> Array:
    """4x4 camera-to-world with camera looking down -Z at `target`, +Y ~ up."""
    origin = jnp.asarray(origin, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    fwd = target - origin
    fwd = fwd / jnp.linalg.norm(fwd)
    right = jnp.cross(fwd, up)
    right = right / jnp.linalg.norm(right)
    true_up = jnp.cross(right, fwd)
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[:3, 0].set(right)
    m = m.at[:3, 1].set(true_up)
    m = m.at[:3, 2].set(-fwd)  # camera looks down -Z
    m = m.at[:3, 3].set(origin)
    return m


# ---------------------------------------------------------------------------
# Homogeneous transforms (reference utils/math.py:199-235)
# ---------------------------------------------------------------------------


def convert_points_to_homogeneous(points: Array) -> Array:
    """(..., 3) -> (..., 4) with w = 1."""
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


def convert_points_from_homogeneous(points: Array, eps: float = 1e-8) -> Array:
    """(..., 4) -> (..., 3) with perspective divide."""
    w = points[..., 3:4]
    w = jnp.where(jnp.abs(w) < eps, jnp.where(w < 0, -eps, eps), w)
    return points[..., :3] / w


def transform_points(points: Array, matrix: Array) -> Array:
    """Apply a 4x4 homogeneous transform to (..., 3) points (math.py:220-228)."""
    homo = convert_points_to_homogeneous(points)
    out = _mm(homo, matrix.T)
    return convert_points_from_homogeneous(out)


def transform_directions(directions: Array, matrix: Array) -> Array:
    """Apply only the linear part of a 4x4 transform to (..., 3) directions
    (math.py:231-235)."""
    return _mm(directions, matrix[:3, :3].T)


def transform_normals(normals: Array, matrix: Array) -> Array:
    """Transform normals with the inverse-transpose of the linear part."""
    lin = matrix[:3, :3]
    inv_t = jnp.linalg.inv(lin).T
    out = _mm(normals, inv_t.T)
    return out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + 1e-20)


# ---------------------------------------------------------------------------
# Randomization / normalization helpers
# ---------------------------------------------------------------------------


def random_between(key: Array, minimum: Array, maximum: Array) -> Array:
    """U(min, max) elementwise — reference randomBetweenTensors (math.py:170-175)."""
    minimum = jnp.asarray(minimum, jnp.float32)
    maximum = jnp.asarray(maximum, jnp.float32)
    u = jax.random.uniform(key, jnp.broadcast_shapes(minimum.shape, maximum.shape))
    return u * (maximum - minimum) + minimum


def normalize(x: Array) -> Array:
    """Min-max normalize to [0, 1] (math.py:178-181)."""
    lo, hi = jnp.min(x), jnp.max(x)
    return (x - lo) / jnp.where(hi - lo == 0, 1.0, hi - lo)


def normalize_channelwise(x: Array, axis: int = -1) -> Array:
    """Min-max normalize per channel along `axis` (math.py:184-196)."""
    reduce_axes = tuple(i for i in range(x.ndim) if i != axis % x.ndim)
    lo = jnp.min(x, axis=reduce_axes, keepdims=True)
    hi = jnp.max(x, axis=reduce_axes, keepdims=True)
    return (x - lo) / jnp.where(hi - lo == 0, 1.0, hi - lo)


def normalize_vectors(v: Array, eps: float = 1e-20) -> Array:
    """L2-normalize along the last axis."""
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + eps)


def dot(a: Array, b: Array, keepdims: bool = False) -> Array:
    """Last-axis dot product (reference vector_dot, math.py:63-64)."""
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)

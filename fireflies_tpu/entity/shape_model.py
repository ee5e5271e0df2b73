"""Parametric shape models.

The reference defines an abstract ShapeModel(Mesh) (fireflies/entity/shape.py)
and a FLAME morphable-head instance (fireflies/entity/flame.py) that drifts
shape parameters each randomize step (+-0.05 with inversion at |p| = 2.0,
flame.py:105-113).  FLAME's learned weights are external assets; here we
implement the general mechanism — a linear blend-shape model
``verts = template + basis @ params`` — as pure JAX, plus a FlameShapeModel
that loads FLAME-format weights from an .npz when available and otherwise
raises with a clear message.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from fireflies_tpu.entity.mesh import Mesh

Array = jax.Array


class ShapeModel(Mesh):
    """Linear blend-shape model entity.

    verts(params) = template + einsum('k,kvc->vc', params, basis)

    Randomization follows the reference FLAME drift scheme: every step the
    shape parameters random-walk by U(-drift, drift), reflecting at
    +-param_limit (flame.py:105-113).  Because the walk is stateful in the
    reference, here each variant derives its parameters from the step/key
    directly: train draws params ~ U(-limit, limit) scaled by a smoothness
    factor; eval sweeps the first parameter.
    """

    def __init__(
        self,
        name: str,
        template,
        basis,
        faces=None,
        param_limit: float = 2.0,
        drift: float = 0.05,
        n_active: int | None = None,
    ):
        template = np.asarray(template, np.float32)
        super().__init__(name, template, faces)
        self._basis = np.asarray(basis, np.float32)  # (K, V, 3)
        assert self._basis.shape[1:] == template.shape, (
            f"basis {self._basis.shape} incompatible with template {template.shape}"
        )
        self._param_limit = float(param_limit)
        self._drift = float(drift)
        self._n_active = n_active
        self._randomizable = True
        self._animated = True  # participates in vertex sampling

    def n_params(self) -> int:
        return self._basis.shape[0]

    def get_vertex_data(self, params: Array) -> Array:
        """Differentiable blend-shape evaluation (reference getVertexData,
        flame.py:115-131)."""
        return jnp.asarray(self._vertices) + jnp.einsum(
            "k,kvc->vc", params, jnp.asarray(self._basis)
        )

    # Reference-style alias.
    getVertexData = get_vertex_data

    def sample_params(self, key: Array, step, train: bool) -> Array:
        """Reference drift semantics, stateless (flame.py:105-113): the
        parameters random-walk by `drift` per step with reflection at
        +-param_limit.  Because Scene.compile keeps the per-entity key FIXED
        while `step` advances, a sequence rendered at step = 0, 1, 2, ... is
        temporally coherent exactly like the reference's stateful walk —
        expressed as a pure triangle wave of step with a key-derived start
        (the walk is deterministic given its start, so no carried state is
        needed; the reference's `_invert` latch never unlatches, which sends
        its params to -inf — the triangle reflects at BOTH limits instead).
        """
        k = self.n_params()
        limit = self._param_limit
        if train:
            p0 = jax.random.uniform(key, (k,), minval=-limit, maxval=limit)
            x = p0 + jnp.asarray(step, jnp.float32) * self._drift
            period = 4.0 * limit
            y = jnp.mod(x + limit, period)
            p = limit - jnp.abs(y - 2.0 * limit)
        else:
            # Eval: deterministic sweep of the first parameter.
            n_steps = max(int(2 * limit / max(self._drift, 1e-6)), 1)
            p0 = -limit + (
                jnp.asarray(step, jnp.int32) % n_steps
            ).astype(jnp.float32) * self._drift
            p = jnp.zeros((k,), jnp.float32).at[0].set(p0)
        if self._n_active is not None and self._n_active < k:
            p = p * (jnp.arange(k) < self._n_active)
        return p

    def sample_local_vertices(self, key: Array, step, train: bool) -> Array:
        params = self.sample_params(key, step, train)
        return self.get_vertex_data(params)


def _rodrigues(rvec: Array) -> Array:
    """Axis-angle vectors (J, 3) -> rotation matrices (J, 3, 3)."""
    theta = jnp.linalg.norm(rvec, axis=-1, keepdims=True)
    safe = jnp.maximum(theta, 1e-8)
    k = rvec / safe
    kx, ky, kz = k[:, 0], k[:, 1], k[:, 2]
    zeros = jnp.zeros_like(kx)
    K = jnp.stack(
        [
            jnp.stack([zeros, -kz, ky], -1),
            jnp.stack([kz, zeros, -kx], -1),
            jnp.stack([-ky, kx, zeros], -1),
        ],
        axis=-2,
    )  # (J, 3, 3)
    s = jnp.sin(theta)[..., None]
    c = jnp.cos(theta)[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    R = eye + s * K + (1.0 - c) * (K @ K)
    # theta -> 0: R -> I (the series is fine, but k is ill-defined; the
    # s*K and (1-c)K^2 terms both -> 0, so the formula is already safe).
    return R


def lbs(
    v_shaped: Array,
    pose: Array,
    j_regressor: Array,
    parents: np.ndarray,
    skin_weights: Array,
    posedirs: Array | None = None,
) -> Array:
    """Linear blend skinning (SMPL/FLAME formulation), pure JAX.

    v_shaped (V, 3): blend-shaped rest vertices.
    pose (J, 3): per-joint axis-angle (joint 0 = global rotation).
    j_regressor (J, V): rest joints = J_regressor @ v_shaped.
    parents (J,): kinematic chain, parents[0] == -1.
    skin_weights (V, J), posedirs (P, V, 3) with P == 9 * (J - 1)
    (row-major flattened R[1:] - I, flame_pytorch convention).

    Reference capability: flame_pytorch.FLAME.forward (lbs) behind
    /root/reference/fireflies/entity/flame.py:115-131.
    """
    n_joints = j_regressor.shape[0]
    rot = _rodrigues(pose.reshape(n_joints, 3))  # (J, 3, 3)
    joints = j_regressor @ v_shaped  # (J, 3)

    if posedirs is not None and n_joints > 1:
        pose_feature = (rot[1:] - jnp.eye(3, dtype=rot.dtype)).reshape(-1)
        v_shaped = v_shaped + jnp.einsum("p,pvc->vc", pose_feature, posedirs)

    # Forward kinematics: world transform per joint.  parents is a static
    # numpy array so the chain unrolls at trace time (J is tiny).
    transforms = [None] * n_joints
    for j in range(n_joints):
        t_local = jnp.eye(4, dtype=v_shaped.dtype)
        parent = int(parents[j])
        offset = joints[j] - (joints[parent] if parent >= 0 else 0.0)
        t_local = t_local.at[:3, :3].set(rot[j]).at[:3, 3].set(offset)
        transforms[j] = t_local if parent < 0 else transforms[parent] @ t_local
    g = jnp.stack(transforms)  # (J, 4, 4)

    # Remove the rest-pose joint locations (SMPL's A = G - pack(G R j_rest)).
    corr = jnp.einsum("jab,jb->ja", g[:, :3, :3], joints)
    a = g.at[:, :3, 3].add(-corr)

    # Skin: v' = sum_j w_vj (A_j [v; 1]).
    t_v = jnp.einsum("vj,jab->vab", skin_weights, a)  # (V, 4, 4)
    v_h = jnp.concatenate([v_shaped, jnp.ones((v_shaped.shape[0], 1), v_shaped.dtype)], -1)
    return jnp.einsum("vab,vb->va", t_v, v_h)[:, :3]


class FlameShapeModel(ShapeModel):
    """FLAME morphable head as a randomizable entity (reference
    fireflies/entity/flame.py: 100 shape + 50 expression + 6 pose params
    through flame_pytorch's LBS, flame.py:49-66,115-131).

    FLAME's weights are proprietary external assets; pass the path to an .npz
    with `template` (V, 3), `shapedirs` (V, 3, K), and optionally `faces`.
    Pose articulation activates when the archive also carries the LBS tables:
    `posedirs` (P, V, 3) or (V, 3, P), `J_regressor` (J, V), `weights` (V, J)
    and `parents` (J,) (or `kintree_table` (2, J)).
    """

    def __init__(self, name: str, weights_path: str, n_shape: int = 100, n_expr: int = 50):
        data = np.load(weights_path, allow_pickle=True)
        template = np.asarray(data["template"], np.float32)
        shapedirs = np.asarray(data["shapedirs"], np.float32)  # (V, 3, K)
        k = min(shapedirs.shape[-1], n_shape + n_expr)
        basis = np.moveaxis(shapedirs[..., :k], -1, 0)  # (K, V, 3)
        faces = data["faces"] if "faces" in data else None
        # Reference zeroes shape params beyond the first 20 (flame.py:80,113).
        super().__init__(name, template, basis, faces, n_active=20)
        self._n_shape = n_shape
        self._n_expr = n_expr

        self._j_regressor = None
        self._skin_weights = None
        self._posedirs = None
        self._parents = None
        if "J_regressor" in data and "weights" in data:
            self._j_regressor = np.asarray(data["J_regressor"], np.float32)
            self._skin_weights = np.asarray(data["weights"], np.float32)
            if "parents" in data:
                self._parents = np.asarray(data["parents"], np.int64)
            elif "kintree_table" in data:
                self._parents = np.asarray(data["kintree_table"], np.int64)[0]
                self._parents[0] = -1
            else:
                raise ValueError(
                    f"{weights_path}: LBS tables need `parents` or `kintree_table`"
                )
            if "posedirs" in data:
                pd = np.asarray(data["posedirs"], np.float32)
                if pd.ndim == 3 and pd.shape[0] == template.shape[0]:
                    pd = np.moveaxis(pd, -1, 0)  # (V, 3, P) -> (P, V, 3)
                self._posedirs = pd

    @property
    def n_joints(self) -> int:
        return 0 if self._j_regressor is None else self._j_regressor.shape[0]

    def has_pose(self) -> bool:
        return self._j_regressor is not None

    def get_vertex_data(self, params: Array, pose: Array | None = None) -> Array:
        """Blend shapes, then (when LBS tables are loaded and `pose` is
        given) pose blendshapes + joint regression + LBS skinning —
        differentiable in both params and pose."""
        v_shaped = jnp.asarray(self._vertices) + jnp.einsum(
            "k,kvc->vc", params, jnp.asarray(self._basis)
        )
        if pose is None or self._j_regressor is None:
            return v_shaped
        return lbs(
            v_shaped,
            pose,
            jnp.asarray(self._j_regressor),
            self._parents,
            jnp.asarray(self._skin_weights),
            None if self._posedirs is None else jnp.asarray(self._posedirs),
        )

    # Reference-style alias.
    getVertexData = get_vertex_data

"""Mesh entity: vertex-level randomization (scale + animation).

Reference: fireflies/entity/mesh.py.  Pose composition for meshes is
``(T + centroid) @ R @ S @ base_world`` (mesh.py:141-156); vertices are
animated first, then transformed by the composed world
(``get_randomized_vertices``, mesh.py:158-165).

Animation sources (mesh.py:66-113,183-198):
  * stacked OBJ frames — separate train/eval (F, V, 3) tensors, frame picked
    by an AnimationSampler;
  * a procedural function ``f(vertices, t)`` with t from a float sampler —
    must be jax-traceable here.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from fireflies_tpu import sampling
from fireflies_tpu.entity.transformable import Transformable
from fireflies_tpu.utils import io as ffio
from fireflies_tpu.utils import math as ffmath

Array = jax.Array


class Mesh(Transformable):
    def __init__(self, name: str, vertices, faces=None, uvs=None, smooth=False):
        """`vertices` should be centroid-aligned (the Scene loader aligns and
        stores the centroid, reference scene.py:118-132).

        smooth=True enables Phong-interpolated vertex normals for shading
        (Mitsuba's mesh default unless face_normals=true): the renderer
        recomputes area-weighted vertex normals from the randomized
        vertices each variant, so they stay consistent under animation and
        differentiable w.r.t. the geometry."""
        super().__init__(name)
        self._vertices = np.asarray(vertices, np.float32).reshape(-1, 3)
        self._faces = (
            np.asarray(faces, np.int32).reshape(-1, 3) if faces is not None else None
        )
        self._uvs = np.asarray(uvs, np.float32) if uvs is not None else None
        self._smooth = bool(smooth)

        ones = np.ones(3, np.float32)
        self._scale_sampler: sampling.Sampler = sampling.UniformSampler.create(ones, ones)

        self._animated = False
        self._anim_data_train: Optional[np.ndarray] = None
        self._anim_data_eval: Optional[np.ndarray] = None
        self._animation_func: Optional[Callable[[Array, Array], Array]] = None
        self._animation_sampler: Optional[sampling.Sampler] = None

    # -- scale spec ------------------------------------------------------------

    def set_scale_sampler(self, sampler: sampling.Sampler) -> None:
        self._randomizable = True
        self._scale_sampler = sampler

    def scale_x(self, lo: float, hi: float) -> None:
        self._randomizable = True
        self._scale_sampler = self._scale_sampler.set_index_interval(0, lo, hi)

    def scale_y(self, lo: float, hi: float) -> None:
        self._randomizable = True
        self._scale_sampler = self._scale_sampler.set_index_interval(1, lo, hi)

    def scale_z(self, lo: float, hi: float) -> None:
        self._randomizable = True
        self._scale_sampler = self._scale_sampler.set_index_interval(2, lo, hi)

    def scale(self, minimum, maximum) -> None:
        self._randomizable = True
        self._scale_sampler = self._scale_sampler.set_sample_interval(minimum, maximum)

    # -- animation spec ----------------------------------------------------------

    def animated(self) -> bool:
        return self._animated

    def add_animation_func(self, func, min_range, max_range) -> None:
        """Procedural vertex animation: jax-traceable f(vertices, t) with
        t ~ U(min_range, max_range) (reference mesh.py:66-73)."""
        self._animation_func = func
        self._animation_sampler = sampling.UniformSampler.create(min_range, max_range)
        self._animated = True
        self._randomizable = True

    def add_animation(self, animation_data, eval_data=None) -> None:
        """Directly register stacked (F, V, 3) animation frames."""
        self._anim_data_train = np.asarray(animation_data, np.float32)
        self._anim_data_eval = (
            np.asarray(eval_data, np.float32)
            if eval_data is not None
            else self._anim_data_train
        )
        self._ensure_animation_sampler()

    def add_train_animation_from_obj(self, path: str, max_frames: int | None = None) -> None:
        self._anim_data_train = ffio.load_obj_sequence(path)
        if max_frames is not None:
            self._anim_data_train = self._anim_data_train[:max_frames]
        self._ensure_animation_sampler()

    def add_eval_animation_from_obj(self, path: str, max_frames: int | None = None) -> None:
        self._anim_data_eval = ffio.load_obj_sequence(path)
        if max_frames is not None:
            self._anim_data_eval = self._anim_data_eval[:max_frames]
        self._ensure_animation_sampler()

    def _ensure_animation_sampler(self) -> None:
        n_train = 1 if self._anim_data_train is None else len(self._anim_data_train)
        n_eval = 1 if self._anim_data_eval is None else len(self._anim_data_eval)
        self._animation_sampler = sampling.AnimationSampler.create(0, n_train, 0, n_eval)
        self._animated = True
        self._randomizable = True

    def anim_data_train(self) -> Optional[np.ndarray]:
        return self._anim_data_train

    def set_anim_data_train(self, data) -> None:
        self._anim_data_train = np.asarray(data, np.float32)

    # -- geometry access ----------------------------------------------------------

    def smooth(self) -> bool:
        return self._smooth

    def set_smooth(self, smooth: bool = True) -> None:
        self._smooth = bool(smooth)

    def faces(self) -> Optional[np.ndarray]:
        return self._faces

    def set_faces(self, faces) -> None:
        self._faces = np.asarray(faces, np.int32).reshape(-1, 3)

    def uvs(self) -> Optional[np.ndarray]:
        return self._uvs

    def get_vertices(self) -> np.ndarray:
        return self._vertices

    def set_vertices(self, vertices) -> None:
        self._vertices = np.asarray(vertices, np.float32).reshape(-1, 3)

    def num_vertices(self) -> int:
        return self._vertices.shape[0]

    # -- pure sampling ---------------------------------------------------------

    def sample_own_world(self, key: Array, step, train: bool) -> Array:
        if not self._randomizable:
            return ffmath.translation_matrix(jnp.asarray(self._centroid)) @ jnp.asarray(
                self._world
            )
        k_t, k_r, k_s = jax.random.split(key, 3)
        t = self._translation_sampler.sample(k_t, step, train)
        angles = self._rotation_sampler.sample(k_r, step, train)
        s = self._scale_sampler.sample(k_s, step, train)
        t_mat = ffmath.translation_matrix(t + jnp.asarray(self._centroid))
        r_mat = ffmath.to_mat4x4(ffmath.euler_to_rotation(angles))
        s_mat = ffmath.scale_matrix(s)
        return t_mat @ r_mat @ s_mat @ jnp.asarray(self._world)

    def sample_local_vertices(self, key: Array, step, train: bool) -> Array:
        """Animated (pre-world-transform) vertices (mesh.py:183-198)."""
        if not self._animated:
            return jnp.asarray(self._vertices)

        t = self._animation_sampler.sample(key, step, train)
        if self._animation_func is not None:
            return self._animation_func(jnp.asarray(self._vertices), t)

        data = self._anim_data_train if train else self._anim_data_eval
        if data is None:
            data = self._anim_data_eval if train else self._anim_data_train
        frames = jnp.asarray(data)
        idx = jnp.clip(jnp.asarray(t, jnp.int32).reshape(()), 0, frames.shape[0] - 1)
        return frames[idx]

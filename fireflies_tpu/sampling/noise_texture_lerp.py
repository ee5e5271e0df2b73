"""Procedural Perlin texture randomization (pure JAX, static shapes).

TPU-native re-design of the reference NoiseTextureLerpSampler
(fireflies/sampling/noise_texture_lerp.py): random base resolution
2^[1..6], 1-4 octaves, persistence U(0.1, 2), min-max normalized, lerping
color_a <-> color_b into a (3, H, W) texture.

The reference picks the resolution with Python RNG, which would force a
retrace per value.  Here every candidate resolution's noise layer is computed
at static shape and the octave composition selects layers with traced weights,
so the whole sampler is jit/vmap-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from fireflies_tpu.sampling.base import Sampler

Array = jax.Array

_RES_EXPONENTS = (1, 2, 3, 4, 5, 6)  # resolutions 2, 4, ..., 64
_MAX_OCTAVES = 4


def _fade(t: Array) -> Array:
    return 6 * t**5 - 15 * t**4 + 10 * t**3


def rand_perlin_2d(key: Array, shape: tuple[int, int], res: tuple[int, int]) -> Array:
    """Single-octave Perlin noise on a (H, W) grid; res must divide shape."""
    h, w = shape
    ry, rx = res
    dy, dx = h // ry, w // rx
    assert dy > 0 and dx > 0, f"res {res} exceeds shape {shape}"

    angles = 2 * jnp.pi * jax.random.uniform(key, (ry + 1, rx + 1))
    gradients = jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=-1)

    # Local fractional coordinates within each lattice cell.
    gy = (jnp.arange(h, dtype=jnp.float32) % dy) / dy
    gx = (jnp.arange(w, dtype=jnp.float32) % dx) / dx
    fy = gy[:, None]  # (H, 1)
    fx = gx[None, :]  # (1, W)

    def tile(g: Array) -> Array:
        return jnp.repeat(jnp.repeat(g, dy, axis=0), dx, axis=1)[:h, :w]

    def corner(sl_y, sl_x, off_y: float, off_x: float) -> Array:
        g = tile(gradients[sl_y, sl_x])  # (H, W, 2)
        return g[..., 0] * (fy + off_y) + g[..., 1] * (fx + off_x)

    n00 = corner(slice(0, -1), slice(0, -1), 0.0, 0.0)
    n10 = corner(slice(1, None), slice(0, -1), -1.0, 0.0)
    n01 = corner(slice(0, -1), slice(1, None), 0.0, -1.0)
    n11 = corner(slice(1, None), slice(1, None), -1.0, -1.0)

    ty = _fade(fy)
    tx = _fade(fx)
    lerp = lambda a, b, t: a + t * (b - a)
    return jnp.sqrt(2.0) * lerp(lerp(n00, n10, ty), lerp(n01, n11, ty), tx)


def rand_perlin_2d_octaves(
    key: Array,
    shape: tuple[int, int],
    res: tuple[int, int],
    octaves: int = 1,
    persistence: float = 0.5,
) -> Array:
    """Multi-octave Perlin noise (static octave count)."""
    noise = jnp.zeros(shape, jnp.float32)
    amplitude = 1.0
    ry, rx = res
    for k in range(octaves):
        sub = jax.random.fold_in(key, k)
        cry = min(ry * 2**k, max(shape[0] // 2, 1))
        crx = min(rx * 2**k, max(shape[1] // 2, 1))
        noise = noise + amplitude * rand_perlin_2d(sub, shape, (cry, crx))
        amplitude *= persistence
    return noise


class NoiseTextureLerpSampler(Sampler):
    """Random Perlin-blended texture between two colors; returns (3, H, W)."""

    color_a: Array = struct.field(default=None)
    color_b: Array = struct.field(default=None)
    texture_shape: tuple = struct.field(pytree_node=False, default=(256, 256))

    @classmethod
    def create(cls, color_a, color_b, texture_shape, eval_step_size: float = 0.01, **kw):  # type: ignore[override]
        import numpy as np

        return cls(
            min_range=np.zeros((1,), np.float32),
            max_range=np.ones((1,), np.float32),
            eval_step_size=float(eval_step_size),
            color_a=np.asarray(color_a, np.float32),
            color_b=np.asarray(color_b, np.float32),
            texture_shape=tuple(int(s) for s in texture_shape),
            **kw,
        )

    def _noise_stack(self, key: Array) -> Array:
        """(n_res, H, W): one Perlin layer per candidate resolution.

        Resolutions are clamped to half the texture size: at res == size the
        lattice spacing is one texel, every fractional coordinate is zero and
        the noise degenerates to all-zeros."""
        layers = []
        max_res = max(min(self.texture_shape[0], self.texture_shape[1]) // 2, 1)
        for i, e in enumerate(_RES_EXPONENTS):
            r = min(2**e, max_res)
            layers.append(rand_perlin_2d(jax.random.fold_in(key, i), self.texture_shape, (r, r)))
        return jnp.stack(layers)

    def sample_train(self, key: Array) -> Array:
        k_res, k_oct, k_per, k_noise = jax.random.split(key, 4)
        n_res = len(_RES_EXPONENTS)
        base_idx = jax.random.randint(k_res, (), 0, n_res)
        octaves = jax.random.randint(k_oct, (), 1, _MAX_OCTAVES + 1)
        persistence = jax.random.uniform(k_per, (), minval=0.1, maxval=2.0)

        stack = self._noise_stack(k_noise)  # (n_res, H, W)

        # Octave k of base b uses layer b+k with amplitude persistence^k.
        idx = jnp.arange(n_res)
        rel = idx - base_idx
        active = (rel >= 0) & (rel < octaves)
        weights = jnp.where(active, persistence ** rel.astype(jnp.float32), 0.0)
        tex = jnp.einsum("i,ihw->hw", weights, stack)

        lo, hi = jnp.min(tex), jnp.max(tex)
        tex = (tex - lo) / jnp.where(hi - lo == 0, 1.0, hi - lo)

        ca = jnp.asarray(self.color_a)[:, None, None]
        cb = jnp.asarray(self.color_b)[:, None, None]
        return ca + tex[None] * (cb - ca)

    def sample_eval(self, step: Array) -> Array:
        # The reference reuses the stochastic path for eval
        # (noise_texture_lerp.py:100-102); we derive a key from the step so the
        # eval sweep is deterministic and reproducible.
        return self.sample_train(jax.random.key(jnp.asarray(step, jnp.uint32)))

"""Differentiable texture sampling."""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def bilinear_sample(texture: Array, uv: Array) -> Array:
    """Sample (H, W, C) texture at (N, 2) uv in [0, 1] (u right, v up).

    Bilinear, clamped at borders; differentiable w.r.t. both texture and uv.
    """
    h, w = texture.shape[0], texture.shape[1]
    x = jnp.clip(uv[:, 0], 0.0, 1.0) * (w - 1)
    y = (1.0 - jnp.clip(uv[:, 1], 0.0, 1.0)) * (h - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)

    c00 = texture[y0i, x0i]
    c01 = texture[y0i, x1i]
    c10 = texture[y1i, x0i]
    c11 = texture[y1i, x1i]
    fx = fx[:, None]
    fy = fy[:, None]
    top = c00 * (1 - fx) + c01 * fx
    bot = c10 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def bilinear_sample_stack(textures: Array, index: Array, uv: Array) -> Array:
    """Sample per-point textures from an (M, H, W, C) stack.

    index: (N,) int32 selecting the texture per point; uv: (N, 2).
    """
    if textures.ndim != 4:
        # A (H, W, C) texture passed where a stack was meant silently
        # reinterprets H as the material axis and samples garbage.
        raise ValueError(
            f"texture stack must be (M, H, W, C); got shape {textures.shape}"
        )
    gathered = textures[index]  # (N, H, W, C) — fine for small M; renderer
    # gathers whole rows only when materials actually have textures.
    h, w = gathered.shape[1], gathered.shape[2]
    x = jnp.clip(uv[:, 0], 0.0, 1.0) * (w - 1)
    y = (1.0 - jnp.clip(uv[:, 1], 0.0, 1.0)) * (h - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    rows = jnp.arange(gathered.shape[0])
    c00 = gathered[rows, y0i, x0i]
    c01 = gathered[rows, y0i, x1i]
    c10 = gathered[rows, y1i, x0i]
    c11 = gathered[rows, y1i, x1i]
    top = c00 * (1 - fx) + c01 * fx
    bot = c10 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy

"""Differentiable texture sampling.

TPU cost model (measured, CLAUDE.md): gathers are ~per-ROW bound — a
4M-row gather costs ~23 ms regardless of row width.  Classic bilinear does
4 corner gathers per sample site; `bilinear_sample_packed` instead gathers
ONE row of a precomputed (H*W, 4C) 2x2-neighborhood table (texel + its
x/y/xy clamped neighbors), cutting per-site gather cost 4x.  The table is
built from the texture with pads/slices (fusable, differentiable — the
backward is one scatter-add into the table plus four shifted dense adds),
so gradients w.r.t. the original texture are exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def pack_neighborhood_table(texture: Array) -> Array:
    """(H, W, C) texture -> (H*W, 4C) bilinear-corner table.

    Row y*W + x holds [c(y,x), c(y,x+1), c(y+1,x), c(y+1,x+1)] with
    clamped (replicated-edge) neighbors, matching bilinear_sample's
    border clamping exactly.
    """
    h, w, c = texture.shape
    sx = jnp.concatenate([texture[:, 1:], texture[:, -1:]], axis=1)
    sy = jnp.concatenate([texture[1:], texture[-1:]], axis=0)
    sxy = jnp.concatenate([sy[:, 1:], sy[:, -1:]], axis=1)
    return jnp.concatenate([texture, sx, sy, sxy], axis=-1).reshape(h * w, 4 * c)


def _bilinear_weights(uv: Array, h: int, w: int):
    x = jnp.clip(uv[:, 0], 0.0, 1.0) * (w - 1)
    y = (1.0 - jnp.clip(uv[:, 1], 0.0, 1.0)) * (h - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    return x0i, y0i, fx, fy


def bilinear_sample_packed(table: Array, h: int, w: int, uv: Array) -> Array:
    """Bilinear sample from a pack_neighborhood_table row table.

    table: (H*W, 4C); uv: (N, 2) in [0, 1].  ONE gather per call.
    Identical results to bilinear_sample(texture, uv) (tested).
    """
    c4 = table.shape[1]
    c = c4 // 4
    x0i, y0i, fx, fy = _bilinear_weights(uv, h, w)
    row = table[y0i * w + x0i]  # (N, 4C) — the one gather
    c00 = row[:, 0 * c : 1 * c]
    c01 = row[:, 1 * c : 2 * c]
    c10 = row[:, 2 * c : 3 * c]
    c11 = row[:, 3 * c : 4 * c]
    top = c00 * (1 - fx) + c01 * fx
    bot = c10 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def pack_neighborhood_stack(textures: Array) -> Array:
    """(M, H, W, C) stack -> (M*H*W, 4C) table for bilinear_sample_stack_packed."""
    m, h, w, c = textures.shape
    return jax.vmap(pack_neighborhood_table)(textures).reshape(m * h * w, 4 * c)


def bilinear_sample_stack_packed(
    table: Array, h: int, w: int, index: Array, uv: Array
) -> Array:
    """Per-point texture-stack bilinear from a packed table; ONE gather.

    table: (M*H*W, 4C) from pack_neighborhood_stack; index: (N,) material
    texture selector; uv: (N, 2).
    """
    c4 = table.shape[1]
    c = c4 // 4
    x0i, y0i, fx, fy = _bilinear_weights(uv, h, w)
    row = table[index * (h * w) + y0i * w + x0i]
    c00 = row[:, 0 * c : 1 * c]
    c01 = row[:, 1 * c : 2 * c]
    c10 = row[:, 2 * c : 3 * c]
    c11 = row[:, 3 * c : 4 * c]
    top = c00 * (1 - fx) + c01 * fx
    bot = c10 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


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


def sample_envmap(texture: Array, dx: Array, dy: Array, dz: Array) -> Array:
    """Equirectangular environment lookup by world direction (Mitsuba
    `envmap` emitter convention: u from atan2 around +Y, v = acos(y)/pi
    with v=0 at +Y / image top).  Directions need not be unit.

    Texel (i, j) is centered at theta = pi*(i+0.5)/H, phi-u = (j+0.5)/W —
    the same cells lights.envmap_distribution importance-samples — and the
    bilinear blend WRAPS horizontally (the phi seam is continuous; a bright
    texel at column 0 must not lose half its footprint) and clamps
    vertically at the poles.

    texture: (H, W, 3); returns (N, 3) radiance.  Differentiable w.r.t.
    the texture (and the direction, away from the u seam).
    """
    inv_len = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz + 1e-20)
    x, y, z = dx * inv_len, dy * inv_len, dz * inv_len
    u = jnp.arctan2(x, -z) * (0.5 / jnp.pi) + 0.5
    vt = jnp.arccos(jnp.clip(y, -1.0, 1.0)) * (1.0 / jnp.pi)  # 0 = top (+Y)
    h, w = texture.shape[0], texture.shape[1]
    fx = u * w - 0.5
    fy = vt * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = (fx - x0)[:, None]
    ty = (fy - y0)[:, None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    x1i = jnp.mod(x0i + 1, w)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    t00 = texture[y0i, x0i]
    t01 = texture[y0i, x1i]
    t10 = texture[y1i, x0i]
    t11 = texture[y1i, x1i]
    top = t00 * (1.0 - tx) + t01 * tx
    bot = t10 * (1.0 - tx) + t11 * tx
    return top * (1.0 - ty) + bot * ty


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

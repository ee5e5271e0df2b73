"""Differentiable 2D point/line rasterization.

The 2D core that makes laser-pattern optimization possible (reference
fireflies/graphics/rasterization.py).  Functional parity:

  * rasterize_points (raster.py:7-37): per-point Gaussian splats
    g = exp(-((d^2)/sigma)^2) over the full image, points in [0, 1]^2.
  * rasterize_points_in_non_ndc (:40), rasterize_depth (:66),
    rasterize_lines (:107, point-segment distance transform),
    softor (:156) = 1 - prod(1 - x), sum (:160).

TPU-native redesign of the reference's "baked" memory-optimized variants
(raster.py:164-534): instead of scatter-writing sigma-footprint windows
(gather/scatter-heavy, bad on TPU), `softor_points` / `sum_points` compute
the *reduced* (H, W) image directly with a lax.scan over point chunks —
peak memory O(chunk x H x W) with identical results to reducing the naive
(N, H, W) stack, and XLA keeps the whole loop fused on-chip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _grid(texture_size) -> tuple[Array, Array]:
    """Pixel-center coordinate grids (gx, gy), each (H, W).

    texture_size = (H, W); gx varies along width, gy along height.
    """
    h, w = int(texture_size[0]), int(texture_size[1])
    gy, gx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij"
    )
    return gx, gy


def _point_gaussians(points_px: Array, gx: Array, gy: Array, sigma: float) -> Array:
    """(N, H, W) Gaussian splats around pixel-space points.

    Matches the reference falloff exp(-((d^2)/sigma)^2) (raster.py:31-35):
    sigma is in squared-pixel units (sigma=10..~200 typical).
    """
    dx = gx[None] - points_px[:, 0][:, None, None]
    dy = gy[None] - points_px[:, 1][:, None, None]
    d2 = dx * dx + dy * dy
    return jnp.exp(-jnp.square(d2 / sigma))


def rasterize_points(points: Array, sigma: float, texture_size) -> Array:
    """Points (N, 2) in [0, 1]^2 ((u right, v down) like the reference's
    pixel-space convention) -> (N, H, W) splat stack."""
    h, w = int(texture_size[0]), int(texture_size[1])
    pts_px = points * jnp.asarray([w, h], jnp.float32)
    gx, gy = _grid((h, w))
    return _point_gaussians(pts_px, gx, gy, sigma)


def rasterize_points_in_non_ndc(points: Array, sigma: float, texture_size) -> Array:
    """Points already in pixel space (raster.py:40-63)."""
    gx, gy = _grid(texture_size)
    return _point_gaussians(points, gx, gy, sigma)


def rasterize_depth(points: Array, depth_vals: Array, sigma: float, texture_size) -> Array:
    """Depth-scaled splats (raster.py:66-104): per-point normalized Gaussian
    times its depth value; (N, H, W)."""
    splats = rasterize_points(points, sigma, texture_size)
    peak = jnp.max(splats, axis=(1, 2), keepdims=True)
    splats = splats / jnp.where(peak == 0, 1.0, peak)
    return splats * depth_vals[:, None, None]


def rasterize_lines(lines: Array, sigma: float, texture_size) -> Array:
    """Line segments (N, 2, 2) in [0, 1]^2 -> (N, H, W) distance-transform
    splats exp(-(d^2)^2 / sigma^2) (raster.py:107-153, credits
    DifferentiableSketching)."""
    h, w = int(texture_size[0]), int(texture_size[1])
    scale = jnp.asarray([w, h], jnp.float32)
    a = lines[:, 0, :] * scale  # (N, 2)
    b = lines[:, 1, :] * scale
    gx, gy = _grid((h, w))
    px = gx[None]  # (1, H, W)
    py = gy[None]

    ax = a[:, 0][:, None, None]
    ay = a[:, 1][:, None, None]
    bx = b[:, 0][:, None, None]
    by = b[:, 1][:, None, None]

    mx = bx - ax
    my = by - ay
    pax = px - ax
    pay = py - ay
    mm = mx * mx + my * my
    t0 = (pax * mx + pay * my) / (mm + 1e-12)
    t0c = jnp.clip(t0, 0.0, 1.0)
    dx = pax - t0c * mx
    dy = pay - t0c * my
    d2 = dx * dx + dy * dy
    return jnp.exp(-(d2 * d2) / (sigma * sigma))


def softor(texture: Array, axis: int = 0, keepdims: bool = False) -> Array:
    """Differentiable union 1 - prod(1 - x) (raster.py:156-157)."""
    return 1.0 - jnp.prod(1.0 - texture, axis=axis, keepdims=keepdims)


def sum_(texture: Array, axis: int = 0, keepdims: bool = False) -> Array:
    return jnp.sum(texture, axis=axis, keepdims=keepdims)


# Reference export name (shadows builtins.sum there too, raster.py:160).
sum = sum_  # noqa: A001


# ---------------------------------------------------------------------------
# Reduced (memory-efficient) rasterizers — TPU analog of the baked_* variants
# ---------------------------------------------------------------------------


def _chunked_reduce(points: Array, sigma: float, texture_size, chunk: int, mode: str) -> Array:
    h, w = int(texture_size[0]), int(texture_size[1])
    n = points.shape[0]
    chunk = max(min(chunk, n), 1)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    pts_px = points * jnp.asarray([w, h], jnp.float32)
    if pad:
        # Far-away padding points contribute exp(-huge) = 0.
        pts_px = jnp.concatenate(
            [pts_px, jnp.full((pad, 2), -1e6, jnp.float32)], axis=0
        )
    pts_px = pts_px.reshape(n_chunks, chunk, 2)
    gx, gy = _grid((h, w))

    if mode == "sum":
        def body(acc, pts):
            return acc + jnp.sum(_point_gaussians(pts, gx, gy, sigma), axis=0), None

        init = jnp.zeros((h, w), jnp.float32)
        out, _ = jax.lax.scan(body, init, pts_px)
        return out

    def body(acc, pts):
        g = _point_gaussians(pts, gx, gy, sigma)
        return acc * jnp.prod(1.0 - g, axis=0), None

    init = jnp.ones((h, w), jnp.float32)
    out, _ = jax.lax.scan(body, init, pts_px)
    return 1.0 - out


def sum_points(points: Array, sigma: float, texture_size, chunk: int = 64) -> Array:
    """(H, W) = sum over N splats without materializing (N, H, W).

    Drop-in result-equivalent of reference baked_sum_2 (raster.py:240-318).
    """
    return _chunked_reduce(points, sigma, texture_size, chunk, "sum")


def softor_points(points: Array, sigma: float, texture_size, chunk: int = 64) -> Array:
    """(H, W) = softor over N splats without materializing (N, H, W).

    Drop-in result-equivalent of reference baked_softor_2 (raster.py:395-472).
    """
    return _chunked_reduce(points, sigma, texture_size, chunk, "softor")


def subsampled_point_raster(
    points: Array, n_subsamples: int, sigma: float, texture_size
) -> list[Array]:
    """Multi-scale pyramid of softor rasters (raster.py:538-561): n levels at
    halving resolutions, sigma scaled accordingly; returns list of (Hk, Wk)."""
    h, w = int(texture_size[0]), int(texture_size[1])
    out = []
    for k in range(n_subsamples):
        hk = max(h >> k, 1)
        wk = max(w >> k, 1)
        sk = sigma / (4.0**k)  # d^2 scales by 4 per halving; sigma is in px^2
        out.append(softor_points(points, sk, (hk, wk)))
    return out

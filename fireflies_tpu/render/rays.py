"""Camera / sensor ray generation.

Replaces Mitsuba's `sensor.sample_ray` grid (reference
fireflies/graphics/depth.py:139-160).  Convention: camera space looks down
-Z, +Y up, x_fov in degrees with square pixels (tan_y scaled by H/W); pixel
(0, 0) is the top-left of the image.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from fireflies_tpu.render.types import Camera
from fireflies_tpu.utils import math as ffmath

Array = jax.Array


def camera_rays(
    camera: Camera,
    width: int,
    height: int,
    key: Array | None = None,
    y_offset: Array | int = 0,
    full_height: int | None = None,
):
    """Primary rays for a width x height film.

    Returns (origins, directions): ((H*W, 3), (H*W, 3)); directions are unit,
    world-space, row-major pixel order.  With `key`, pixel positions are
    jittered uniformly within each pixel (anti-aliasing); otherwise centered.

    `y_offset`/`full_height` render a horizontal BAND of a larger film:
    `height` rows starting at pixel row `y_offset` of a `full_height`-row
    film (same NDC mapping as the full film).  y_offset may be traced — the
    band-parallel path derives it from `jax.lax.axis_index` under shard_map.
    """
    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)
    px, py = jnp.meshgrid(xs, ys)  # (H, W)
    px = px.reshape(-1)
    py = py.reshape(-1)

    if key is not None:
        jit_xy = jax.random.uniform(key, (px.shape[0], 2))
        px = px + jit_xy[:, 0]
        py = py + jit_xy[:, 1]
    else:
        px = px + 0.5
        py = py + 0.5

    py = py + jnp.asarray(y_offset, jnp.float32)
    ndc = pixel_to_ndc(px, py, width, full_height or height)
    return rays_from_ndc(camera, ndc)


@functools.lru_cache(maxsize=32)
def _tile_permutation(width: int, height: int, tile_w: int, tile_h: int):
    """(perm, inv_perm) mapping row-major pixel order <-> tile-major order.

    The Pallas intersection kernels prune triangle clusters per 2048-ray
    tile; consecutive rays must be spatially LOCAL for that to bite.  In
    row-major order a 2048-ray tile is four full-width image rows (a frustum
    slab crossing the whole scene); in (tile_w x tile_h)-block order it is a
    narrow cone.  Measured ~2x on interior scenes.
    """
    import numpy as np

    ys, xs = np.mgrid[0:height, 0:width]
    tile_idx = (ys // tile_h) * (-(-width // tile_w)) + (xs // tile_w)
    within = (ys % tile_h) * tile_w + (xs % tile_w)
    key = tile_idx.astype(np.int64) * (tile_w * tile_h) + within
    perm = np.argsort(key.reshape(-1), kind="stable")
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    # Cache HOST arrays: caching jnp arrays would capture a tracer when the
    # first call happens inside a trace (leak), and builder-held device
    # arrays degrade the axon tunnel anyway.
    return perm.astype(np.int32), inv.astype(np.int32)


def camera_rays_tiled(
    camera: Camera,
    width: int,
    height: int,
    key: Array | None = None,
    tile: tuple[int, int] = (128, 16),
    y_offset: Array | int = 0,
    full_height: int | None = None,
):
    """Primary rays in tile-major order; returns (o, d, inv_perm).

    Recover row-major pixel order with `unpermute_rows(x, inv_perm, w, h)`
    (or `x[inv_perm]` when inv_perm is an index array).

    When the film divides evenly into tiles, pixel coordinates are computed
    ARITHMETICALLY in tile-major order and inv_perm is None — TPU gathers
    are per-row bound (~23 ms / 4M rows), so the permutation gathers on
    o/d/radiance were costing more than an intersection pass; the inverse
    is then a pure reshape/transpose (unpermute_rows).

    `y_offset`/`full_height`: render a `height`-row BAND starting at pixel
    row y_offset of a full_height-row film (see camera_rays) — the
    band-parallel render path (parallel.render_tile_parallel).  Because
    tile-major order over the full film enumerates 16-row bands first, the
    band's rays are exactly rows [y_offset*W, (y_offset+height)*W) of the
    full film's tile-major stream when y_offset is a multiple of tile[1].
    """
    tw, th = tile
    if width % tw == 0 and height % th == 0:
        n = width * height
        n_tx = width // tw
        i = jnp.arange(n, dtype=jnp.int32)
        tile_id = i // (tw * th)
        within = i % (tw * th)
        px = ((tile_id % n_tx) * tw + within % tw).astype(jnp.float32)
        py = ((tile_id // n_tx) * th + within // tw).astype(jnp.float32)
        if key is not None:
            jit_xy = jax.random.uniform(key, (n, 2))
            px = px + jit_xy[:, 0]
            py = py + jit_xy[:, 1]
        else:
            px = px + 0.5
            py = py + 0.5
        py = py + jnp.asarray(y_offset, jnp.float32)
        o, d = rays_from_ndc(
            camera, pixel_to_ndc(px, py, width, full_height or height)
        )
        return o, d, None
    perm, inv = _tile_permutation(width, height, tile[0], tile[1])
    o, d = camera_rays(
        camera, width, height, key=key, y_offset=y_offset, full_height=full_height
    )
    return o[jnp.asarray(perm)], d[jnp.asarray(perm)], jnp.asarray(inv)


def unpermute_rows(
    x: Array,
    inv_perm: Array | None,
    width: int,
    height: int,
    tile: tuple[int, int] = (128, 16),
) -> Array:
    """Tile-major per-ray results -> row-major pixel order.

    Inverse of camera_rays_tiled's ordering: a reshape/transpose when the
    ordering was arithmetic (inv_perm None), else the index gather.
    """
    if inv_perm is not None:
        return x[inv_perm]
    tw, th = tile
    n_tx = width // tw
    n_ty = height // th
    lead = x.shape[1:]
    y = x.reshape(n_ty, n_tx, th, tw, *lead)
    y = jnp.swapaxes(y, 1, 2)  # (n_ty, th, n_tx, tw, ...)
    return y.reshape(width * height, *lead)


def pixel_to_ndc(px: Array, py: Array, width: int, height: int) -> Array:
    """Continuous pixel coords -> NDC (x right, y up, both [-1, 1])."""
    x = px / width * 2.0 - 1.0
    y = 1.0 - py / height * 2.0
    return jnp.stack([x, y], axis=-1)


def rays_from_ndc(camera: Camera, ndc: Array):
    """NDC points (N, 2) -> world-space rays through them."""
    tan_half = jnp.tan(jnp.deg2rad(camera.fov) / 2.0)
    d_local = jnp.stack(
        [
            ndc[:, 0] * tan_half,
            ndc[:, 1] * tan_half,
            -jnp.ones_like(ndc[:, 0]),
        ],
        axis=-1,
    )
    d_world = ffmath.transform_directions(d_local, camera.to_world)
    d_world = ffmath.normalize_vectors(d_world)
    origin = camera.to_world[:3, 3]
    o = jnp.broadcast_to(origin, d_world.shape)
    return o, d_world


def points_to_ndc(camera: Camera, points: Array) -> Array:
    """World points (N, 3) -> NDC (N, 3): x, y in [-1, 1], z = view-space
    depth (positive in front of the camera).

    Functional equivalent of the reference Camera.pointsToNDC
    (projection/camera.py:67-74) without the matrix inverse: transforms into
    view space and perspective-divides.
    """
    view = ffmath.transform_points(points, jnp.linalg.inv(camera.to_world))
    depth = -view[:, 2]
    tan_half = jnp.tan(jnp.deg2rad(camera.fov) / 2.0)
    safe = jnp.where(jnp.abs(depth) < 1e-8, 1e-8, depth)
    x = view[:, 0] / (safe * tan_half)
    y = view[:, 1] / (safe * tan_half)
    return jnp.stack([x, y, depth], axis=-1)


def ndc_to_pixel(ndc: Array, width: int, height: int) -> Array:
    """NDC (N, 2+) -> continuous pixel coords (N, 2) as (px, py)."""
    px = (ndc[:, 0] + 1.0) * 0.5 * width
    py = (1.0 - ndc[:, 1]) * 0.5 * height
    return jnp.stack([px, py], axis=-1)

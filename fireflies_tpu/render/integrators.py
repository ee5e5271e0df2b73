"""AOV integrators: depth, segmentation, laser-dot depth.

Functional replacements for the reference's Mitsuba-bound integrators
(fireflies/graphics/depth.py):
  * render_depth       <- from_camera_non_wrapped (depth.py:49-87): primary
                          visibility distance `si.t`, 0 on miss (depth.py:84)
  * render_segmentation<- get_segmentation_from_camera (depth.py:89-125):
                          per-pixel mesh id (+1; 0 = background) — the
                          shape-pointer reinterpret hack becomes a plain
                          face_mesh lookup here
  * render_from_laser  <- from_laser (depth.py:9-31, dead in the snapshot;
                          implemented as intended): intersect laser rays with
                          the scene, project hits into the camera, splat a
                          sparse depth image
  * random_depth_maps  <- depth.py:169-190: N randomized variants' depth maps
                          (feeds the SMARTY variance map)
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from fireflies_tpu.render.intersect import closest_hit, hit_attributes
from fireflies_tpu.render.rays import (
    camera_rays,
    camera_rays_tiled,
    ndc_to_pixel,
    points_to_ndc,
    unpermute_rows,
)
from fireflies_tpu.render.types import RenderConfig, RenderScene

Array = jax.Array


def render_depth(
    scene: RenderScene, config: RenderConfig, key: Array | None = None
) -> Array:
    """(H, W) primary-visibility depth (distance along unit ray); 0 on miss."""
    o, d, inv_perm = camera_rays_tiled(scene.camera, config.width, config.height, key=key)
    hit = closest_hit(
        o, d, scene.geometry, tri_chunk=config.tri_chunk, backend=config.backend,
        shared_origin=scene.camera.to_world[:3, 3],
    )
    depth = unpermute_rows(
        jnp.where(hit.valid, hit.t, 0.0), inv_perm, config.width, config.height
    )
    return depth.reshape(config.height, config.width)


def render_depth_differentiable(
    scene: RenderScene, config: RenderConfig, key: Array | None = None
) -> Array:
    """Depth with gradients w.r.t. vertices (detached traversal + re-derived t)."""
    o, d, inv_perm = camera_rays_tiled(scene.camera, config.width, config.height, key=key)
    hit = closest_hit(
        o, d, scene.geometry, tri_chunk=config.tri_chunk, backend=config.backend,
        shared_origin=scene.camera.to_world[:3, 3],
    )
    hit = jax.tree.map(jax.lax.stop_gradient, hit)
    attrs = hit_attributes(o, d, hit, scene.geometry)
    depth = unpermute_rows(
        jnp.where(hit.valid, attrs["t"], 0.0), inv_perm, config.width,
        config.height,
    )
    return depth.reshape(config.height, config.width)


def render_segmentation(scene: RenderScene, config: RenderConfig) -> Array:
    """(H, W) int32 mesh-id map; 0 = background, mesh ids start at 1."""
    o, d, inv_perm = camera_rays_tiled(scene.camera, config.width, config.height)
    hit = closest_hit(
        o, d, scene.geometry, tri_chunk=config.tri_chunk, backend=config.backend,
        shared_origin=scene.camera.to_world[:3, 3],
    )
    prim = jnp.maximum(hit.prim, 0)
    mesh_id = scene.geometry.face_mesh[prim] + 1
    seg = unpermute_rows(
        jnp.where(hit.valid, mesh_id, 0), inv_perm, config.width, config.height
    )
    return seg.reshape(config.height, config.width).astype(jnp.int32)


def render_shape_index(scene: RenderScene, config: RenderConfig) -> Array:
    """Alias matching the reference naming (depth.py:89)."""
    return render_segmentation(scene, config)


def render_from_laser(
    scene: RenderScene,
    laser_origins: Array,
    laser_dirs: Array,
    config: RenderConfig,
    sigma: float = 1.0,
):
    """Sparse structured-light depth: cast laser rays, project hits to the
    camera, return (points_ndc (B, 3), depth (B,), valid (B,), image (H, W)).

    `image` splats per-beam camera-space depth with Gaussian footprints of
    std `sigma` pixels (differentiable; reference intent depth.py:9-31).
    """
    hit = closest_hit(laser_origins, laser_dirs, scene.geometry, tri_chunk=config.tri_chunk, backend=config.backend)
    hit_d = jax.tree.map(jax.lax.stop_gradient, hit)
    attrs = hit_attributes(laser_origins, laser_dirs, hit_d, scene.geometry)
    p = attrs["position"]

    ndc = points_to_ndc(scene.camera, p)
    in_view = (jnp.abs(ndc[:, 0]) <= 1.0) & (jnp.abs(ndc[:, 1]) <= 1.0) & (ndc[:, 2] > 0)
    valid = hit.valid & in_view

    pix = ndc_to_pixel(ndc, config.width, config.height)
    xs = jnp.arange(config.width, dtype=jnp.float32)
    ys = jnp.arange(config.height, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W)
    dx = gx[None] - pix[:, 0][:, None, None]
    dy = gy[None] - pix[:, 1][:, None, None]
    w = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
    w = jnp.where(valid[:, None, None], w, 0.0)
    image = jnp.max(w * ndc[:, 2][:, None, None], axis=0)
    return ndc, ndc[:, 2], valid, image


def random_depth_maps(
    randomize_fn: Callable[[Array, Array], RenderScene],
    key: Array,
    config: RenderConfig,
    n_maps: int = 16,
) -> Array:
    """(n_maps, H, W) depth maps over randomized variants (reference
    depth.py:169-190).  `randomize_fn(key, step) -> RenderScene`."""
    keys = jax.random.split(key, n_maps)
    steps = jnp.arange(n_maps)

    def one(k, s):
        return render_depth(randomize_fn(k, s), config)

    return jax.lax.map(lambda ks: one(ks[0], ks[1]), (keys, steps))

"""Laser: the structured-light point-pattern projector.

Reference: fireflies/projection/laser.py.  A bundle of laser rays attached to
the projector entity, with pattern generators, NDC round-trips, FOV clamping,
out-of-bounds respawn, texture generation, epipolar-line rendering, and YAML
save/load.  Everything the reference intended (several of its methods crash
via the empty transforms module / `_fireflies` attribute chain,
laser.py:163-177,257-260 — implemented working here).

Design: module-level pure functions operate on ray arrays (jit/grad-safe —
pattern optimization differentiates through them); the Laser class is the
thin pythonic wrapper holding `rays` state.

Ray convention: laser-local space looks down -Z (matching the camera);
generators return unit direction vectors (B, 3).
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np
import yaml

import jax
import jax.numpy as jnp

from fireflies_tpu import sampling
from fireflies_tpu.entity.transformable import Transformable
from fireflies_tpu.graphics import rasterization
from fireflies_tpu.projection.camera import (
    Camera,
    directions_to_ndc,
    ndc_to_directions,
)
from fireflies_tpu.utils import math as ffmath

Array = jax.Array


# ---------------------------------------------------------------------------
# Pattern generators (reference laser.py:18-145)
# ---------------------------------------------------------------------------


def generate_uniform_rays(
    intra_ray_angle: float, num_beams_x: int, num_beams_y: int
) -> Array:
    """Angle-equispaced grid (laser.py:18-37): direction
    (tan((i - c) a), tan((j - c) a), -1), normalized."""
    ix = jnp.arange(num_beams_x, dtype=jnp.float32) - (num_beams_x - 1) / 2.0
    iy = jnp.arange(num_beams_y, dtype=jnp.float32) - (num_beams_y - 1) / 2.0
    tx = jnp.tan(ix * intra_ray_angle)
    ty = jnp.tan(iy * intra_ray_angle)
    gx, gy = jnp.meshgrid(tx, ty, indexing="ij")
    d = jnp.stack([gx.ravel(), gy.ravel(), -jnp.ones(num_beams_x * num_beams_y)], -1)
    return ffmath.normalize_vectors(d)


def generate_uniform_rays_by_count(
    num_beams_x: int, num_beams_y: int, fov_deg: float
) -> Array:
    """Pixel-grid pattern: beams at cell centers of an (nx, ny) NDC grid
    (laser.py:39-66, fixed)."""
    xs = (jnp.arange(num_beams_x, dtype=jnp.float32) + 0.5) / num_beams_x * 2.0 - 1.0
    ys = (jnp.arange(num_beams_y, dtype=jnp.float32) + 0.5) / num_beams_y * 2.0 - 1.0
    gx, gy = jnp.meshgrid(xs, ys, indexing="ij")
    ndc = jnp.stack([gx.ravel(), gy.ravel()], -1)
    return ndc_to_directions(ndc, fov_deg)


def generate_random_rays(key: Array, num_beams: int, fov_deg: float) -> Array:
    """Uniform-random NDC points -> rays (laser.py:68-92; the reference
    clusters them near the center /10 — we cover the full NDC square, which
    is what its own out-of-bounds respawn produces anyway)."""
    ndc = jax.random.uniform(key, (num_beams, 2), minval=-1.0, maxval=1.0)
    return ndc_to_directions(ndc, fov_deg)


def generate_blue_noise_rays(
    image_size_x: int,
    image_size_y: int,
    num_beams: int,
    fov_deg: float,
    seed: int | None = None,
    radius_type: str = "default",
) -> Array:
    """Poisson-disk pattern (laser.py:94-145): radius sqrt(XY / (pi N)) * 1.25
    on an (X, Y) grid, host-side Bridson, mapped into NDC then rays.
    `radius_type` passes through to `sampling.bridson` ("default" annulus or
    the reference's "normDist" variant, poisson.py:64-68)."""
    radius = math.sqrt((image_size_x * image_size_y) / (math.pi * num_beams))
    radius += radius / 4.0
    radius_map = np.full((image_size_y, image_size_x), radius, np.float32)
    _, samples = sampling.bridson(radius_map, seed=seed, radius_type=radius_type)
    # (y, x) pixels -> NDC in [-1, 1].
    ndc = jnp.stack(
        [
            jnp.asarray(samples[:, 1], jnp.float32) / image_size_x * 2.0 - 1.0,
            jnp.asarray(samples[:, 0], jnp.float32) / image_size_y * 2.0 - 1.0,
        ],
        axis=-1,
    )
    return ndc_to_directions(ndc, fov_deg)


# ---------------------------------------------------------------------------
# Pure ray ops
# ---------------------------------------------------------------------------


def rays_to_world(rays_local: Array, to_world: Array) -> Array:
    return ffmath.normalize_vectors(ffmath.transform_directions(rays_local, to_world))


def origin_per_ray(to_world: Array, n: int) -> Array:
    return jnp.broadcast_to(to_world[:3, 3], (n, 3))


def clamp_rays_to_fov(rays_local: Array, fov_deg: float, clamp_val: float = 0.95) -> Array:
    """Pull out-of-frustum beams back to the NDC border (laser.py:199-206)."""
    ndc = directions_to_ndc(rays_local, fov_deg)
    ndc = jnp.clip(ndc, -clamp_val, clamp_val)
    return ndc_to_directions(ndc, fov_deg)


def respawn_out_of_bounds(key: Array, rays_local: Array, fov_deg: float) -> Array:
    """Replace beams outside the NDC square with fresh uniform ones
    (laser.py:208-231, functional)."""
    ndc = directions_to_ndc(rays_local, fov_deg)
    oob = jnp.any(jnp.abs(ndc) >= 1.0, axis=-1)
    fresh = jax.random.uniform(key, ndc.shape, minval=-1.0, maxval=1.0)
    ndc_new = jnp.where(oob[:, None], fresh, ndc)
    return ndc_to_directions(ndc_new, fov_deg)


def respawn_out_of_camera(
    key: Array, rays_local: Array, camera_ndc: Array, fov_deg: float
) -> Array:
    """Respawn beams whose *camera-space* NDC left the view
    (laser.py:233-260)."""
    oob = jnp.any(jnp.abs(camera_ndc[:, :2]) >= 1.0, axis=-1)
    fresh = jax.random.uniform(key, (rays_local.shape[0], 2), minval=-1.0, maxval=1.0)
    ndc = directions_to_ndc(rays_local, fov_deg)
    ndc_new = jnp.where(oob[:, None], fresh, ndc)
    return ndc_to_directions(ndc_new, fov_deg)


def rays_to_texture(
    rays_local: Array, fov_deg: float, sigma: float, texture_size
) -> Array:
    """(B, H, W) Gaussian splat stack of the beam pattern
    (laser.py:292-296: NDC -> [0,1] -> rasterize_points)."""
    ndc = directions_to_ndc(rays_local, fov_deg)
    pts01 = jnp.stack([(ndc[:, 0] + 1.0) * 0.5, (1.0 - ndc[:, 1]) * 0.5], -1)
    return rasterization.rasterize_points(pts01, sigma, texture_size)


def rays_to_texture_summed(
    rays_local: Array, fov_deg: float, sigma: float, texture_size, chunk: int = 64
) -> Array:
    """(H, W) summed pattern texture without the (B, H, W) intermediate —
    what main.py:64-77 computes, as one fused reduction."""
    ndc = directions_to_ndc(rays_local, fov_deg)
    pts01 = jnp.stack([(ndc[:, 0] + 1.0) * 0.5, (1.0 - ndc[:, 1]) * 0.5], -1)
    return rasterization.sum_points(pts01, sigma, texture_size, chunk=chunk)


def rays_to_texture_rgb(
    rays_local: Array,
    fov_deg: float,
    sigma: float,
    texture_size,
    color=(0.0, 1.0, 0.0),
    blur_kernel: int = 5,
    blur_sigma: float = 3.0,
    chunk: int = 64,
) -> Array:
    """The full projector-texture pipeline of the reference main loop
    (main.py:64-77): summed beam splats -> gaussian blur -> colored RGB
    texture (H, W, 3), ready for params["tex.data"].  Differentiable w.r.t.
    the beam directions."""
    from fireflies_tpu.postprocessing import gaussian_blur2d  # noqa: PLC0415

    tex = rays_to_texture_summed(rays_local, fov_deg, sigma, texture_size, chunk=chunk)
    if blur_kernel and blur_sigma > 0:
        tex = gaussian_blur2d(tex, (blur_kernel, blur_kernel), (blur_sigma, blur_sigma))
    color = jnp.asarray(color, jnp.float32)
    return tex[..., None] * color[None, None, :]


def rays_to_beam_params(
    rays_local: Array,
    fov_deg: float,
    sigma: float = 10.0,
    texture_size=(256, 256),
    color=(0.0, 1.0, 0.0),
) -> dict:
    """Analytic-projector param entries for SceneBridge.assemble.

    The texture route (rays_to_texture_rgb -> params["tex.data"]) rasterizes
    the beam splats to a grid the renderer then GATHERS from at every NEE
    vertex; these entries instead carry the (K, 2) projector-NDC beam
    coordinates so the emitter evaluates the continuous splat field
    analytically (render/types.Projector beam mode) — no gather, no
    rasterization, exact beam-direction gradients.  `sigma`/`texture_size`
    keep the same squared-pixel falloff metric as the texture route."""
    return {
        "tex.beams": directions_to_ndc(rays_local, fov_deg),
        "tex.beam_sigma": jnp.asarray(sigma, jnp.float32),
        "tex.beam_color": jnp.asarray(color, jnp.float32),
        "tex.beam_hw": (int(texture_size[0]), int(texture_size[1])),
    }


def epipolar_line_segments(
    rays_local: Array,
    laser_to_world: Array,
    camera_to_world: Array,
    camera_fov_deg: float,
    near: float,
    far: float,
):
    """Near/far beam endpoints projected into camera NDC: (B, 2, 2) segments
    (working version of laser.py:298-325)."""
    n = rays_local.shape[0]
    rays_w = rays_to_world(rays_local, laser_to_world)
    o = origin_per_ray(laser_to_world, n)
    from fireflies_tpu.projection.camera import points_to_ndc  # local import

    p_near = points_to_ndc(o + near * rays_w, camera_to_world, camera_fov_deg)[:, :2]
    p_far = points_to_ndc(o + far * rays_w, camera_to_world, camera_fov_deg)[:, :2]
    return jnp.stack([p_near, p_far], axis=1)


# ---------------------------------------------------------------------------
# Pythonic wrapper
# ---------------------------------------------------------------------------


class Laser(Camera):
    # Re-export static generators under the reference's names.
    generate_uniform_rays = staticmethod(generate_uniform_rays)
    generate_uniform_rays_by_count = staticmethod(generate_uniform_rays_by_count)
    generate_random_rays = staticmethod(generate_random_rays)
    generate_blue_noise_rays = staticmethod(generate_blue_noise_rays)

    def __init__(
        self,
        transformable: Transformable,
        ray_directions: Array,
        fov: float = 30.0,
        near_clip: float = 0.01,
        far_clip: float = 1000.0,
    ):
        super().__init__(transformable, fov, near_clip, far_clip)
        self._rays = jnp.asarray(ray_directions, jnp.float32)

    # -- ray state -------------------------------------------------------------

    def local_rays(self) -> Array:
        return self._rays

    def set_rays(self, rays: Array) -> None:
        self._rays = jnp.asarray(rays, jnp.float32)

    def rays(self, params: Optional[dict] = None) -> Array:
        """World-space unit ray directions (laser.py:163-169, fixed)."""
        return rays_to_world(self._rays, self.world(params))

    def origin_per_ray(self, params: Optional[dict] = None) -> Array:
        return origin_per_ray(self.world(params), self._rays.shape[0])

    originPerRay = origin_per_ray

    def normalize_rays(self) -> None:
        self._rays = ffmath.normalize_vectors(self._rays)

    # -- NDC round-trips -------------------------------------------------------

    def project_rays_to_ndc(self) -> Array:
        return directions_to_ndc(self._rays, self._fov)

    projectRaysToNDC = project_rays_to_ndc

    def project_ndc_points_to_rays(self, ndc: Array) -> Array:
        return ndc_to_directions(ndc, self._fov)

    projectNDCPointsToWorld = project_ndc_points_to_rays

    def clamp_to_fov(self, clamp_val: float = 0.95) -> None:
        self._rays = clamp_rays_to_fov(self._rays, self._fov, clamp_val)

    def randomize_laser_out_of_bounds(self, key: Array) -> None:
        self._rays = respawn_out_of_bounds(key, self._rays, self._fov)

    def randomize_camera_out_of_bounds(self, key: Array, camera_ndc: Array) -> None:
        self._rays = respawn_out_of_camera(key, self._rays, camera_ndc, self._fov)

    # -- texture / epipolar ----------------------------------------------------

    def generate_texture(self, sigma: float, texture_size) -> Array:
        return rays_to_texture(self._rays, self._fov, sigma, texture_size)

    generateTexture = generate_texture

    def generate_texture_summed(self, sigma: float, texture_size) -> Array:
        return rays_to_texture_summed(self._rays, self._fov, sigma, texture_size)

    def generate_texture_rgb(self, sigma: float, texture_size, **kw) -> Array:
        return rays_to_texture_rgb(self._rays, self._fov, sigma, texture_size, **kw)

    def render_epipolar_lines(
        self, camera: Camera, sigma: float, texture_size, params: Optional[dict] = None
    ) -> Array:
        segs_ndc = epipolar_line_segments(
            self._rays,
            self.world(params),
            camera.world(params),
            camera.fov(),
            self._near_clip,
            self._far_clip,
        )
        segs01 = (segs_ndc * jnp.asarray([1.0, -1.0]) + 1.0) * 0.5  # y down
        return rasterization.rasterize_lines(segs01, sigma, texture_size)

    # -- persistence (laser.py:327-336) ---------------------------------------

    def save(self, filepath: str) -> None:
        data = {
            "rays": np.asarray(self._rays).tolist(),
            "fov": self._fov,
            "near_clip": self._near_clip,
            "far_clip": self._far_clip,
        }
        with open(filepath, "w") as f:
            yaml.safe_dump(data, f)

    @classmethod
    def load(cls, filepath: str, transformable: Transformable) -> "Laser":
        with open(filepath) as f:
            data = yaml.safe_load(f)
        return cls(
            transformable,
            jnp.asarray(data["rays"], jnp.float32),
            fov=float(data["fov"]),
            near_clip=float(data["near_clip"]),
            far_clip=float(data["far_clip"]),
        )

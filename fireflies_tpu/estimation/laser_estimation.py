"""Laser pattern initialization: RANDOM / POISSON / GRID / SMARTY.

Working re-design of the reference's fireflies/utils/laser_estimation.py
(its SMARTY path crashes in the snapshot — "Doesnt work, IDK why",
laser_estimation.py:298; rebuilt here as intended):

  * probability_distribution_from_depth_maps (:25): std over randomized
    depth maps + uniform weight
  * points_from_probability_distribution (:35): multinomial w/o replacement
    (Gumbel top-k here — vectorized, jit-safe)
  * generate_epipolar_constraints (:187): projector frustum corners ->
    camera NDC -> convex hull -> filled polygon mask (own monotone-chain
    hull + half-plane rasterization; no cv2/scipy)
  * laser_from_ndc_points (:148): camera rays through chosen pixels
    intersected with the mean-depth plane, re-aimed from the laser origin
  * initialize_laser (:253): the four-mode dispatcher
"""

from __future__ import annotations

import dataclasses
import math
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from fireflies_tpu import sampling
from fireflies_tpu.projection import laser as laser_mod
from fireflies_tpu.projection.laser import Laser
from fireflies_tpu.render import integrators
from fireflies_tpu.render.rays import rays_from_ndc
from fireflies_tpu.render.types import Camera as RenderCamera
from fireflies_tpu.render.types import RenderConfig
from fireflies_tpu.utils import intersections
from fireflies_tpu.utils import math as ffmath

Array = jax.Array


@dataclasses.dataclass
class LaserConfig:
    """Pattern-initialization settings (reference `config` fields consumed at
    laser_estimation.py:274,306,311,330-331,348)."""

    n_beams: int = 150
    n_depthmaps: int = 16
    variational_epsilon: float = 1e-3
    smarty_min_radius: float = 4.0
    smarty_max_radius: float = 32.0
    image_size: tuple[int, int] = (256, 256)  # (W, H) sampling-map resolution
    save_images: bool = False
    save_dir: str = "."


def probability_distribution_from_depth_maps(
    depth_maps: Array, uniform_weight: float = 0.0
) -> Array:
    """(N, H, W) depth maps -> (H, W) variance map + uniform floor."""
    return jnp.std(depth_maps, axis=0) + uniform_weight


def points_from_probability_distribution(
    prob: Array, num_samples: int, key: Array
) -> Array:
    """Flat multinomial sampling *without replacement* via Gumbel top-k."""
    p = prob.reshape(-1)
    logp = jnp.log(jnp.maximum(p, 1e-20))
    g = jax.random.gumbel(key, logp.shape)
    _, idx = jax.lax.top_k(logp + g, num_samples)
    return idx


# ---------------------------------------------------------------------------
# Epipolar constraints
# ---------------------------------------------------------------------------


def _convex_hull_2d(points: np.ndarray) -> np.ndarray:
    """Monotone-chain convex hull (host-side; replaces scipy.ConvexHull for
    the <= 8 frustum-corner points)."""
    pts = np.unique(np.asarray(points, np.float64), axis=0)
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]
    if len(pts) <= 2:
        return pts

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list[np.ndarray] = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list[np.ndarray] = []
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return np.asarray(lower[:-1] + upper[:-1])


def fill_convex_polygon(vertices_px: np.ndarray, size_hw: tuple[int, int]) -> np.ndarray:
    """Rasterize a CCW convex polygon into a binary (H, W) mask (replaces
    cv2.fillPoly for the constraint map)."""
    h, w = size_hw
    gy, gx = np.mgrid[0:h, 0:w]
    mask = np.ones((h, w), bool)
    n = len(vertices_px)
    for i in range(n):
        x0, y0 = vertices_px[i]
        x1, y1 = vertices_px[(i + 1) % n]
        # Inside = left of every edge for a CCW polygon.
        cross = (x1 - x0) * (gy - y0) - (y1 - y0) * (gx - x0)
        mask &= cross >= 0
    return mask.astype(np.float32)


def generate_epipolar_constraints(
    camera: RenderCamera,
    projector_to_world: Array,
    projector_fov_deg: float,
    projector_far: float,
    image_size_hw: tuple[int, int],
) -> np.ndarray:
    """(H, W) binary mask of the camera-image region reachable by any
    projector beam (reference laser_estimation.py:187-250)."""
    corners_ndc = jnp.asarray(
        [[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]], jnp.float32
    )
    dirs = laser_mod.ndc_to_directions(corners_ndc, projector_fov_deg)
    dirs_w = laser_mod.rays_to_world(dirs, projector_to_world)
    origin = projector_to_world[:3, 3]
    far_points = origin[None, :] + projector_far * dirs_w

    from fireflies_tpu.render.rays import points_to_ndc as cam_points_to_ndc

    ndc = cam_points_to_ndc(camera, far_points)
    h, w = image_size_hw
    px = (np.asarray(ndc[:, 0]) + 1.0) * 0.5 * w
    py = (1.0 - np.asarray(ndc[:, 1])) * 0.5 * h
    pts = np.stack([px, py], axis=-1)
    hull = _convex_hull_2d(pts)
    if len(hull) < 3:
        return np.ones((h, w), np.float32)
    return fill_convex_polygon(hull, (h, w))


# ---------------------------------------------------------------------------
# Ray estimation from chosen camera pixels
# ---------------------------------------------------------------------------


def laser_from_ndc_points(
    camera: RenderCamera,
    laser_origin: Array,
    mean_depth: Array,
    chosen_points: Array,
    image_size_hw: tuple[int, int],
) -> Array:
    """World-space laser directions hitting the same scene points the chosen
    camera pixels see, assuming a mean-depth plane
    (reference laser_estimation.py:148-174)."""
    h, w = image_size_hw
    py = (chosen_points // w).astype(jnp.float32) + 0.5
    px = (chosen_points % w).astype(jnp.float32) + 0.5
    ndc = jnp.stack([px / w * 2.0 - 1.0, 1.0 - py / h * 2.0], axis=-1)
    o, d = rays_from_ndc(camera, ndc)

    cam_fwd = -camera.to_world[:3, 2]
    plane_origin = camera.to_world[:3, 3] + cam_fwd * mean_depth
    plane_normal = -cam_fwd
    world_points = intersections.ray_plane(o, d, plane_origin, plane_normal)

    laser_dir = world_points - laser_origin[None, :]
    return ffmath.normalize_vectors(laser_dir)


# ---------------------------------------------------------------------------
# The dispatcher
# ---------------------------------------------------------------------------


def initialize_laser(
    scene,
    bridge,
    config: LaserConfig,
    mode: str = "GRID",
    key: Array | None = None,
    projector_fov: float = 30.0,
    render_config: RenderConfig | None = None,
):
    """Build an initialized Laser for `scene`'s projector.

    Args:
      scene: fireflies_tpu.Scene with a projector (and camera for SMARTY).
      bridge: SceneBridge for the scene (SMARTY renders depth maps with it).
      config: LaserConfig.
      mode: "RANDOM" | "POISSON" | "GRID" | "SMARTY".
      key: PRNG key (RANDOM / SMARTY randomization).
      projector_fov: laser fov in degrees.
      render_config: depth-map render settings for SMARTY.

    Reference: laser_estimation.py:253-391.
    """
    if scene.projector() is None:
        raise ValueError("scene has no projector")
    key = key if key is not None else jax.random.key(0)
    w, h = config.image_size

    if mode == "RANDOM":
        rays = laser_mod.generate_random_rays(key, config.n_beams, projector_fov)
    elif mode == "POISSON":
        rays = laser_mod.generate_blue_noise_rays(
            w, h, config.n_beams, projector_fov, seed=0
        )
    elif mode == "GRID":
        grid_width = int(math.sqrt(config.n_beams))
        rays = laser_mod.generate_uniform_rays_by_count(
            grid_width, grid_width, projector_fov
        )
    elif mode == "SMARTY":
        rays = _initialize_smarty(
            scene, bridge, config, key, projector_fov, render_config
        )
    else:
        raise ValueError(f"unknown laser init mode {mode!r}")

    return Laser(scene.projector(), rays, fov=projector_fov)


def _initialize_smarty(
    scene, bridge, config: LaserConfig, key: Array, projector_fov: float, render_config
) -> Array:
    w, h = config.image_size
    render_config = render_config or RenderConfig(width=w, height=h, spp=1, max_bounces=1)
    randomize = scene.compile()

    def scene_at(k, step):
        return bridge.assemble(randomize(k, step))

    k_maps, k_pick = jax.random.split(key)
    depth_maps = integrators.random_depth_maps(
        scene_at, k_maps, render_config, n_maps=config.n_depthmaps
    )

    variance_map = probability_distribution_from_depth_maps(
        depth_maps, config.variational_epsilon
    )
    variance_map = ffmath.normalize(variance_map)

    # Epipolar constraint: only pixels any beam can reach.
    ref_scene = scene_at(jax.random.key(0), 0)
    constraint = generate_epipolar_constraints(
        ref_scene.camera,
        jnp.asarray(scene.projector().non_randomized_world()),
        projector_fov,
        1000.0,
        (render_config.height, render_config.width),
    )
    sampling_map = variance_map * jnp.asarray(constraint)
    total = jnp.sum(sampling_map)
    sampling_map = sampling_map / jnp.where(total == 0, 1.0, total)

    # High variance -> small radius -> dense beams (reference :326-340).
    inv = 1.0 - ffmath.normalize(sampling_map)
    radius_map = config.smarty_min_radius + (
        config.smarty_max_radius - config.smarty_min_radius
    ) * inv
    n_pts, pts = sampling.bridson(np.asarray(radius_map), k=50, seed=0)
    pts = np.floor(pts).astype(np.int64)
    pts[:, 0] = np.clip(pts[:, 0], 0, render_config.height - 1)
    pts[:, 1] = np.clip(pts[:, 1], 0, render_config.width - 1)
    # Keep only constraint-satisfying points.
    keep = np.asarray(constraint)[pts[:, 0], pts[:, 1]] > 0
    pts = pts[keep]
    chosen = jnp.asarray(pts[:, 0] * render_config.width + pts[:, 1], jnp.int32)

    if config.save_images:
        # Debug dumps like the reference (laser_estimation.py:312,348):
        # inferno variance map with chosen points inverted + constraint map.
        from fireflies_tpu.utils.colormap import inferno  # noqa: PLC0415
        from fireflies_tpu.utils.png import write_png  # noqa: PLC0415

        vm = inferno(np.asarray(variance_map))
        flat = vm.reshape(-1, 3)
        flat[np.asarray(chosen)] = 1.0 - flat[np.asarray(chosen)]
        write_png(
            str(Path(config.save_dir) / "sampling_map.png"),
            flat.reshape(vm.shape),
        )
        write_png(str(Path(config.save_dir) / "constraint_map.png"), constraint)

    laser_world = jnp.asarray(scene.projector().non_randomized_world())
    laser_origin = laser_world[:3, 3]
    mean_depth = jnp.mean(jnp.where(depth_maps > 0, depth_maps, jnp.nan))
    mean_depth = jnp.nan_to_num(mean_depth, nan=1.0)
    laser_dir_world = laser_from_ndc_points(
        ref_scene.camera,
        laser_origin,
        mean_depth,
        chosen,
        (render_config.height, render_config.width),
    )
    # Into the projector's local frame (laser_estimation.py:368-372).
    local_dir = ffmath.transform_directions(
        laser_dir_world, jnp.linalg.inv(laser_world)
    )
    return ffmath.normalize_vectors(local_dir)

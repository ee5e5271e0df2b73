"""TPU-native differentiable renderer (replaces Mitsuba, SURVEY.md §2 L0)."""

from fireflies_tpu.render.bridge import SceneBridge
from fireflies_tpu.render.integrators import (
    random_depth_maps,
    render_depth,
    render_depth_differentiable,
    render_from_laser,
    render_segmentation,
    render_shape_index,
)
from fireflies_tpu.render.intersect import (
    closest_hit,
    hit_attributes,
    intersect_brute,
    occluded,
    occluded_any,
)
from fireflies_tpu.render.pathtracer import render_rgb, trace_rays
from fireflies_tpu.render.rays import camera_rays, points_to_ndc, rays_from_ndc
from fireflies_tpu.render.types import (
    Camera,
    Geometry,
    Hit,
    Lights,
    Materials,
    Projector,
    RenderConfig,
    RenderScene,
)

__all__ = [
    "SceneBridge",
    "RenderScene",
    "RenderConfig",
    "Camera",
    "Projector",
    "Lights",
    "Materials",
    "Geometry",
    "Hit",
    "render_rgb",
    "trace_rays",
    "render_depth",
    "render_depth_differentiable",
    "render_segmentation",
    "render_shape_index",
    "render_from_laser",
    "random_depth_maps",
    "closest_hit",
    "intersect_brute",
    "occluded_any",
    "occluded",
    "hit_attributes",
    "camera_rays",
    "points_to_ndc",
    "rays_from_ndc",
]

from fireflies_tpu.render.soft import render_soft_silhouette, soft_silhouette  # noqa: E402,F401

__all__ += ["render_soft_silhouette", "soft_silhouette"]

from fireflies_tpu.render.reparam import (  # noqa: E402,F401
    render_depth_reparam,
    reparam_ndc,
)

__all__ += ["render_depth_reparam", "reparam_ndc"]

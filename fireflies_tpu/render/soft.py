"""Soft (SoftRas-style) differentiable silhouette rendering.

The detached-traversal path tracer has exact *interior* gradients but zero
gradients across occlusion boundaries (COMPONENTS.md gap #1).  For
silhouette-driven objectives — pose/shape fitting against masks, the
reference's segmentation-based workloads — this module renders a *soft*
coverage mask by sigmoid-blending the signed 2D distance of every pixel to
every projected triangle and combining with the probabilistic union
(softor), following Soft Rasterizer (Liu et al. 2019).  Fully differentiable
w.r.t. vertices, camera pose and fov, including across silhouettes.

Cost is O(F x H x W) pairs, reduced in face chunks like
graphics/rasterization — intended for optimization-time use at moderate
resolutions, not production rendering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fireflies_tpu.render.rays import points_to_ndc
from fireflies_tpu.render.types import RenderConfig, RenderScene

Array = jax.Array


def _edge_signed_dist(px, py, ax, ay, bx, by):
    """Signed distance of pixels to edge (a -> b): positive on the left.

    px, py: (H, W); ax...: (C,) -> result (C, H, W).
    """
    ex = bx - ax
    ey = by - ay
    # Cross product (edge x to-pixel) / |edge|.
    num = ex[:, None, None] * (py[None] - ay[:, None, None]) - ey[:, None, None] * (
        px[None] - ax[:, None, None]
    )
    inv_len = 1.0 / jnp.sqrt(ex * ex + ey * ey + 1e-12)
    return num * inv_len[:, None, None]


def soft_silhouette(
    vertices_ndc: Array,
    faces: Array,
    height: int,
    width: int,
    sigma: float = 2e-4,
    face_chunk: int = 64,
    face_mask: Array | None = None,
) -> Array:
    """(H, W) soft coverage in [0, 1] from NDC-projected vertices.

    vertices_ndc: (V, 3) with x, y in [-1, 1] and z = view depth (>0 in
    front).  Faces with any vertex behind the camera are dropped.  `sigma`
    controls edge softness in squared-NDC units (SoftRas convention:
    D = sigmoid(sign * d^2 / sigma)).
    """
    # Pixel centers in NDC.
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    ys = 1.0 - (jnp.arange(height, dtype=jnp.float32) + 0.5) / height * 2.0
    px, py = jnp.meshgrid(xs, ys)  # (H, W) x right, y up

    f = faces.shape[0]
    chunk = max(min(face_chunk, f), 1)
    n_chunks = -(-f // chunk)
    pad = n_chunks * chunk - f
    faces_p = jnp.concatenate([faces, jnp.zeros((pad, 3), faces.dtype)]) if pad else faces
    base_mask = jnp.ones(f, bool) if face_mask is None else face_mask
    pad_mask = (
        jnp.concatenate([base_mask, jnp.zeros(pad, bool)]) if pad else base_mask
    )
    faces_c = faces_p.reshape(n_chunks, chunk, 3)
    mask_c = pad_mask.reshape(n_chunks, chunk)

    def body(carry, data):
        not_cov = carry
        fc, valid = data
        v0 = vertices_ndc[fc[:, 0]]
        v1 = vertices_ndc[fc[:, 1]]
        v2 = vertices_ndc[fc[:, 2]]
        in_front = (v0[:, 2] > 0) & (v1[:, 2] > 0) & (v2[:, 2] > 0)

        # Consistent winding: make the signed area positive (so "inside" is
        # positive for all three edges regardless of orientation).
        area2 = (v1[:, 0] - v0[:, 0]) * (v2[:, 1] - v0[:, 1]) - (
            v1[:, 1] - v0[:, 1]
        ) * (v2[:, 0] - v0[:, 0])
        flip = jnp.where(area2 < 0, -1.0, 1.0)
        # Edge-on faces project to zero-area slivers whose edge-line signed
        # distances are meaningless (they'd paint 0.5-coverage streaks).
        not_degenerate = jnp.abs(area2) > 1e-7

        # Orient each edge distance inside-positive FIRST, then take the min:
        # min-before-flip would misclassify the outside of CW triangles.
        fl = flip[:, None, None]
        d0 = _edge_signed_dist(px, py, v0[:, 0], v0[:, 1], v1[:, 0], v1[:, 1]) * fl
        d1 = _edge_signed_dist(px, py, v1[:, 0], v1[:, 1], v2[:, 0], v2[:, 1]) * fl
        d2 = _edge_signed_dist(px, py, v2[:, 0], v2[:, 1], v0[:, 0], v0[:, 1]) * fl
        d_min = jnp.minimum(jnp.minimum(d0, d1), d2)

        # SoftRas influence: sigmoid(sign(d) * d^2 / sigma).
        dd = jnp.sign(d_min) * d_min * d_min / sigma
        cov = jax.nn.sigmoid(dd)
        cov = jnp.where((valid & in_front & not_degenerate)[:, None, None], cov, 0.0)
        return not_cov * jnp.prod(1.0 - cov, axis=0), None

    init = jnp.ones((height, width), jnp.float32)
    # checkpoint: reverse-mode AD through the scan otherwise STACKS each
    # iteration's (chunk, H, W) edge-distance/sigmoid residuals — measured
    # f32[n_chunks, ., batch, H, W] multi-GiB HBM temps (TPU OOM at
    # batch 16, 256^2, 1.4k faces).  Recomputing a chunk's rasterization in
    # the backward pass costs ~2x forward VPU time and O(H*W) memory.
    not_covered, _ = jax.lax.scan(jax.checkpoint(body), init, (faces_c, mask_c))
    return 1.0 - not_covered


def render_soft_silhouette(
    scene: RenderScene,
    config: RenderConfig,
    sigma: float = 2e-4,
    mesh_id: int | None = None,
) -> Array:
    """(H, W) differentiable coverage of the scene (or one mesh) from the
    camera — pose/shape gradients flow across silhouettes.

    `mesh_id` restricts coverage to one mesh (per-class soft segmentation,
    the differentiable twin of render_segmentation's hard mesh-id masks).
    """
    ndc = points_to_ndc(scene.camera, scene.geometry.vertices)
    face_mask = (
        scene.geometry.face_mesh == mesh_id if mesh_id is not None else None
    )
    return soft_silhouette(
        ndc, scene.geometry.faces, config.height, config.width,
        sigma=sigma, face_mask=face_mask,
    )

"""EXPERIMENTAL: warped-area reparameterized visibility gradients.

Primary-visibility silhouette gradients for screen-space integrals, after
the warp-field construction of Bangaru, Li & Durand 2020 ("Unbiased Warped-
Area Sampling"), specialized to primary rays and formulated in NDC:

    I(theta) = \\int f(u; theta) du        (u = NDC pixel coordinates)

has discontinuities where silhouettes cross the film.  Substituting
u = T(s; theta) with a warp that makes each discontinuity stationary in s
turns the boundary term into an ordinary sample-wise expectation:

    dI/dtheta = E[ d/dtheta ( f(u + W) * (1 + div_u W) ) ],
    W = V(u; theta) - stop_grad_theta(V)              (primal zero)

V is a smooth screen-space velocity field built per pixel from K auxiliary
rays in an NDC disk.  Each aux ray contributes the NDC position of its hit's
*material point* — barycentrics detached in theta, vertices live, so the
point moves WITH the surface (a fixed-ray re-intersection has zero velocity
under e.g. lateral translation of a plane and misses the boundary term
entirely).  Misses contribute their own (stationary) aux coordinate.
Contributions combine with boundary-concentrating harmonic weights: the
weight grows as an aux hit approaches a mesh edge, so V approaches the true
edge velocity at silhouettes.  The divergence is computed with two
forward-mode probes of V along the NDC axes — the screen-space formulation
matters: pixels sample uniformly in NDC, and a divergence taken in
direction space disagrees with that measure by the perspective distortion
(measured: it turns a +0.027 boundary gradient into -0.049 on the
translating-quad test).

Relation to the reference: Fireflies inherits Mitsuba's path-replay /
reparameterized integrators for these gradients (reference scene.py:384
renders via mi.render with prb/reparam variants); this module is the
TPU-native analog for the primary-visibility case.  Validated against
analytic boundary flux in tests/test_reparam.py.

STATUS: experimental, opt-in.  Finite-K bias and O(1/sqrt(K)) noise near
silhouettes; cost ~3x K aux rays per pixel.  The supported default recipe
for pose/shape boundary gradients remains optim.hybrid_pose_loss
(soft-silhouette, render/soft.py).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from fireflies_tpu.render.intersect import closest_hit, hit_attributes
from fireflies_tpu.render.rays import pixel_to_ndc, points_to_ndc, rays_from_ndc
from fireflies_tpu.render.types import Camera, Geometry, RenderConfig, RenderScene

Array = jax.Array


def make_warp_field(
    camera: Camera,
    geometry: Geometry,
    key: Array,
    k_aux: int = 8,
    radius: float = 0.05,
    kappa: float = 4.0,
    tri_chunk: int = 512,
    backend: str = "auto",
) -> Callable[[Array], Array]:
    """Build the screen-space warp V: NDC (N, 2) -> NDC velocities (N, 2).

    Smooth in u (for the divergence probes) and live in the geometry and
    camera (for theta-gradients); only the auxiliary traversal's primitive
    ids are frozen.  `radius` is the aux disk radius in NDC units; `kappa`
    sets how sharply weights concentrate at boundaries (floor =
    (radius/kappa)^2).
    """
    origin = camera.to_world[:3, 3]

    def warp(u: Array) -> Array:
        n = u.shape[0]
        xi = jax.random.uniform(key, (n, k_aux, 2))
        phi = 2.0 * jnp.pi * (xi[..., 0] / k_aux + jnp.arange(k_aux)[None, :] / k_aux)
        r = radius * jnp.sqrt(0.25 + 0.75 * xi[..., 1])
        offs = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)
        u_k = u[:, None, :] + offs  # (N, K, 2), live in u
        u_flat = u_k.reshape(-1, 2)

        o_flat, d_flat = rays_from_ndc(camera, u_flat)
        hit = closest_hit(
            o_flat,
            jax.lax.stop_gradient(d_flat),
            geometry,
            tri_chunk=tri_chunk,
            backend=backend,
            shared_origin=jax.lax.stop_gradient(origin),
        )
        hit = jax.tree.map(jax.lax.stop_gradient, hit)

        # Barycentrics from DETACHED vertices + live aux rays: detached in
        # theta, smooth in u.
        geo_det = geometry.replace(vertices=jax.lax.stop_gradient(geometry.vertices))
        a_det = hit_attributes(o_flat, d_flat, hit, geo_det)
        bu, bv = a_det["u"], a_det["v"]
        bw = 1.0 - bu - bv

        # Material point: detached barycentrics x LIVE vertices — moves with
        # the surface under theta, so silhouette edges carry their velocity.
        prim = jnp.maximum(hit.prim, 0)
        fidx = geometry.faces[prim]
        p0 = geometry.vertices[fidx[:, 0]]
        p1 = geometry.vertices[fidx[:, 1]]
        p2 = geometry.vertices[fidx[:, 2]]
        x = bw[:, None] * p0 + bu[:, None] * p1 + bv[:, None] * p2

        ndc_k = points_to_ndc(camera, x)[:, :2].reshape(n, k_aux, 2)
        valid = hit.valid.reshape(n, k_aux)
        # Misses: background is stationary — the aux coordinate itself
        # (moves with u, zero theta-velocity).
        ndc_k = jnp.where(valid[..., None], ndc_k, u_k)

        # Boundary-concentrating harmonic weights.  B ~ NDC distance of the
        # aux hit to its triangle's nearest edge (min barycentric x the
        # triangle's projected size); B -> 0 at mesh edges so the weight
        # peaks there and V matches the edge velocity.  Smooth in u via the
        # live barycentrics.
        ndc_p = points_to_ndc(camera, jax.lax.stop_gradient(p0))
        ndc_q = points_to_ndc(camera, jax.lax.stop_gradient(p1))
        ndc_r = points_to_ndc(camera, jax.lax.stop_gradient(p2))
        tri_area2 = jnp.abs(
            (ndc_q[:, 0] - ndc_p[:, 0]) * (ndc_r[:, 1] - ndc_p[:, 1])
            - (ndc_q[:, 1] - ndc_p[:, 1]) * (ndc_r[:, 0] - ndc_p[:, 0])
        )
        tri_size = jax.lax.stop_gradient(jnp.sqrt(tri_area2 + 1e-20)).reshape(
            n, k_aux
        )
        b_min = jnp.maximum(jnp.minimum(jnp.minimum(bu, bv), bw), 0.0).reshape(
            n, k_aux
        )
        bnd = jnp.where(valid, b_min * tri_size, radius)

        dist2 = jnp.sum(offs * offs, axis=-1)
        floor = (radius / kappa) ** 2
        w = 1.0 / (dist2 + bnd * bnd + floor)
        w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)
        v_ndc = jnp.sum(w[..., None] * ndc_k, axis=1)
        return v_ndc - jax.lax.stop_gradient(v_ndc - u)  # velocity form: primal u

    return warp


def reparam_ndc(
    camera: Camera,
    u: Array,
    geometry: Geometry,
    key: Array,
    k_aux: int = 8,
    radius: float = 0.05,
    kappa: float = 4.0,
    tri_chunk: int = 512,
    backend: str = "auto",
):
    """Returns (u', area): primal-identical NDC samples whose gradients carry
    silhouette motion, and the area factor 1 + div_u(W) (primal exactly 1)."""
    warp = make_warp_field(
        camera, geometry, key, k_aux=k_aux, radius=radius, kappa=kappa,
        tri_chunk=tri_chunk, backend=backend,
    )
    u_det = jax.lax.stop_gradient(u)

    ex = jnp.broadcast_to(jnp.array([1.0, 0.0], jnp.float32), u_det.shape)
    ey = jnp.broadcast_to(jnp.array([0.0, 1.0], jnp.float32), u_det.shape)
    v, dv_x = jax.jvp(warp, (u_det,), (ex,))
    _, dv_y = jax.jvp(warp, (u_det,), (ey,))

    w_field = v - jax.lax.stop_gradient(v)  # primal 0, d/dtheta = dV/dtheta
    u_new = u + w_field
    div = dv_x[:, 0] + dv_y[:, 1]
    area = 1.0 + (div - jax.lax.stop_gradient(div))
    return u_new, area


def render_depth_reparam(
    scene: RenderScene,
    config: RenderConfig,
    key: Array,
    k_aux: int = 8,
    radius: float = 0.05,
    kappa: float = 4.0,
) -> Array:
    """(H, W) depth map whose gradients include primary-silhouette terms.

    EXPERIMENTAL — see module docstring.  Primal output equals render_depth
    (same pixel centers, same traversal)."""
    xs = (jnp.arange(config.width, dtype=jnp.float32) + 0.5)
    ys = (jnp.arange(config.height, dtype=jnp.float32) + 0.5)
    px, py = jnp.meshgrid(xs, ys)
    u = pixel_to_ndc(px.reshape(-1), py.reshape(-1), config.width, config.height)

    u_rep, area = reparam_ndc(
        scene.camera, u, scene.geometry, key, k_aux=k_aux, radius=radius,
        kappa=kappa, tri_chunk=config.tri_chunk, backend=config.backend,
    )
    o, d = rays_from_ndc(scene.camera, u_rep)
    origin = scene.camera.to_world[:3, 3]
    hit = closest_hit(
        o, jax.lax.stop_gradient(d), scene.geometry,
        tri_chunk=config.tri_chunk, backend=config.backend,
        shared_origin=jax.lax.stop_gradient(origin),
    )
    hit = jax.tree.map(jax.lax.stop_gradient, hit)
    attrs = hit_attributes(o, d, hit, scene.geometry)
    depth = jnp.where(hit.valid, attrs["t"], 0.0) * area
    return depth.reshape(config.height, config.width)

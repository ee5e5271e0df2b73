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
from fireflies_tpu.render.types import Camera, Geometry, Hit, RenderConfig, RenderScene

Array = jax.Array


def _open_edges(geometry: Geometry) -> Array:
    """(F, 3) bool: which of each face's edges are OPEN (used by exactly one
    face).  Edge order matches barycentric distances [v, w, u]:
    edge p0-p1 <-> v = 0, edge p1-p2 <-> w = 0, edge p2-p0 <-> u = 0.

    Open edges are unconditional warp boundaries; interior (shared) edges
    only become silhouettes when viewed at grazing angles (handled by the
    grazing term in _boundary_distance)."""
    f = geometry.faces
    pairs = jnp.concatenate(
        [f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]], axis=0
    )  # (3F, 2)
    lo = jnp.minimum(pairs[:, 0], pairs[:, 1]).astype(jnp.int64)
    hi = jnp.maximum(pairs[:, 0], pairs[:, 1]).astype(jnp.int64)
    keys = lo * jnp.int64(geometry.vertices.shape[0] + 1) + hi
    sorted_keys = jnp.sort(keys)
    left = jnp.searchsorted(sorted_keys, keys, side="left")
    right = jnp.searchsorted(sorted_keys, keys, side="right")
    open_flat = (right - left) == 1
    return open_flat.reshape(3, -1).T  # (F, 3)


def _plane_eval(o, d, prim_ids, geometry, geo_det, edge_open):
    """Evaluate rays against the (extended) PLANE of triangles prim_ids.

    Barycentrics come from DETACHED vertices + live rays (smooth in the
    sample position, detached in theta) and may leave [0, 1] — crossing a
    triangle edge is smooth, which is what lets forward-mode probes see the
    warp's transition band.  The returned point x uses LIVE vertices
    (material point: moves with the surface under theta).

    Returns dict:
      x (N, 3) live plane point,  t (N,) ray parameter (units of |d|),
      b (N,) boundary proximity: min over edges of |barycentric| plus, on
        interior (shared) edges, |cos(ray, normal)| — face-on interior
        edges never attract weight, grazing ones (closed-mesh silhouettes)
        do,
      n (N, 3) live unit normal,  tris (p0, p1, p2) live corners.
    """
    zeros = jnp.zeros(prim_ids.shape, jnp.float32)
    fake = Hit(t=zeros, prim=prim_ids, u=zeros, v=zeros, valid=prim_ids >= 0)
    a = hit_attributes(o, d, fake, geo_det)
    bu, bv = a["u"], a["v"]
    bw = 1.0 - bu - bv
    fidx = geometry.faces[prim_ids]
    p0 = geometry.vertices[fidx[:, 0]]
    p1 = geometry.vertices[fidx[:, 1]]
    p2 = geometry.vertices[fidx[:, 2]]
    x = bw[:, None] * p0 + bu[:, None] * p1 + bv[:, None] * p2
    n_tri = jnp.cross(p1 - p0, p2 - p0)
    n_tri = n_tri / (jnp.linalg.norm(n_tri, axis=-1, keepdims=True) + 1e-20)
    graze = jax.lax.stop_gradient(
        jnp.abs(
            jnp.sum(
                n_tri * d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-20),
                axis=-1,
            )
        )
    )
    opens = edge_open[prim_ids]  # (N, 3) in [v, w, u] edge order
    return {
        "x": x,
        "t": a["t"],
        "bary3": jnp.stack([bv, bw, bu], axis=-1),  # [v, w, u] edge order
        "opens": opens,
        "graze": graze,
        "n": n_tri,
        "tris": (p0, p1, p2),
    }


def _screen_boundary(pe, corners):
    """Screen-space distance of a _plane_eval point to its triangle's
    boundary: per-edge |barycentric| times that edge's projected HEIGHT
    (2 area / edge length) — bary * sqrt(area) is only isotropic on
    average, and the anisotropy error shows up as a non-cancelling
    divergence residual.  Interior (shared) edges carry the grazing
    penalty, scaled by sqrt(projected area)."""
    a, b, c = corners  # (N, >=2) projected corners, [p0, p1, p2]
    e01 = b[:, :2] - a[:, :2]
    e12 = c[:, :2] - b[:, :2]
    e20 = a[:, :2] - c[:, :2]
    area2 = jnp.abs(e01[:, 0] * (-e20[:, 1]) - e01[:, 1] * (-e20[:, 0]))
    lens = jnp.stack(
        [jnp.linalg.norm(e01, axis=-1), jnp.linalg.norm(e12, axis=-1),
         jnp.linalg.norm(e20, axis=-1)], axis=-1,
    )
    h = area2[:, None] / jnp.maximum(lens, 1e-12)  # heights, [v, w, u] order
    pen = pe["graze"][:, None] * jnp.sqrt(area2 + 1e-20)[:, None]
    d = jnp.abs(pe["bary3"]) * h + jnp.where(pe["opens"], 0.0, pen)
    return jnp.min(d, axis=-1)


def make_warp_field(
    camera: Camera,
    geometry: Geometry,
    key: Array,
    k_aux: int = 8,
    radius: float = 0.05,
    kappa: float = 4.0,
    tri_chunk: int = 512,
    backend: str = "auto",
    light_positions: Array | None = None,
) -> Callable[[Array], Array]:
    """Build the screen-space warp V: NDC (N, 2) -> NDC velocities (N, 2).

    Smooth in u (for the divergence probes) and live in the geometry and
    camera (for theta-gradients); only the auxiliary traversal's primitive
    ids are frozen.  `radius` is the aux disk radius in NDC units; `kappa`
    sets how sharply weights concentrate at boundaries (floor =
    (radius/kappa)^2).

    With `light_positions` (L, 3), each blocked aux also contributes a
    SHADOW candidate: its blocker's material point projected through the
    light onto the receiver's tangent plane, then to NDC.  Because the
    blocker lies on the shadow segment, the candidate's primal equals the
    receiver point exactly — only its velocity differs (it moves with the
    shadow edge, at the blocker-to-receiver magnification).  Candidate
    weights use blocker-edge proximity, so at a shadow boundary the warp
    follows the shadow's image motion — silhouettes of shadows get
    gradients just like primary silhouettes.
    """
    origin = camera.to_world[:3, 3]
    edge_open = _open_edges(geometry)  # (F, 3) in [v, w, u] edge order

    # Scouts: extra samples on a wider ring used ONLY to source triangle
    # ids for plane extension — they widen the information horizon so that
    # by the time a windowed feature gains weight, its plane id has been
    # available for a while (no onset jump).
    n_scout = max(4, k_aux // 2)
    scout_mult = 3.0
    win = 1.8 * radius  # feature window (screen units)
    fb = (win / 4.0) ** 2

    def warp(u: Array) -> Array:
        n = u.shape[0]
        m = k_aux + n_scout
        xi = jax.random.uniform(key, (n, m, 2))
        phi = 2.0 * jnp.pi * (xi[..., 0] / m + jnp.arange(m)[None, :] / m)
        is_cand = jnp.arange(m) < k_aux
        r = jnp.where(
            is_cand[None, :],
            radius * jnp.sqrt(xi[..., 1]),
            scout_mult * radius * (0.9 + 0.2 * xi[..., 1]),
        )
        offs = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)
        u_k = u[:, None, :] + offs  # (N, M, 2), live in u
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

        geo_det = geometry.replace(vertices=jax.lax.stop_gradient(geometry.vertices))
        valid = hit.valid.reshape(n, m)
        prim = jnp.maximum(hit.prim, 0)

        def cam_corners(tris):
            return [
                points_to_ndc(camera, jax.lax.stop_gradient(t)) for t in tris
            ]

        # ---- carrier feature: surface hit (own plane) or stationary --------
        own = _plane_eval(o_flat, d_flat, prim, geometry, geo_det, edge_open)
        ndc0 = points_to_ndc(camera, own["x"])[:, :2].reshape(n, m, 2)
        own_b = _screen_boundary(own, cam_corners(own["tris"])).reshape(n, m)
        val0 = jnp.where(valid[..., None], ndc0, u_k)
        b0 = jnp.where(valid, jnp.minimum(own_b, win), win)

        feat_val = [val0]
        feat_b = [b0]
        feat_on = [jnp.ones_like(valid)]

        # ---- primary-silhouette extension --------------------------------
        # Borrow the nearest-to-edge sibling triangle (scouts included) and
        # intersect each ray with its extended plane: barycentrics cross 0
        # smoothly at the silhouette, so the transition is visible to the
        # forward-mode probes — a frozen hit/miss mask alone would hide it.
        # Applies to miss aux AND to aux that hit a DIFFERENT surface (e.g.
        # a static backdrop behind a moving occluder): without it, the
        # occluder's velocity influence on the far side would end in a mask
        # cliff at the candidate-disk radius instead of decaying smoothly.
        b_for_sel = jnp.where(valid, own_b, 1e9)
        sel = jnp.argmin(b_for_sel, axis=1)
        has_ref = jnp.any(valid, axis=1)
        ref_prim = prim.reshape(n, m)[jnp.arange(n), sel]
        ext_prim = jnp.broadcast_to(ref_prim[:, None], (n, m)).reshape(-1)
        ext = _plane_eval(o_flat, d_flat, ext_prim, geometry, geo_det, edge_open)
        same = valid & (prim.reshape(n, m) == ref_prim[:, None])
        ok_ext = (~same) & has_ref[:, None] & (ext["t"].reshape(n, m) > 1e-4)
        ndc1 = points_to_ndc(camera, ext["x"])[:, :2].reshape(n, m, 2)
        feat_val.append(jnp.where(ok_ext[..., None], ndc1, u_k))
        feat_b.append(_screen_boundary(ext, cam_corners(ext["tris"])).reshape(n, m))
        feat_on.append(ok_ext)

        # ---- shadow features, one per delta light ---------------------------
        if light_positions is not None and light_positions.shape[0] > 0:
            x_flat = jnp.where(
                valid.reshape(-1)[:, None], own["x"], jax.lax.stop_gradient(own["x"])
            )
            n_recv = own["n"]
            for li in range(light_positions.shape[0]):
                lpos = light_positions[li]
                seg = x_flat - lpos[None, :]  # live in u and theta
                lpos_b = jnp.broadcast_to(lpos, seg.shape)
                bhit = closest_hit(
                    lpos_b,
                    jax.lax.stop_gradient(seg),
                    geometry,
                    t_min=1e-4,
                    t_max=1.0 - 1e-3,
                    tri_chunk=tri_chunk,
                    backend=backend,
                    shared_origin=jax.lax.stop_gradient(lpos),
                )
                bhit = jax.tree.map(jax.lax.stop_gradient, bhit)
                blocked = bhit.valid.reshape(n, m) & valid
                bprim = jnp.maximum(bhit.prim, 0)

                # Blocked aux use their own blocker; unblocked aux extend the
                # nearest-to-edge sibling blocker's plane (smooth crossing).
                sb_own = _plane_eval(lpos_b, seg, bprim, geometry, geo_det, edge_open)
                sb_own_b = jnp.min(jnp.abs(sb_own["bary3"]), axis=-1)
                sb_sel = jnp.where(blocked, sb_own_b.reshape(n, m), 1e9)
                bsel = jnp.argmin(sb_sel, axis=1)
                has_bref = jnp.any(blocked, axis=1)
                ref_bprim = bprim.reshape(n, m)[jnp.arange(n), bsel]
                extb = jnp.where(
                    blocked.reshape(-1),
                    bprim,
                    jnp.broadcast_to(ref_bprim[:, None], (n, m)).reshape(-1),
                )
                sb = _plane_eval(lpos_b, seg, extb, geometry, geo_det, edge_open)
                t_sb = sb["t"].reshape(n, m)
                ok_s = valid & (
                    blocked | (has_bref[:, None] & (t_sb > 1e-3) & (t_sb < 0.999))
                )

                # Project the (extended-)blocker point through the light onto
                # the receiver plane: the point is on the L->x ray, so the
                # primal lands exactly back on x — only the velocity differs
                # (it moves with the shadow edge, at the blocker-to-receiver
                # magnification).
                bm = sb["x"]
                d_s = bm - lpos[None, :]
                denom = jnp.sum(n_recv * d_s, axis=-1)
                safe = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
                t_s = jnp.sum(n_recv * (x_flat - lpos[None, :]), axis=-1) / safe
                x_s = lpos[None, :] + t_s[:, None] * d_s
                ndc_s = points_to_ndc(camera, x_s)[:, :2].reshape(n, m, 2)

                # Shadow footprint: blocker corners projected through the
                # light onto the receiver plane, then to screen.
                def shadow_corners(tris):
                    outs = []
                    for q in tris:
                        dq = jax.lax.stop_gradient(q - lpos[None, :])
                        den = jnp.sum(jax.lax.stop_gradient(n_recv) * dq, axis=-1)
                        den = jnp.where(jnp.abs(den) < 1e-9, 1e-9, den)
                        tq = jnp.sum(
                            jax.lax.stop_gradient(n_recv)
                            * jax.lax.stop_gradient(x_flat - lpos[None, :]),
                            axis=-1,
                        ) / den
                        outs.append(
                            points_to_ndc(
                                camera,
                                jax.lax.stop_gradient(
                                    lpos[None, :] + tq[:, None] * dq
                                ),
                            )
                        )
                    return outs

                feat_val.append(jnp.where(ok_s[..., None], ndc_s, u_k))
                feat_b.append(
                    _screen_boundary(sb, shadow_corners(sb["tris"])).reshape(n, m)
                )
                feat_on.append(ok_s)

        # ---- per-aux feature blend (windowed), then across-aux weights ------
        # The carrier is always on; every other feature enters through a
        # window: eta = relu(1/(B^2+fb) - 1/(win^2+fb)) is EXACTLY ZERO for
        # B >= win, so a feature appearing while still far from its boundary
        # (guaranteed by the scout ring's wider horizon) changes nothing —
        # onset is seamless and the whole transition is carried by smooth,
        # AD-visible barycentric motion.
        eta_cap = 1.0 / (win * win + fb)
        etas = [1.0 / (b0 * b0 + fb)]
        for fv, fbnd, fon in zip(feat_val[1:], feat_b[1:], feat_on[1:]):
            etas.append(
                jnp.where(
                    fon,
                    jnp.maximum(1.0 / (fbnd * fbnd + fb) - eta_cap, 0.0),
                    0.0,
                )
            )
        eta_sum = sum(etas)
        val_k = sum(e[..., None] * v for e, v in zip(etas, feat_val)) / jnp.maximum(
            eta_sum[..., None], 1e-20
        )
        b_all = [b0] + [
            jnp.where(fon, jnp.minimum(fbnd, win), win)
            for fbnd, fon in zip(feat_b[1:], feat_on[1:])
        ]
        b_k = jnp.minimum(jnp.min(jnp.stack(b_all, axis=-1), axis=-1), win)

        # Candidates only (scouts sourced ids, they don't vote).
        val_c = val_k[:, :k_aux]
        b_c = b_k[:, :k_aux]
        d2 = jnp.sum(offs[:, :k_aux] * offs[:, :k_aux], axis=-1)
        floor = (radius / kappa) ** 2
        w = 1.0 / (d2 + b_c * b_c + floor)
        w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)
        v_ndc = jnp.sum(w[..., None] * val_c, axis=1)
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
    light_positions: Array | None = None,
):
    """Returns (u', area): primal-identical NDC samples whose gradients carry
    silhouette motion (primary, and shadow boundaries when light_positions
    is given), and the area factor 1 + div_u(W) (primal exactly 1)."""
    warp = make_warp_field(
        camera, geometry, key, k_aux=k_aux, radius=radius, kappa=kappa,
        tri_chunk=tri_chunk, backend=backend, light_positions=light_positions,
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

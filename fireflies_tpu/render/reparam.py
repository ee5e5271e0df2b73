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

import numpy as np

import jax
import jax.numpy as jnp

from fireflies_tpu.render.intersect import closest_hit, hit_attributes
from fireflies_tpu.render.rays import pixel_to_ndc, points_to_ndc, rays_from_ndc
from fireflies_tpu.render.types import Camera, Geometry, Hit, RenderConfig, RenderScene

Array = jax.Array


def _edge_topology(geometry: Geometry) -> tuple[Array, Array]:
    """Edge openness + adjacency.  Returns (open (F, 3) bool, nbr (F, 3)
    int32).  Edge order matches barycentric distances [v, w, u]:
    edge p0-p1 <-> v = 0, edge p1-p2 <-> w = 0, edge p2-p0 <-> u = 0.

    Open edges (used by exactly one face) are unconditional warp
    boundaries; interior (shared) edges only become silhouettes when viewed
    at grazing angles (handled by the grazing term in _screen_boundary).
    `nbr` gives the face across each interior edge (-1 for open edges) —
    needed to make the boundary-distance metric CONTINUOUS across interior
    edges (see _screen_boundary)."""
    f = geometry.faces
    n_faces = f.shape[0]
    pairs = jnp.concatenate(
        [f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]], axis=0
    )  # (3F, 2)
    lo = jnp.minimum(pairs[:, 0], pairs[:, 1]).astype(jnp.int32)
    hi = jnp.maximum(pairs[:, 0], pairs[:, 1]).astype(jnp.int32)
    # Stable lexsort on (lo, hi): avoids a combined int64 key (x64 is off,
    # and lo * V + hi overflows int32 past ~46k vertices).
    order1 = jnp.argsort(hi, stable=True)
    order = order1[jnp.argsort(lo[order1], stable=True)]
    lo_s, hi_s = lo[order], hi[order]
    idx = jnp.arange(lo.shape[0])
    adj_same = (lo_s[1:] == lo_s[:-1]) & (hi_s[1:] == hi_s[:-1])
    same_next = jnp.concatenate([adj_same, jnp.array([False])])
    same_prev = jnp.concatenate([jnp.array([False]), adj_same])
    partner_sorted = jnp.where(same_next, idx + 1, jnp.where(same_prev, idx - 1, idx))
    partner = order[partner_sorted]  # original flat-edge index of the partner
    inv = jnp.zeros_like(order).at[order].set(idx)
    partner_of = partner[inv]  # for each original edge, its partner (or self)
    open_flat = partner_of == idx
    nbr_flat = jnp.where(open_flat, -1, partner_of % n_faces).astype(jnp.int32)
    return open_flat.reshape(3, -1).T, nbr_flat.reshape(3, -1).T


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
    fidx_d = geo_det.faces[prim_ids]
    x_det = (
        bw[:, None] * geo_det.vertices[fidx_d[:, 0]]
        + bu[:, None] * geo_det.vertices[fidx_d[:, 1]]
        + bv[:, None] * geo_det.vertices[fidx_d[:, 2]]
    )
    return {
        "x": x,
        "x_det": x_det,  # live in the sample position, detached in theta
        "t": a["t"],
        "bary3": jnp.stack([bv, bw, bu], axis=-1),  # [v, w, u] edge order
        "opens": opens,
        "graze": graze,
        "n": n_tri,
        "tris": (p0, p1, p2),
    }


def _screen_boundary(
    pe, project, point_ndc, win, geo_det, edge_open, nbrs, prim_ids
):
    """Screen-space distance of a _plane_eval point to its triangle's
    boundary: min over edge SEGMENTS of the exact 2D point-to-segment
    distance, taken over the triangle's own edges AND its edge-neighbors'
    OPEN edges.  Three hard-won rules are baked in:

    * SEGMENTS, not lines.  |bary| * height measures distance to the edge
      LINE, which keeps a feature's window open in an infinite band along
      every edge *extension* — past the corners, where aux-sourced plane
      availability is stochastic, producing full-height warp cliffs whose
      AD-invisible divergence deltas bias boundary gradients (measured on
      the occluder-over-receiver test).

    * Interior (shared) edges carry the grazing penalty on an ABSOLUTE
      scale (multiples of the feature window): scaling it by triangle size
      made every tiny face-on triangle of a dense mesh look boundary-like,
      hijacking plane relevance and diluting silhouette velocities with
      static-surface features.

    * NEIGHBOR-SYMMETRIC.  Measured per-triangle only, the metric JUMPS
      when a sample crosses an interior edge near a corner (each side sees
      a different open-edge set), which puts warp steps exactly where eta
      is large.  Including the edge-neighbors' open edges makes the
      self+neighbor edge union symmetric across every interior edge, so
      the metric is continuous there.

    `project`: (N, 3) world points -> (N, >=2) screen coords; must match
    the projection used for `point_ndc` (camera, or through-the-light for
    shadow features).
    """
    p = point_ndc[:, :2]

    def seg_dist(s0, s1):
        e = s1[:, :2] - s0[:, :2]
        tt = jnp.sum((p - s0[:, :2]) * e, axis=-1) / jnp.maximum(
            jnp.sum(e * e, axis=-1), 1e-18
        )
        tt = jnp.clip(tt, 0.0, 1.0)
        proj = s0[:, :2] + tt[:, None] * e
        # NOT jnp.linalg.norm: its VJP divides by the distance, and a sample
        # can land EXACTLY on an edge segment (barycentrics quantize to 0.0),
        # turning the whole gradient NaN.  max-guarding the radicand routes
        # the cotangent to the constant there instead.
        d2 = jnp.sum((p - proj) ** 2, axis=-1)
        return jnp.sqrt(jnp.maximum(d2, 1e-24))

    def corners_of(fids):
        fidx = geo_det.faces[fids]
        return [project(geo_det.vertices[fidx[:, k]]) for k in range(3)]

    # Edge order matches pe["opens"] / bary3: [v, w, u] <-> [p0p1, p1p2, p2p0]
    a, b, c = corners_of(prim_ids)
    d = jnp.stack([seg_dist(a, b), seg_dist(b, c), seg_dist(c, a)], axis=-1)
    pen = pe["graze"][:, None] * (4.0 * win)
    best = jnp.min(d + jnp.where(pe["opens"], 0.0, pen), axis=-1)

    nb = nbrs[prim_ids]  # (N, 3)
    for k in range(3):
        has = nb[:, k] >= 0
        nid = jnp.maximum(nb[:, k], 0)
        na, nbc, ncc = corners_of(nid)
        nd = jnp.stack(
            [seg_dist(na, nbc), seg_dist(nbc, ncc), seg_dist(ncc, na)], axis=-1
        )
        use = edge_open[nid] & has[:, None]
        best = jnp.minimum(best, jnp.min(jnp.where(use, nd, jnp.inf), axis=-1))
    return best



def _n_scout(k_aux: int) -> int:
    return max(6, k_aux // 2)


class CameraDomain:
    """Warp domain over the camera's NDC film plane (the default)."""

    def __init__(self, camera: Camera):
        self._camera = camera
        self.shared_origin = camera.to_world[:3, 3]

    def rays(self, u_flat: Array):
        return rays_from_ndc(self._camera, u_flat)

    def project(self, pts: Array) -> Array:
        return points_to_ndc(self._camera, pts)


class DirectionDomain:
    """Per-ray gnomonic tangent-plane domain around central directions.

    For indirect (BSDF-sampled) bounces: each shading point x_i gets its own
    2D coordinate patch u around its sampled direction w_i — direction(u) =
    normalize(w + t u_x + b u_y) and project() is the matching gnomonic map.
    A point u in this domain plays exactly the role NDC plays for the
    camera, so the whole warped-area feature machinery applies unchanged
    (silhouettes of occluders as seen FROM x become stationary).
    """

    def __init__(self, x: Array, w: Array, m: int):
        # x (n, 3) origins, w (n, 3) unit central directions; m aux per ray.
        n = x.shape[0]
        self._m = m
        # Frisvad ONB around w.
        sign = jnp.where(w[:, 2] >= 0.0, 1.0, -1.0)
        a = -1.0 / (sign + w[:, 2])
        b_ = w[:, 0] * w[:, 1] * a
        t = jnp.stack(
            [1.0 + sign * w[:, 0] * w[:, 0] * a, sign * b_, -sign * w[:, 0]], -1
        )
        bt = jnp.stack([b_, sign + w[:, 1] * w[:, 1] * a, -w[:, 1]], -1)
        rep = lambda v: jnp.broadcast_to(v[:, None, :], (n, m, 3)).reshape(-1, 3)
        self._x = rep(x)
        self._w = rep(w)
        self._t = rep(t)
        self._b = rep(bt)
        self.shared_origin = None

    def rays(self, u_flat: Array):
        d = (
            self._w
            + self._t * u_flat[:, 0:1]
            + self._b * u_flat[:, 1:2]
        )
        d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-20)
        return self._x, d

    def direction(self, u: Array) -> Array:
        """(n, 2) central-patch coords -> (n, 3) unit directions."""
        n = u.shape[0]
        t = self._t.reshape(n, self._m, 3)[:, 0]
        b = self._b.reshape(n, self._m, 3)[:, 0]
        w = self._w.reshape(n, self._m, 3)[:, 0]
        d = w + t * u[:, 0:1] + b * u[:, 1:2]
        return d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-20)

    def project(self, pts: Array) -> Array:
        v = pts - self._x
        z = jnp.sum(v * self._w, axis=-1)
        z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
        return jnp.stack(
            [jnp.sum(v * self._t, -1) / z, jnp.sum(v * self._b, -1) / z], -1
        )


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
    debug: bool = False,
    domain=None,
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
    if domain is None:
        domain = CameraDomain(camera)
    edge_open, nbrs = _edge_topology(geometry)  # (F, 3) in [v, w, u] edge order

    # Scouts: extra samples on a wider ring used ONLY to source triangle
    # ids for plane extension — they widen the information horizon so that
    # by the time a windowed feature gains weight, its plane id has been
    # available for a while (no onset jump).
    n_scout = _n_scout(k_aux)
    win = 1.8 * radius  # feature window (screen units)
    # Reach bound: the scout ring must guarantee a feature's plane id is
    # found BEFORE any candidate's plane crossing comes within `win` of the
    # feature boundary, for EVERY approach direction.  Scout angles are
    # DETERMINISTIC mid-stratum (scouts only source prim ids — angular jitter
    # buys nothing and destroys the worst-case guarantee: a jittered stratum
    # allows 60-degree gaps, flickering ref availability pixel-to-pixel),
    # so the worst case is a silhouette approached midway between two scout
    # angles and the minimum ring radius r_s must satisfy
    # r_s * cos(pi/n_scout) >= radius + win (+ margin).  Violating this puts
    # a hard CLIFF in the warp field at the information horizon — an
    # AD-invisible delta in the divergence whose area scales with f at the
    # cliff (measured: +0.43 vs analytic -0.027 on the occluder-over-receiver
    # test, where the cliff lands on the receiver's finite depth instead of
    # on background zeros).
    scout_mult = float(np.ceil(10.0 * (1.1 + win / radius)
                               / np.cos(np.pi / n_scout)) / 10.0)
    fb = (win / 4.0) ** 2

    def warp(u: Array) -> Array:
        n = u.shape[0]
        m = k_aux + n_scout
        # ONE constellation SHARED by all pixels (broadcast), not per-pixel
        # draws.  Per-pixel iid offsets are unbiased (the estimator is
        # linear in the field derivatives) but their estimator variance near
        # silhouettes dominated the integrated gradient; a shared
        # constellation makes W a single coherent smooth field whose flux
        # depends only on the (deterministic) edge velocity — measured
        # seed-to-seed spread collapsed from ~50% to ~1% on the analytic
        # boundary tests.  Average a few keys for the residual constellation
        # dependence.
        xi = jax.random.uniform(key, (1, m, 2))
        # Candidates and scouts are stratified over the FULL circle
        # independently (each group covers [0, 2pi)).  A single joint
        # stratification would hand each group only an ARC, making both the
        # velocity estimate and the scout horizon direction-dependent.
        is_cand = jnp.arange(m) < k_aux
        group_idx = jnp.where(
            is_cand, jnp.arange(m), jnp.arange(m) - k_aux
        )
        group_n = jnp.where(is_cand, k_aux, n_scout)
        # Candidates: jittered strata over the FULL circle (a joint
        # stratification with the scouts would hand each group only an arc),
        # in ANTITHETIC PAIRS — candidate k >= k_aux/2 mirrors candidate
        # k - k_aux/2 (phi + pi, same radius).  Pairing cancels the
        # odd-in-offset component of the weighted-blend noise, which
        # dominates the divergence estimator's variance near silhouettes.
        # Scouts: deterministic mid-stratum angles (see reach bound above).
        half = max(1, k_aux // 2)
        pair_idx = jnp.where(is_cand, jnp.arange(m) % half, 0)
        xi_ang = jnp.take_along_axis(
            xi[..., 0], jnp.where(is_cand, pair_idx, jnp.arange(m))[None, :], axis=1
        )
        xi_rad = jnp.take_along_axis(
            xi[..., 1], jnp.where(is_cand, pair_idx, jnp.arange(m))[None, :], axis=1
        )
        mirror = is_cand & (jnp.arange(m) >= half)
        jitter = jnp.where(is_cand[None, :], xi_ang, 0.5)
        base_idx = jnp.where(is_cand, pair_idx, group_idx)
        base_n = jnp.where(is_cand, half, group_n)
        phi = (
            2.0 * jnp.pi * ((jitter + base_idx[None, :]) / base_n[None, :])
            + jnp.where(mirror, jnp.pi, 0.0)[None, :]
        )
        r = jnp.where(
            is_cand[None, :],
            radius * jnp.sqrt(xi_rad),
            scout_mult * radius * (1.0 + 0.2 * xi_rad),
        )
        offs = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)
        u_k = u[:, None, :] + offs  # (N, M, 2), live in u
        u_flat = u_k.reshape(-1, 2)

        o_flat, d_flat = domain.rays(u_flat)
        so = domain.shared_origin
        hit = closest_hit(
            o_flat,
            jax.lax.stop_gradient(d_flat),
            geometry,
            tri_chunk=tri_chunk,
            backend=backend,
            shared_origin=None if so is None else jax.lax.stop_gradient(so),
        )
        hit = jax.tree.map(jax.lax.stop_gradient, hit)

        geo_det = geometry.replace(vertices=jax.lax.stop_gradient(geometry.vertices))
        valid = hit.valid.reshape(n, m)
        prim = jnp.maximum(hit.prim, 0)

        cam_project = domain.project

        # ---- carrier feature: surface hit (own plane) or stationary --------
        own = _plane_eval(o_flat, d_flat, prim, geometry, geo_det, edge_open)
        ndc0 = domain.project(own["x"])[:, :2].reshape(n, m, 2)
        own_b = _screen_boundary(
            own, cam_project, domain.project(own["x_det"]), win,
            geo_det, edge_open, nbrs, prim,
        ).reshape(n, m)
        val0 = jnp.where(valid[..., None], ndc0, u_k)
        b0 = jnp.where(valid, jnp.minimum(own_b, win), win)

        # ---- per-aux feature blend (windowed): accumulator form -----------
        # Extension/shadow features enter through a window:
        # eta = relu(1/(B^2+fb) - 1/(win^2+fb)) is EXACTLY ZERO for B >= win,
        # so a feature appearing while still far from its boundary
        # (guaranteed by the scout ring's wider horizon) changes nothing —
        # onset is seamless and the whole transition is carried by smooth,
        # AD-visible barycentric motion.  `q` tracks the min windowed
        # boundary distance over these features; the carrier is added LAST,
        # suppressed by q^2/(q^2+fb) (see below).
        eta_cap = 1.0 / (win * win + fb)
        acc_eta = jnp.zeros_like(b0)
        acc_val = jnp.zeros_like(val0)
        q_min = jnp.full_like(b0, win)

        def add_feature(fv, fbnd, fon, acc):
            acc_eta, acc_val, q_min = acc
            eta = jnp.where(
                fon, jnp.maximum(1.0 / (fbnd * fbnd + fb) - eta_cap, 0.0), 0.0
            )
            acc_eta = acc_eta + eta
            acc_val = acc_val + eta[..., None] * jnp.where(fon[..., None], fv, u_k)
            q_min = jnp.minimum(
                q_min, jnp.where(fon, jnp.minimum(fbnd, win), win)
            )
            return acc_eta, acc_val, q_min

        # ---- primary-silhouette extensions: one feature PER AUX PLANE ------
        # Every aux (scouts included) donates its hit plane as an extension
        # feature for all sibling rays: barycentrics cross 0 smoothly at the
        # silhouette, so the transition is visible to the forward-mode probes
        # — a frozen hit/miss mask alone would hide it.  Applies to miss aux
        # AND to aux that hit a DIFFERENT surface (e.g. a static backdrop
        # behind a moving occluder): without it, the occluder's velocity
        # influence on the far side would end in a mask cliff at the
        # candidate-disk radius instead of decaying smoothly.
        #
        # Per-aux planes instead of top-R "ref" selection: any rank-based
        # global ref set can be SQUEEZED — when the aux pinning the needed
        # plane crosses out, other legitimately boundary-near planes (a
        # sibling triangle, the receiver's own far edge) can fill every slot
        # and the needed extension vanishes while its window weight is still
        # large, producing a full-height W step (an AD-invisible divergence
        # delta; measured +0.02 vs analytic -0.027 on the occluder-over-
        # receiver test).  With one feature per aux, a feature exists exactly
        # as long as its sourcing aux sees the plane, and the scout-reach
        # bound guarantees that outlives the window.  Inert planes (static,
        # or far from their boundary) gate to zero eta, so duplicates and
        # irrelevant slots are harmless.
        prim_nm = prim.reshape(n, m)

        def ext_slot(acc, slot):
            prim_j, valid_j = slot  # (n,), (n,)
            ext_prim = jnp.broadcast_to(prim_j[:, None], (n, m)).reshape(-1)
            ext = _plane_eval(o_flat, d_flat, ext_prim, geometry, geo_det, edge_open)
            same = valid & (prim_nm == prim_j[:, None])
            ok_ext = (
                (~same)
                & valid_j[:, None]
                & (ext["t"].reshape(n, m) > 1e-4)
            )
            ndc1 = domain.project(ext["x"])[:, :2].reshape(n, m, 2)
            fbnd = _screen_boundary(
                ext, cam_project, domain.project(ext["x_det"]), win,
                geo_det, edge_open, nbrs, ext_prim,
            ).reshape(n, m)
            return add_feature(ndc1, fbnd, ok_ext, acc), None

        # lax.scan over the m slots (identical bodies): unrolling m plane
        # evaluations traced 10x+ longer to compile for no runtime benefit.
        # jax.checkpoint on the body: under linearize / reverse-mode the
        # scan otherwise STACKS each slot's _plane_eval/_screen_boundary
        # intermediates — m slots x (n*m) rays x ~150 floats, measured
        # 2.5 GiB at a 64x64 film and 23 GiB at 96x96 batch 2 (TPU OOM).
        # Rematerializing the slot body stores only the small carry.
        (acc_eta, acc_val, q_min), _ = jax.lax.scan(
            jax.checkpoint(ext_slot),
            (acc_eta, acc_val, q_min),
            (prim_nm.T, valid.T),
        )

        # ---- shadow features, one per delta light ---------------------------
        shadow_dbg = []
        if light_positions is not None and light_positions.shape[0] > 0:
            x_flat = jnp.where(
                valid.reshape(-1)[:, None], own["x"], jax.lax.stop_gradient(own["x"])
            )
            # Theta-detached but SAMPLE-POSITION-LIVE receiver point for the
            # boundary metric: a blanket stop_gradient here also severs the
            # u-dependence, making every shadow eta invisible to the
            # divergence probes (measured: div_theta exactly 0 across the
            # whole shadow band while W_theta was correct -> the estimator
            # delivered 6% of the analytic shadow flux).
            x_flat_det = jnp.where(
                valid.reshape(-1)[:, None],
                own["x_det"],
                jax.lax.stop_gradient(own["x"]),
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
                bprim = jnp.maximum(bhit.prim, 0).reshape(n, m)

                # Shadow footprint projector: a blocker-plane point projected
                # through the light onto the receiver plane, then to screen.
                def shadow_project(q):
                    dq = jax.lax.stop_gradient(q - lpos[None, :])
                    den = jnp.sum(jax.lax.stop_gradient(n_recv) * dq, axis=-1)
                    den = jnp.where(jnp.abs(den) < 1e-9, 1e-9, den)
                    tq = jnp.sum(
                        jax.lax.stop_gradient(n_recv)
                        * jax.lax.stop_gradient(x_flat - lpos[None, :]),
                        axis=-1,
                    ) / den
                    return domain.project(
                        jax.lax.stop_gradient(lpos[None, :] + tq[:, None] * dq)
                    )

                # One shadow feature PER AUX BLOCKER PLANE (same no-squeeze
                # rationale as the primary extensions): every blocked aux
                # donates its blocker plane; all sibling shadow segments are
                # evaluated against it, so the blocker's silhouette motion is
                # smooth in the sample position for the divergence probes.
                def shadow_slot(acc, slot):
                    bprim_j, blocked_j = slot  # (n,), (n,)
                    extb = jnp.broadcast_to(bprim_j[:, None], (n, m)).reshape(-1)
                    sb = _plane_eval(lpos_b, seg, extb, geometry, geo_det, edge_open)
                    t_sb = sb["t"].reshape(n, m)
                    ok_s = (
                        valid
                        & blocked_j[:, None]
                        & (t_sb > 1e-3)
                        & (t_sb < 0.999)
                    )

                    # Project the blocker-plane point through the light onto
                    # the receiver plane: the point is on the L->x ray, so
                    # the primal lands exactly back on x — only the velocity
                    # differs (it moves with the shadow edge, at the
                    # blocker-to-receiver magnification).
                    bm = sb["x"]
                    d_s = bm - lpos[None, :]
                    denom = jnp.sum(n_recv * d_s, axis=-1)
                    safe = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
                    t_s = jnp.sum(
                        n_recv * (x_flat - lpos[None, :]), axis=-1
                    ) / safe
                    x_s = lpos[None, :] + t_s[:, None] * d_s
                    ndc_s = domain.project(x_s)[:, :2].reshape(n, m, 2)

                    # Boundary metric point: theta-detached but LIVE in the
                    # sample position (x_det carries live-ray barycentrics
                    # over detached vertices) — stop_gradient would blind the
                    # divergence probes (see x_flat_det above).
                    dq_det = sb["x_det"] - jax.lax.stop_gradient(lpos)[None, :]
                    den_det = jnp.sum(
                        jax.lax.stop_gradient(n_recv) * dq_det, axis=-1
                    )
                    den_det = jnp.where(jnp.abs(den_det) < 1e-9, 1e-9, den_det)
                    tq_det = jnp.sum(
                        jax.lax.stop_gradient(n_recv)
                        * (x_flat_det - lpos[None, :]),
                        axis=-1,
                    ) / den_det
                    p_det = domain.project(
                        lpos[None, :] + tq_det[:, None] * dq_det
                    )
                    fbnd_s = _screen_boundary(
                        sb, shadow_project, p_det, win,
                        geo_det, edge_open, nbrs, extb,
                    ).reshape(n, m)
                    acc2 = add_feature(ndc_s, fbnd_s, ok_s, acc)
                    dbg = {"ok_s": ok_s, "fbnd_s": fbnd_s, "t_sb": t_sb} if debug else None
                    return acc2, dbg

                (acc_eta, acc_val, q_min), sdbg = jax.lax.scan(
                    # checkpoint: see the ext_slot scan (slot residuals
                    # dominate memory); keep residuals when debugging.
                    shadow_slot if debug else jax.checkpoint(shadow_slot),
                    (acc_eta, acc_val, q_min),
                    (bprim.T, blocked.T),
                )
                if debug:
                    shadow_dbg.append({
                        "per_slot": sdbg,
                        "blocked": blocked,
                        "x_flat": x_flat.reshape(n, m, 3),
                        "bhit_valid": bhit.valid.reshape(n, m),
                    })

        # Carrier, added last with multiplicative suppression q^2/(q^2+fb).
        # Rationale (exact-continuity algebra): when a ray crosses plane P's
        # silhouette outward, the surface behind P intrudes as the new
        # carrier with finite default eta while P's extension eta is finite
        # (1/fb), leaving an O(fb/win^2) velocity jump — an AD-invisible
        # divergence delta along every shared-constellation crossing line.
        # Suppressing the carrier by q^2/(q^2+fb) makes the two one-sided
        # limits match EXACTLY:
        #   inside (carrier = P, q = win):  (1/fb) * win^2/(win^2+fb)
        #   outside (P as extension, B->0): 1/fb - 1/(win^2+fb)
        # which are algebraically identical, while the intruding carrier's
        # eta -> 0 as q -> 0.
        eta0 = (1.0 / (b0 * b0 + fb)) * (q_min * q_min) / (q_min * q_min + fb)
        acc_eta = acc_eta + eta0
        acc_val = acc_val + eta0[..., None] * val0
        val_k = acc_val / jnp.maximum(acc_eta[..., None], 1e-20)
        b_k = jnp.minimum(q_min, b0)

        # Candidates only (scouts sourced ids, they don't vote).
        val_c = val_k[:, :k_aux]
        b_c = b_k[:, :k_aux]
        d2 = jnp.sum(offs[:, :k_aux] * offs[:, :k_aux], axis=-1)
        floor = (radius / kappa) ** 2
        w = 1.0 / (d2 + b_c * b_c + floor)
        w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)
        v_ndc = jnp.sum(w[..., None] * val_c, axis=1)
        if debug:
            return v_ndc - jax.lax.stop_gradient(v_ndc - u), {
                "valid": valid, "prim": prim_nm, "own_b": own_b, "b0": b0,
                "q_min": q_min, "acc_eta": acc_eta, "eta0": eta0,
                "b_c": b_c, "w": w, "val_c": val_c, "shadow": shadow_dbg,
            }
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
    chunk: int = 0,
):
    """Returns (u', area): primal-identical NDC samples whose gradients carry
    silhouette motion (primary, and shadow boundaries when light_positions
    is given), and the area factor 1 + div_u(W) (primal exactly 1).

    `chunk` > 0 processes rays in lax.map chunks of that size — identical
    results (the warp is row-wise with a shared constellation), peak memory
    O(chunk) instead of O(film): required on-chip for 512^2 films (see
    _apply_warp_chunked)."""
    warp = make_warp_field(
        camera, geometry, key, k_aux=k_aux, radius=radius, kappa=kappa,
        tri_chunk=tri_chunk, backend=backend, light_positions=light_positions,
    )
    return _apply_warp_chunked(warp, u, chunk)


def reparam_direction(
    x: Array,
    w: Array,
    geometry: Geometry,
    key: Array,
    k_aux: int = 6,
    radius: float = 0.15,
    kappa: float = 4.0,
    tri_chunk: int = 512,
    backend: str = "auto",
    chunk: int = 0,
):
    """Warped-area reparameterization of per-ray DIRECTIONS.

    x (N, 3): ray origins (primary hit points, offset off the surface);
    w (N, 3): unit central directions (the BSDF samples).  Returns
    (d', area): unit directions primally equal to w whose gradients carry
    the motion of occluder silhouettes as seen from x, plus the gnomonic
    area factor (primal exactly 1).  This is the indirect-bounce analog of
    reparam_ndc (Mitsuba capability: reparameterized integrators behind
    reference main.py:6).

    KEEP `radius` SMALL (~0.05 tangent units, ~2.9 deg — the default).
    The captured boundary flux is radius-dependent: the warp's windowed
    feature blend dilutes edge velocity over scales ~ win = 1.8 * radius,
    and the gnomonic measure distortion grows with the feature offsets
    (features are evaluated out to scout_mult * radius).  Measured r5
    against a DETERMINISTIC quadrature-FD reference (truth 0.413 +- 0.003,
    resolution-independent) on the blocker scene of
    tests/test_reparam_indirect.py, 48^2 film, 8 seeds:
      radius 0.05 -> +1% +- 7%   (unbiased; per-seed std ~0.08)
      radius 0.08 -> -12%        radius 0.10 -> -14%
      radius 0.15 -> -28%        (0.30 -> -53%, 0.50 -> -82% r3 data)
    The same trend reproduces at a single shading point against an exact
    hemisphere quadrature (ratios 0.96 / 0.92 / 0.89 at 0.05/0.10/0.15),
    so the loss is the per-ray estimator's, not the film pipeline's.
    Denser aux does NOT help (k_aux 16 at radius 0.10 measured -27%);
    radius is the lever.  Earlier MC finite-difference references wobbled
    +-6% seed-to-seed at 8 seeds (heavy-tailed CRN jumps) — bias claims
    here use the quadrature witness (render/quadrature.py) instead."""
    m = k_aux + _n_scout(k_aux)

    def one_chunk(x_i, w_i):
        dom = DirectionDomain(x_i, w_i, m)
        warp = make_warp_field(
            None, geometry, key, k_aux=k_aux, radius=radius, kappa=kappa,
            tri_chunk=tri_chunk, backend=backend, domain=dom,
        )
        u0 = jnp.zeros((x_i.shape[0], 2), jnp.float32)
        u_new, area_i = _apply_warp(warp, u0)
        return dom.direction(u_new), area_i

    n = x.shape[0]
    if not chunk or n <= chunk:
        return one_chunk(x, w)
    # Per-ray state (x, w) rides the chunk axis; the warp is row-wise and
    # the constellation key is shared, so this is exactly equivalent to one
    # full application with O(chunk) peak memory (see _apply_warp_chunked).
    pad = (-n) % chunk
    if pad:
        x = jnp.concatenate([x, jnp.broadcast_to(x[:1], (pad, 3))])
        w = jnp.concatenate([w, jnp.broadcast_to(w[:1], (pad, 3))])
    d_new, area = jax.lax.map(
        # checkpoint: see _apply_warp_chunked — the body's linearize
        # residuals otherwise stack per scan iteration in the outer
        # reverse pass.
        jax.checkpoint(lambda xw: one_chunk(*xw)),
        (x.reshape(-1, chunk, 3), w.reshape(-1, chunk, 3)),
    )
    return d_new.reshape(-1, 3)[:n], area.reshape(-1)[:n]


def _apply_warp_chunked(warp, u: Array, chunk: int):
    """_apply_warp over ray chunks via lax.map — bounds peak memory.

    The warp is row-wise (each output row depends only on its own input
    row) and its aux constellation is SHARED across rays (one key-seeded
    draw broadcast to all pixels), so mapping over chunks is exactly
    equivalent to one full application.  Peak HBM scales with `chunk`
    instead of the film: the warp's transient footprint is ~160 KiB/ray
    (k_aux 8; measured 662 MiB for a 64x64 film), so a full 512^2 film
    at batch 16 needs ~2.7 TiB — chunked at 2048 it needs ~5 GiB at
    batch 16.  The warp body is traced ONCE for the map (also a large
    XLA:CPU compile-time win over the full-film fused graph)."""
    n = u.shape[0]
    if not chunk or n <= chunk:
        return _apply_warp(warp, u)
    pad = (-n) % chunk
    u_p = jnp.concatenate([u, jnp.broadcast_to(u[:1], (pad, 2))]) if pad else u
    uc = u_p.reshape(-1, chunk, 2)
    # checkpoint the WHOLE map body, not just the warp: _apply_warp's
    # jax.linearize keeps every warp intermediate alive as a tangent
    # residual (forward-mode — jax.checkpoint inside it only affects
    # reverse passes), and the outer reverse-mode scan STACKS those
    # per-iteration residuals: measured 2.8 GiB/chunk at chunk 16384, so a
    # 512^2 film wanted 45 GiB and hard-crashed the chip while 256^2
    # (11 GiB) just fit.  With the body checkpointed the scan saves only
    # the chunk inputs and re-linearizes in the backward pass.
    u_new, area = jax.lax.map(
        jax.checkpoint(lambda ui: _apply_warp(warp, ui)), uc)
    return u_new.reshape(-1, 2)[:n], area.reshape(-1)[:n]


def _apply_warp(warp, u: Array):
    u_det = jax.lax.stop_gradient(u)

    ex = jnp.broadcast_to(jnp.array([1.0, 0.0], jnp.float32), u_det.shape)
    ey = jnp.broadcast_to(jnp.array([0.0, 1.0], jnp.float32), u_det.shape)
    # linearize + vmap traces `warp` ONCE (primal) plus one batched copy of
    # its tangent-linear graph, instead of two full jvp traces — halves the
    # (pathological on XLA:CPU) reparam grad-compile time.  The outer
    # reverse-mode theta-gradient flows through the linearization residuals
    # unchanged; values are bit-identical to the two-jvp form.
    # jax.checkpoint on the WHOLE warp: linearize otherwise stores every
    # per-aux-ray intermediate as a tangent residual and the outer
    # reverse-mode pass stores them again — measured 9.3 GiB of HBM temp
    # for a 64x64 film (23 GiB at 96x96 batch 2: instant TPU OOM).  With
    # remat the tangent/backward passes recompute the warp instead;
    # measured 64x64 grad temp 4406 -> 662 MiB at ~2x warp compute (the
    # warp is aux-traversal-bound, a fraction of the full render).
    warp = jax.checkpoint(warp)
    v, lin = jax.linearize(warp, u_det)
    dv_x, dv_y = jax.vmap(lin)(jnp.stack([ex, ey]))

    w_field = v - jax.lax.stop_gradient(v)  # primal 0, d/dtheta = dV/dtheta
    u_new = u + w_field
    div = dv_x[:, 0] + dv_y[:, 1]
    area = 1.0 + (div - jax.lax.stop_gradient(div))
    return u_new, area


def reparam_split_value_and_grad(
    scene_fn: Callable,
    image_loss: Callable[[Array], Array],
    key: Array,
    config: RenderConfig,
) -> Callable:
    """Host-split warped-area pose step: value_and_grad of
    image_loss(render_rgb(scene_fn(theta), key, config)) with
    config.reparam=True, computed as a PIPELINE of short device dispatches
    instead of one monolithic jit.

    Why: this environment's TPU tunnel kills any single dispatch over
    ~60s (measured r5: a forward-only 512^2 render scan survives 44s and
    crashes the worker at 69s), and a monolithic 512^2 reparam step runs
    ~220s.  Splitting at the warp-chunk boundary keeps every dispatch
    ~1-2s: phase A runs the warp forward per reparam_chunk rays, phase B
    runs the full render + loss + its gradient w.r.t. (theta, u_rep,
    area) in one (render-sized) dispatch, phase C re-derives each warp
    chunk's theta-cotangent from phase B's (du, darea) cotangents by
    recomputing the chunk under jax.grad (2x warp compute, zero stored
    residuals across dispatches).  total grad = phase-B direct + sum of
    phase-C chunk contributions — the same chain rule the monolithic jit
    applies, so results match render_rgb(reparam=True) to float tolerance
    (asserted by tests/test_reparam.py::test_split_step_matches_monolithic).

    Constraints: spp == 1 (the pose-bench shape), reparam_indirect off
    (the indirect warp lives inside trace_rays and cannot be split at
    this seam).  scene_fn(theta) -> RenderScene must be jit-traceable.

    Returns step(theta) -> (loss, grad_theta); theta any pytree.
    """
    if config.spp != 1:
        raise NotImplementedError("reparam_split_value_and_grad: spp must be 1")
    if config.reparam_indirect:
        raise NotImplementedError(
            "reparam_split_value_and_grad: indirect warp cannot be split"
        )
    from fireflies_tpu.render import lights as lights_mod  # noqa: PLC0415
    from fireflies_tpu.render.pathtracer import (  # noqa: PLC0415
        render_rgb,
        trace_rays,
    )
    from fireflies_tpu.render.rays import _tile_permutation  # noqa: PLC0415

    # Mirror render_rgb's key chain EXACTLY (render_rgb -> _render_rgb_samples
    # -> _film_render -> _film_render_reparam) so the split result is
    # comparable to the monolithic one.
    k_primal, k_grad = jax.random.split(key)
    k0 = jax.random.split(k_grad, 1)[0]
    k_pix, k_path = jax.random.split(k0)
    k_jit, k_warp = jax.random.split(k_pix)

    w, h = config.width, config.height
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    px, py = jnp.meshgrid(xs, ys)
    jit_xy = jax.random.uniform(k_jit, (h * w, 2))
    u = pixel_to_ndc(
        px.reshape(-1) + jit_xy[:, 0], py.reshape(-1) + jit_xy[:, 1], w, h
    )
    n = u.shape[0]
    chunk = config.reparam_chunk or 2048
    pad = (-n) % chunk
    u_p = jnp.concatenate([u, jnp.broadcast_to(u[:1], (pad, 2))]) if pad else u
    u_chunks = u_p.reshape(-1, chunk, 2)

    def _warp_chunk(theta, u_i):
        scene = scene_fn(theta)
        positions = lights_mod.emitter_positions(scene.lights, scene.projector)
        light_positions = jnp.stack(positions) if positions else None
        warp = make_warp_field(
            scene.camera, scene.geometry, k_warp,
            k_aux=config.reparam_k_aux, radius=config.reparam_radius,
            tri_chunk=config.tri_chunk, backend=config.backend,
            light_positions=light_positions,
        )
        return _apply_warp(warp, u_i)

    warp_fwd = jax.jit(_warp_chunk)

    @jax.jit
    def warp_vjp(theta, u_i, du_i, da_i):
        def dotted(th):
            u_new, area = _warp_chunk(th, u_i)
            return jnp.vdot(u_new, du_i) + jnp.vdot(area, da_i)

        return jax.grad(dotted)(theta)

    perm, inv = _tile_permutation(w, h, 128, 16)
    perm = jnp.asarray(perm)
    inv = jnp.asarray(inv)

    @jax.jit
    def render_grad(theta, u_rep, area):
        def loss_of(th, ur, ar):
            scene = scene_fn(th)
            primal = jax.lax.stop_gradient(
                render_rgb(scene, k_primal, config.replace(reparam=False))
            )
            o, d = rays_from_ndc(scene.camera, ur)
            radiance = trace_rays(
                scene, o[perm], d[perm], k_path, config,
                primary_origin=scene.camera.to_world[:3, 3],
            )
            g_img = (radiance * ar[perm][:, None])[inv].reshape(h, w, 3)
            img = primal + g_img - jax.lax.stop_gradient(g_img)
            return image_loss(img)

        return jax.value_and_grad(loss_of, argnums=(0, 1, 2))(theta, u_rep, area)

    def step(theta):
        outs = [warp_fwd(theta, u_chunks[i]) for i in range(u_chunks.shape[0])]
        u_rep = jnp.concatenate([o[0] for o in outs])[:n]
        area = jnp.concatenate([o[1] for o in outs])[:n]
        loss, (d_theta, du, da) = render_grad(theta, u_rep, area)
        # Padded lanes were trimmed before phase B, so their cotangents
        # are exactly zero.
        if pad:
            du = jnp.concatenate([du, jnp.zeros((pad, 2), du.dtype)])
            da = jnp.concatenate([da, jnp.zeros((pad,), da.dtype)])
        du_c = du.reshape(-1, chunk, 2)
        da_c = da.reshape(-1, chunk)
        for i in range(u_chunks.shape[0]):
            d_theta = jax.tree.map(
                jnp.add, d_theta, warp_vjp(theta, u_chunks[i], du_c[i], da_c[i])
            )
        return loss, d_theta

    return step


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

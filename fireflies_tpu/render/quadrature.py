"""Deterministic quadrature transport integrator — the second witness.

Mitsuba cannot be installed in this environment, so the RMSE parity the
reference gets for free (its renders ARE Mitsuba renders,
fireflies/graphics/depth.py:77 `mi.render`) needs an in-repo substitute:
two *independent* implementations of scene transport that agree within
measured noise bounds.  The furnace tests (tests/test_furnace.py) validate
the BSDF layer; this module validates the INTEGRATOR — it shares no
estimator code with render/pathtracer.py (no NEE sampling, no MIS, no
BSDF importance sampling, no PRNG at all):

  * primary hits via the brute-force reference intersector,
  * direct lighting from delta emitters evaluated exactly (intensity/r^2,
    spot falloff) with brute-force segment visibility,
  * indirect transport via product Gauss-Legendre quadrature over the
    upper hemisphere (mu = cos(theta) nodes x uniform phi nodes), wired
    recursively to `max_bounces` path vertices.

What it DOES share with the path tracer is the pure function tables —
`bsdf.evaluate_v` (a deterministic BSDF evaluation validated independently
by the furnace tests) and the geometry itself.  Those are the quantities
under test's *inputs*, not its estimator.

Deterministic and sampling-free: its only error terms are quadrature
truncation (controlled by n_mu/n_phi; the integrand is C^0 in direction —
visibility steps — so the product rule converges like a Riemann sum on
the visibility term and spectrally on the smooth BSDF term).

CPU-scale by design (the node fan-out multiplies rays by n_mu*n_phi per
bounce); used by tests/test_transport_quadrature.py on small films.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from fireflies_tpu.render import bsdf as bsdf_mod
from fireflies_tpu.render.intersect import intersect_brute
from fireflies_tpu.render.types import LIGHT_SPOT, RenderScene
from fireflies_tpu.render.vec3 import Vec3, from_array, splat

Array = jax.Array

_EPS = 1e-3  # shadow/bounce origin offset (pathtracer._SHADOW_EPS analog)


def _check_supported(scene: RenderScene) -> None:
    if scene.geometry.emissive_faces is not None:
        raise NotImplementedError("quadrature witness: area lights")
    if scene.background is not None and jnp.ndim(scene.background) == 3:
        raise NotImplementedError("quadrature witness: envmap background")
    if scene.projector is not None:
        raise NotImplementedError("quadrature witness: projector")


def _face_normal_mat(scene: RenderScene, prim: Array):
    """Geometric normal (normalize(e1 x e2)) + material id per hit, straight
    from the triangle soup — independent of pathtracer.hit_attributes*."""
    geo = scene.geometry
    f = geo.faces[jnp.maximum(prim, 0)]
    v0 = geo.vertices[f[:, 0]]
    e1 = geo.vertices[f[:, 1]] - v0
    e2 = geo.vertices[f[:, 2]] - v0
    n = jnp.cross(e1, e2)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    mat = geo.face_mat[jnp.maximum(prim, 0)]
    return from_array(n), mat


def _segment_blocked(scene: RenderScene, o: Array, seg: Array) -> Array:
    """Is the open segment o -> o + seg blocked?  Brute-force closest hit
    with t in (eps, 1 - eps) of the segment parameter."""
    hit = intersect_brute(o, seg, scene.geometry, t_min=1e-4, t_max=1.0 - 1e-4)
    return hit.valid


def _direct_delta(scene: RenderScene, p: Vec3, ns: Vec3, wo: Vec3,
                  params: dict, n_geo: Vec3) -> Vec3:
    """Exact direct lighting from every delta emitter (point/spot):
    f * (intensity / r^2) * falloff * |cos| * V.  Written from the emitter
    model's definition (Lights docstring), not from lights_mod's NEE path."""
    lights = scene.lights
    zeros = jnp.zeros_like(p.x)
    out = Vec3(zeros, zeros, zeros)
    n_l = int(lights.kinds.shape[0]) if lights is not None else 0
    for li in range(n_l):
        to_world = lights.to_world[li]
        pos = to_world[:3, 3]
        delta = splat(pos) - p
        dist = delta.norm()
        wi = delta * (1.0 / (dist + 1e-20))
        rad = splat(lights.intensity[li]) * (1.0 / jnp.maximum(dist * dist, 1e-12))
        # Spot falloff: Mitsuba-style smooth edge between beam and cutoff
        # angles, measured from the emitter's -Z axis.
        cos_angle = (-wi).dot(splat(-to_world[:3, 2]))
        cutoff_c, beam_c = lights.cutoff_cos[li], lights.beam_cos[li]
        t_fall = (cos_angle - cutoff_c) / jnp.maximum(beam_c - cutoff_c, 1e-6)
        falloff = jnp.clip(t_fall, 0.0, 1.0)
        falloff = jnp.where(lights.kinds[li] == LIGHT_SPOT, falloff, 1.0)
        scale = jnp.where(lights.active[li], falloff, 0.0)

        # Visibility of the segment light -> offset surface point.
        side = jnp.where(n_geo.dot(wi) >= 0, 1.0, -1.0)
        shadow_o = (p + n_geo * (side * _EPS)).to_array()
        seg = pos[None, :] - shadow_o
        blocked = _segment_blocked(scene, shadow_o, seg)

        f = bsdf_mod.evaluate_v(params, ns, wo, wi)
        cos_i = jnp.abs(ns.dot(wi))
        vis = jnp.where(blocked, 0.0, cos_i) * scale
        out = out + f * rad * vis
    return out


def _gauss_mu_phi(n_mu: int, n_phi: int):
    """Product rule nodes/weights for int over the hemisphere of
    g(wi) dwi = int_0^{2pi} int_0^1 g(mu, phi) dmu dphi  (mu = cos theta)."""
    x, w = np.polynomial.legendre.leggauss(n_mu)  # over [-1, 1]
    mu = 0.5 * (x + 1.0)
    w_mu = 0.5 * w
    phi = (np.arange(n_phi) + 0.5) * (2.0 * np.pi / n_phi)
    w_phi = np.full(n_phi, 2.0 * np.pi / n_phi)
    mu_g, phi_g = np.meshgrid(mu, phi, indexing="ij")
    w_g = np.outer(w_mu, w_phi)
    return (
        jnp.asarray(mu_g.ravel(), jnp.float32),
        jnp.asarray(phi_g.ravel(), jnp.float32),
        jnp.asarray(w_g.ravel(), jnp.float32),
    )


def _onb(n: Vec3) -> tuple[Vec3, Vec3]:
    """Branchless orthonormal basis (Duff et al. 2017) — local copy so the
    witness does not lean on bsdf's frame helpers."""
    s = jnp.where(n.z >= 0, 1.0, -1.0)
    a = -1.0 / (s + n.z)
    b = n.x * n.y * a
    t = Vec3(1.0 + s * n.x * n.x * a, s * b, -s * n.x)
    bt = Vec3(b, s + n.y * n.y * a, -n.y)
    return t, bt


def radiance_quadrature(
    scene: RenderScene,
    o: Array,
    d: Array,
    max_bounces: int = 2,
    n_mu: int = 24,
    n_phi: int = 48,
) -> Array:
    """Deterministic radiance for rays (N, 3) -> (N, 3).

    Matches render/pathtracer.py's transport definition (emission at every
    vertex, direct delta lighting at every vertex, BSDF transport between
    vertices, constant background on escape) with quadrature in place of
    Monte Carlo.  Supports delta lights + constant background only (the
    golden-scene feature set); raises NotImplementedError otherwise.
    """
    _check_supported(scene)
    bg = (
        jnp.zeros(3, jnp.float32)
        if scene.background is None
        else jnp.asarray(scene.background, jnp.float32)
    )
    mu, phi, w_q = _gauss_mu_phi(n_mu, n_phi)
    n_dirs = mu.shape[0]

    def level(o_a: Array, d_a: Array, depth: int) -> Vec3:
        """Outgoing radiance toward -d_a for rays o_a + t d_a (N, 3)."""
        n_rays = o_a.shape[0]
        hit = intersect_brute(o_a, d_a, scene.geometry, t_min=1e-4)
        d_v = from_array(d_a)
        miss = ~hit.valid
        bg_v = splat(bg)

        p = from_array(o_a) + d_v * hit.t
        n_geo, mat_id = _face_normal_mat(scene, hit.prim)
        flip = jnp.sign(-n_geo.dot(d_v))
        flip = jnp.where(flip == 0, 1.0, flip)
        n = n_geo * flip
        wo = -d_v
        params = bsdf_mod.gather_params(scene.materials, mat_id)
        params["eta_rel"] = jnp.where(
            flip > 0, params["ior"], 1.0 / jnp.maximum(params["ior"], 1e-3)
        )
        # Flat shading: the golden scenes carry no vertex normals, so the
        # shading normal IS the faced geometric normal (pathtracer's
        # n_base = n branch).
        ns = n

        out = bsdf_mod._colv(params, "emission")
        out = out + _direct_delta(scene, p, ns, wo, params, n)

        if depth + 1 < max_bounces:
            # Hemisphere quadrature around ns:
            #   L_ind = int f(wo, wi) L_in(wi) cos dwi
            #         ~= sum_k w_k f(wo, wi_k) L_in(wi_k) mu_k
            t_b, bt_b = _onb(ns)
            sin_t = jnp.sqrt(jnp.maximum(1.0 - mu * mu, 0.0))
            lx = sin_t * jnp.cos(phi)  # (K,)
            ly = sin_t * jnp.sin(phi)
            # wi for every (ray, node): (N, K) per component.
            def comp(nc, tc, bc):
                return (
                    tc[:, None] * lx[None, :]
                    + bc[:, None] * ly[None, :]
                    + nc[:, None] * mu[None, :]
                )
            wix = comp(ns.x, t_b.x, bt_b.x)
            wiy = comp(ns.y, t_b.y, bt_b.y)
            wiz = comp(ns.z, t_b.z, bt_b.z)

            side = jnp.where(n.dot(from_array(d_a)) <= 0, 1.0, -1.0)
            o_next = (p + n * (side * _EPS)).to_array()  # (N, 3)
            o_rep = jnp.repeat(o_next, n_dirs, axis=0)  # (N*K, 3)
            d_next = jnp.stack(
                [wix.reshape(-1), wiy.reshape(-1), wiz.reshape(-1)], axis=-1
            )
            l_in = level(o_rep, d_next, depth + 1)  # Vec3 over (N*K,)

            # f(wo, wi_k) for all nodes: broadcast params/frames via repeat.
            def rep(x):
                return jnp.repeat(x, n_dirs, axis=0)
            params_k = {
                # Repeat arrays AND cached Vec3 entries (bsdf._colv memoizes
                # "<field>_v" Vec3s into the dict); non-pytree entries (the
                # static lobe-flags frozenset / None) pass through untouched.
                k: (
                    jax.tree.map(rep, v)
                    if isinstance(v, (jax.Array, Vec3))
                    else v
                )
                for k, v in params.items()
            }
            ns_k = Vec3(rep(ns.x), rep(ns.y), rep(ns.z))
            wo_k = Vec3(rep(wo.x), rep(wo.y), rep(wo.z))
            wi_k = from_array(d_next)
            f_k = bsdf_mod.evaluate_v(params_k, ns_k, wo_k, wi_k)
            integrand = f_k * l_in  # Vec3 (N*K,)
            w_cos = (w_q * mu)[None, :]  # (1, K): weight * cos(theta)

            def reduce_c(c):
                return jnp.sum(c.reshape(n_rays, n_dirs) * w_cos, axis=1)
            ind = Vec3(
                reduce_c(integrand.x), reduce_c(integrand.y), reduce_c(integrand.z)
            )
            out = out + ind

        # Escaped rays see the constant background instead of surface terms.
        return Vec3(
            jnp.where(miss, bg_v.x, out.x),
            jnp.where(miss, bg_v.y, out.y),
            jnp.where(miss, bg_v.z, out.z),
        )

    return level(o, d, 0).to_array()

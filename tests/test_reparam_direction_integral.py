"""Isolated validation of the DirectionDomain warped-area estimator.

tests/test_reparam_indirect.py validates the warp end-to-end through the
path tracer, where per-eval cost (minutes) forces few seeds and loose
tolerances.  This file tests reparam_direction DIRECTLY on a visibility
integral with a closed-form boundary derivative, cheap enough for tight
tolerances:

    I(theta) = mean over a fixed gnomonic patch of
               g(w) * [w hits blocker(theta)]

where the blocker is a quad at z = -1 spanning u in [-3+theta, b+theta]
(gnomonic coords u = -w_x/w_z, v = -w_y/w_z: a central projection makes
the quad EXACTLY the rectangle u <= b+theta, |v| <= c inside the patch).
Only the right edge u = b+theta lies in the patch, so

    dI/dtheta = (1/|patch|) * integral over v in [-c, c] of g(u=b+theta, v)

by 1-D quadrature.  The indicator is evaluated DETACHED at the warped
direction — the detached gradient is exactly zero (asserted) and the whole
signal must come from the warp + its divergence area factor, which is the
estimator under test.

MEASURE CONVENTION (the trap this file exists to pin): reparam_direction's
`area` is the warp Jacobian in each ray's LOCAL gnomonic tangent plane,
which at u=0 equals the SOLID-ANGLE Jacobian to first order — that is the
measure of the path tracer's integrals.  This test's integral is in GLOBAL
gnomonic uv measure, so the estimator's Jacobian must be converted:
J_uv = J_omega * rho(w)/rho(T(w)) with rho(d) = d_omega/d_uv = |d_z|^3
(for unit d: 1+u^2+v^2 = 1/d_z^2).  Omitting the rho ratio flips the
gradient SIGN at this patch eccentricity (measured -0.25 vs +0.80): the
far-field warp velocity (~0.3 of the edge velocity) rides the gnomonic
measure gradient.  This is the same lesson as reparam_ndc's NDC-vs-
direction divergence (CLAUDE.md), seen from the other side.

SECOND TRAP (also pinned here): the divergence form is only consistent
when the integrand vanishes on the integration-domain boundary.  The
production integrals are over the whole sphere (no boundary); a test that
truncates to a uv window MUST window the integrand smoothly to zero at the
border or warp flux leaks through it (measured +0.20 vs truth +0.80 with
the measure fixed but no window; windowed: 1.8% rel err).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fireflies_tpu.render.reparam import reparam_direction
from fireflies_tpu.render.types import Geometry

B = 0.8          # right edge of the blocker in gnomonic u
C = 0.6          # |v| half-extent
U0, U1 = 0.2, 1.4   # patch (contains the right edge, excludes the left)
V0, V1 = -0.9, 0.9


def _blocker_geo(theta):
    # Quad at z = -1: x in [-3 + theta, B + theta], y in [-C, C].
    verts = jnp.stack([
        jnp.stack([-3.0 + theta, jnp.float32(-C), jnp.float32(-1.0)]),
        jnp.stack([B + theta, jnp.float32(-C), jnp.float32(-1.0)]),
        jnp.stack([B + theta, jnp.float32(C), jnp.float32(-1.0)]),
        jnp.stack([-3.0 + theta, jnp.float32(C), jnp.float32(-1.0)]),
    ])
    faces = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
    return Geometry(
        vertices=verts, faces=faces,
        face_mat=jnp.zeros(2, jnp.int32), face_mesh=jnp.zeros(2, jnp.int32),
    )


def _g(u, v):
    """Smooth radiance over the patch (must be nonconstant to catch
    magnitude errors in the flux)."""
    return 1.0 + 0.5 * u + 0.3 * v * v


def _window(u, v):
    """Smooth window vanishing at the patch borders.  The divergence-form
    estimator is only consistent when the integrand vanishes on the domain
    boundary (in production the domain is the whole sphere — no boundary);
    with a fixed uv window and a warp field that does NOT vanish at the
    border, flux leaks through it (measured: +0.20 vs truth +0.80 without
    this factor).  sin^2 is C^1 at the border and exactly 0 outside."""
    tu = jnp.clip((u - U0) / (U1 - U0), 0.0, 1.0)
    tv = jnp.clip((v - V0) / (V1 - V0), 0.0, 1.0)
    return jnp.sin(jnp.pi * tu) ** 2 * jnp.sin(jnp.pi * tv) ** 2


def _samples(key, n):
    uv = jax.random.uniform(key, (n, 2))
    u = U0 + (U1 - U0) * uv[:, 0]
    v = V0 + (V1 - V0) * uv[:, 1]
    w = jnp.stack([u, v, -jnp.ones_like(u)], -1)
    return w / jnp.linalg.norm(w, axis=-1, keepdims=True)


def _estimate_grad(key, n=8192, k_aux=8, radius=0.15):
    w = _samples(key, n)
    x = jnp.zeros((n, 3), jnp.float32)

    def integral(theta):
        geo = _blocker_geo(theta)
        d_new, area = reparam_direction(
            x, w, geo, jax.random.fold_in(key, 7), k_aux=k_aux,
            radius=radius, tri_chunk=8,
        )
        # Detached indicator at the WARPED direction: gnomonic coords of
        # d' against the rect at stop_gradient(theta).
        th = jax.lax.stop_gradient(theta)
        u_p = -d_new[:, 0] / d_new[:, 2]
        v_p = -d_new[:, 1] / d_new[:, 2]
        hit = ((u_p <= B + th) & (u_p >= -3.0 + th)
               & (jnp.abs(v_p) <= C)).astype(jnp.float32)
        # Solid-angle -> global-uv Jacobian conversion (see module doc):
        # rho(d) = |d_z|^3; rho at the sample is detached, rho at the
        # warped direction is live.
        rho_w = jax.lax.stop_gradient(jnp.abs(w[:, 2]) ** 3)
        rho_t = jnp.abs(d_new[:, 2]) ** 3
        return jnp.mean(_g(u_p, v_p) * _window(u_p, v_p) * hit
                        * area * rho_w / rho_t)

    return float(jax.grad(integral)(jnp.float32(0.0)))


def _analytic_grad():
    # dI/dtheta = (1/|patch|) * int_{-C}^{C} m(B, v) g(B, v) dv, |patch|
    # in uv.  Only the moving right edge u = B + theta contributes; the
    # blocker's v-edges are static and its left edge is outside the patch.
    v = np.linspace(-C, C, 4001)
    m = np.asarray(_window(jnp.full(v.shape, B), jnp.asarray(v)))
    return float(np.trapezoid(m * _g(B, v), v) / ((U1 - U0) * (V1 - V0)))


def test_detached_indicator_has_zero_gradient():
    """Without the warp the same functional has gradient exactly 0."""
    w = _samples(jax.random.key(0), 2048)

    def integral(theta):
        th = jax.lax.stop_gradient(theta)
        u_p = -w[:, 0] / w[:, 2]
        v_p = -w[:, 1] / w[:, 2]
        hit = ((u_p <= B + th) & (u_p >= -3.0 + th)
               & (jnp.abs(v_p) <= C)).astype(jnp.float32)
        return jnp.mean(_g(u_p, v_p) * hit)

    assert abs(float(jax.grad(integral)(jnp.float32(0.0)))) < 1e-9


def test_direction_warp_boundary_flux_matches_quadrature():
    """The tight estimator validation the end-to-end test can't afford:
    multi-key mean within 10% of the quadrature truth (measured 1.8%
    rel err, per-seed spread 0.559-0.580 vs truth 0.5596)."""
    ref = _analytic_grad()
    assert ref > 0.1  # sanity: growing theta uncovers weighted area
    grads = [_estimate_grad(jax.random.key(10 + s)) for s in range(4)]
    g = float(np.mean(grads))
    assert g == pytest.approx(ref, rel=0.10), (g, ref, grads)

"""Principled BSDF (Disney/Burley subset) — evaluation and sampling.

Replaces Mitsuba's `principled` plugin for the parameter set the reference
randomizes (main.py:99-107): base_color, roughness, metallic, specular,
spec_tint, clearcoat, clearcoat_gloss, sheen, sheen_tint, anisotropic,
spec_trans, flatness.  Implemented lobes:

  * Burley diffuse with flatness (Hanrahan-Krueger subsurface lerp)
  * sheen
  * GGX specular with Schlick Fresnel (metallic/specular/spec_tint F0 mix)
  * GTR1 clearcoat
  * rough-dielectric glass (spec_trans, thin = 0, Mitsuba `principled`
    parity): Walter-style microfacet refraction + dielectric-Fresnel
    reflection with `ior`, TIR, and entering/exiting sidedness via
    params["eta_rel"]; satisfies Walter radiance reciprocity
    f(i->o)/eta_o^2 symmetric (validated numerically)
  * Disney-thin diffuse transmission (spec_trans, thin = 1) with
    transmission-side sampling
  * anisotropic GGX (Disney aspect split, Heitz Smith-G1) oriented by the
    UV-derived tangent frame when the mesh has UVs (arbitrary ONB otherwise)

All functions are vectorized over N shading points with per-point parameter
rows (gather `Materials` rows by mat_id first, see `gather_params`).
Convention: `wo` points *away* from the surface toward the viewer, `wi`
toward the light; both unit, world space; `n` is the shading normal.
Returned values are BSDF f (without the |cos| factor).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fireflies_tpu.render.types import Materials

Array = jax.Array

_EPS = 1e-7


def gather_params(materials: Materials, mat_id: Array) -> dict[str, Array]:
    """Gather per-point parameter rows: {field: (N, ...)}."""
    out = {}
    for field in (
        "base_color roughness metallic specular spec_tint clearcoat "
        "clearcoat_gloss sheen sheen_tint anisotropic spec_trans flatness "
        "ior thin emission"
    ).split():
        out[field] = getattr(materials, field)[mat_id]
    return out


def _eta_rel(params: dict[str, Array]) -> Array:
    """Relative IOR n_transmitted / n_incident for the glass lobe.

    Callers that track medium sidedness (the path tracer) inject
    params["eta_rel"] = ior on front-face (entering) hits and 1/ior on
    back-face (exiting) hits; standalone evaluation defaults to entering.
    Clamped away from 1 — at eta == 1 the refraction half-vector
    degenerates (wo + eta*wi -> 0 at straight-through)."""
    eta = params.get("eta_rel", params["ior"])
    return jnp.where(
        jnp.abs(eta - 1.0) < 1e-3, jnp.where(eta >= 1.0, 1.0 + 1e-3, 1.0 - 1e-3), eta
    )


def _fresnel_dielectric(cos_i: Array, eta: Array) -> Array:
    """Exact unpolarized dielectric Fresnel reflectance.  cos_i >= 0 on the
    incident side; eta = n_t / n_i.  Returns 1 under total internal
    reflection."""
    cos_i = jnp.clip(cos_i, 0.0, 1.0)
    sin2_t = (1.0 - cos_i * cos_i) / jnp.maximum(eta * eta, _EPS)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    r_par = (eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, _EPS)
    r_perp = (cos_i - eta * cos_t) / jnp.maximum(cos_i + eta * cos_t, _EPS)
    f = 0.5 * (r_par * r_par + r_perp * r_perp)
    return jnp.where(tir, 1.0, jnp.clip(f, 0.0, 1.0))


def _schlick(u: Array) -> Array:
    m = jnp.clip(1.0 - u, 0.0, 1.0)
    return m**5


def _luminance(c: Array) -> Array:
    return 0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2]


def _aniso_alphas(params) -> tuple[Array, Array]:
    """Disney anisotropic roughness split: aspect = sqrt(1 - 0.9 aniso)."""
    alpha = jnp.clip(params["roughness"], 0.01, 1.0) ** 2
    aspect = jnp.sqrt(1.0 - 0.9 * jnp.clip(params["anisotropic"], 0.0, 1.0))
    return jnp.maximum(alpha / aspect, 1e-4), jnp.maximum(alpha * aspect, 1e-4)


def _d_ggx(cos_h: Array, alpha: Array) -> Array:
    a2 = alpha * alpha
    denom = cos_h * cos_h * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(jnp.pi * denom * denom, _EPS)


def _d_ggx_aniso(hx: Array, hy: Array, hz: Array, ax: Array, ay: Array) -> Array:
    """Anisotropic GGX NDF in the local (tangent, bitangent, normal) frame.
    Reduces exactly to _d_ggx at ax == ay."""
    q = (hx * hx) / (ax * ax) + (hy * hy) / (ay * ay) + hz * hz
    return 1.0 / jnp.maximum(jnp.pi * ax * ay * q * q, _EPS)


def _g1_smith_aniso(wx: Array, wy: Array, wz: Array, ax: Array, ay: Array) -> Array:
    """Smith G1 with per-axis roughness (Heitz 2014); matches _g_smith_ggx
    at ax == ay."""
    wz2 = jnp.maximum(wz * wz, _EPS)
    lam = 0.5 * (-1.0 + jnp.sqrt(1.0 + (ax * ax * wx * wx + ay * ay * wy * wy) / wz2))
    return 1.0 / (1.0 + lam)


def _d_gtr1(cos_h: Array, alpha: Array) -> Array:
    a2 = alpha * alpha
    denom = jnp.pi * jnp.log(jnp.maximum(a2, _EPS)) * (1.0 + (a2 - 1.0) * cos_h * cos_h)
    return (a2 - 1.0) / jnp.where(jnp.abs(denom) < _EPS, _EPS, denom)


def _g_smith_ggx(cos_v: Array, alpha: Array) -> Array:
    a2 = alpha * alpha
    c2 = cos_v * cos_v
    return 2.0 * cos_v / jnp.maximum(cos_v + jnp.sqrt(a2 + c2 - a2 * c2), _EPS)


def evaluate(
    params: dict[str, Array], n: Array, wo: Array, wi: Array,
    tangent: Array | None = None,
) -> Array:
    """BSDF value f(wo, wi); (N, 3).

    Reflection lobes for wi above the horizon; Disney-thin diffuse
    transmission (spec_trans) for wi below: f = sqrt(base_color)/pi *
    spec_trans * (1 - metallic) — the thin-surface translucency the
    reference randomizes on mucosa (main.py:106)."""
    cos_o_s = jnp.sum(n * wo, axis=-1)
    cos_i_s = jnp.sum(n * wi, axis=-1)
    reflect_side = (cos_o_s > _EPS) & (cos_i_s > _EPS)
    trans_side = (cos_o_s > _EPS) & (cos_i_s < -_EPS)
    cos_o = jnp.maximum(jnp.abs(cos_o_s), _EPS)
    cos_i = jnp.maximum(jnp.abs(cos_i_s), _EPS)

    h = wo + wi
    h = h / (jnp.linalg.norm(h, axis=-1, keepdims=True) + 1e-20)
    cos_h = jnp.maximum(jnp.sum(n * h, axis=-1), 0.0)
    cos_d = jnp.maximum(jnp.sum(wi * h, axis=-1), 0.0)  # = dot(wo, h)

    base = params["base_color"]
    rough = jnp.clip(params["roughness"], 0.01, 1.0)
    metallic = params["metallic"]
    flatness = params["flatness"]

    # ---- Burley diffuse + subsurface ------------------------------------
    fd90 = 0.5 + 2.0 * rough * cos_d * cos_d
    f_in = 1.0 + (fd90 - 1.0) * _schlick(cos_i)
    f_out = 1.0 + (fd90 - 1.0) * _schlick(cos_o)
    diffuse = f_in * f_out

    fss90 = rough * cos_d * cos_d
    fss_in = 1.0 + (fss90 - 1.0) * _schlick(cos_i)
    fss_out = 1.0 + (fss90 - 1.0) * _schlick(cos_o)
    ss = 1.25 * (fss_in * fss_out * (1.0 / (cos_i + cos_o) - 0.5) + 0.5)

    diff_mix = diffuse * (1.0 - flatness) + ss * flatness
    diffuse_weight = (1.0 - metallic) * (1.0 - params["spec_trans"])
    f_diffuse = (base / jnp.pi) * (diff_mix * diffuse_weight)[:, None]

    # ---- Sheen -----------------------------------------------------------
    lum = jnp.maximum(_luminance(base), _EPS)
    tint = base / lum[:, None]
    sheen_color = (1.0 - params["sheen_tint"])[:, None] + params["sheen_tint"][:, None] * tint
    f_sheen = (
        params["sheen"][:, None]
        * sheen_color
        * (_schlick(cos_d) * (1.0 - metallic))[:, None]
    )

    # ---- GGX specular (anisotropic-aware) ---------------------------------
    spec_color = (1.0 - params["spec_tint"])[:, None] + params["spec_tint"][:, None] * tint
    f0 = (
        (0.08 * params["specular"])[:, None] * spec_color * (1.0 - metallic)[:, None]
        + base * metallic[:, None]
    )
    fresnel = f0 + (1.0 - f0) * _schlick(cos_d)[:, None]
    ax, ay = _aniso_alphas(params)
    t, bt = _frame(n, tangent)
    hx = jnp.sum(h * t, axis=-1)
    hy = jnp.sum(h * bt, axis=-1)
    d_spec = _d_ggx_aniso(hx, hy, cos_h, ax, ay)
    g_spec = _g1_smith_aniso(
        jnp.sum(wi * t, -1), jnp.sum(wi * bt, -1), cos_i, ax, ay
    ) * _g1_smith_aniso(
        jnp.sum(wo * t, -1), jnp.sum(wo * bt, -1), cos_o, ax, ay
    )
    f_specular = fresnel * (d_spec * g_spec / (4.0 * cos_i * cos_o))[:, None]

    # ---- Clearcoat -------------------------------------------------------
    alpha_cc = 0.1 * (1.0 - params["clearcoat_gloss"]) + 0.001 * params["clearcoat_gloss"]
    d_cc = _d_gtr1(cos_h, alpha_cc)
    f_cc = 0.04 + 0.96 * _schlick(cos_d)
    g_cc = _g_smith_ggx(cos_i, jnp.full_like(alpha_cc, 0.25)) * _g_smith_ggx(
        cos_o, jnp.full_like(alpha_cc, 0.25)
    )
    f_clearcoat = (0.25 * params["clearcoat"] * d_cc * f_cc * g_cc / (4.0 * cos_i * cos_o))[
        :, None
    ]

    # ---- Glass lobe (rough-dielectric, Walter/PBRT microfacet model) ------
    # Mitsuba `principled` parity: spec_trans on a non-thin surface is
    # microfacet refraction with `ior` (reference main.py:99-107 randomizes
    # spec_trans on the principled BSDF).  The glass lobe carries BOTH its
    # dielectric-Fresnel reflection (replacing the plain specular for its
    # share) and the (1-F) refraction; `thin` = 1 falls back to the
    # Disney-thin diffuse transmission below.
    eta = _eta_rel(params)
    thin = jnp.clip(params["thin"], 0.0, 1.0)
    glass_w = params["spec_trans"] * (1.0 - metallic) * (1.0 - thin)
    alpha_g = jnp.clip(params["roughness"], 0.01, 1.0) ** 2

    # Reflection half of the glass lobe (shares h with the specular lobe).
    f_dielec = _fresnel_dielectric(cos_d, eta)
    d_g = _d_ggx(cos_h, alpha_g)
    g_g = _g_smith_ggx(cos_i, alpha_g) * _g_smith_ggx(cos_o, alpha_g)
    f_glass_refl = (f_dielec * d_g * g_g / (4.0 * cos_i * cos_o))[:, None]

    # Refraction half: wh_t = normalize(wo + eta * wi) flipped to the upper
    # hemisphere; radiance-transport factors cancel (eta^2 * (1/eta)^2).
    wh_t = wo + eta[:, None] * wi
    wh_t = wh_t / (jnp.linalg.norm(wh_t, axis=-1, keepdims=True) + 1e-20)
    wh_t = wh_t * jnp.sign(jnp.sum(wh_t * n, axis=-1, keepdims=True) + 1e-20)
    cos_wh = jnp.clip(jnp.sum(n * wh_t, axis=-1), 0.0, 1.0)
    wo_wh = jnp.sum(wo * wh_t, axis=-1)
    wi_wh = jnp.sum(wi * wh_t, axis=-1)
    sqrt_denom = wo_wh + eta * wi_wh
    f_t_dielec = _fresnel_dielectric(jnp.abs(wo_wh), eta)
    d_t = _d_ggx(cos_wh, alpha_g)
    g_t = _g_smith_ggx(cos_i, alpha_g) * _g_smith_ggx(cos_o, alpha_g)
    t_tint = jnp.sqrt(jnp.maximum(base, 0.0))
    # Physical refraction pairs straddle the half-vector (wo.h > 0,
    # wi.h < 0); the reconstruction is spurious otherwise.
    refr_ok = (wo_wh > _EPS) & (wi_wh < -_EPS)
    f_glass_trans = (
        t_tint
        * jnp.where(
            refr_ok,
            (1.0 - f_t_dielec)
            * d_t
            * g_t
            * jnp.abs(wi_wh)
            * jnp.abs(wo_wh)
            / jnp.maximum(cos_i * cos_o * sqrt_denom * sqrt_denom, _EPS),
            0.0,
        )[:, None]
    )

    f = (
        f_diffuse
        + f_sheen
        + f_specular * (1.0 - glass_w)[:, None]
        + f_clearcoat
        + f_glass_refl * glass_w[:, None]
    )

    # ---- Thin diffuse transmission ----------------------------------------
    trans_weight = params["spec_trans"] * (1.0 - metallic)
    f_thin = jnp.sqrt(jnp.maximum(base, 0.0)) / jnp.pi * (trans_weight * thin)[:, None]
    f_trans = f_thin + f_glass_trans * glass_w[:, None]

    return jnp.where(
        reflect_side[:, None], f, jnp.where(trans_side[:, None], f_trans, 0.0)
    )


# ---------------------------------------------------------------------------
# Sampling
# ---------------------------------------------------------------------------


def _onb(n: Array):
    """Orthonormal basis around n (Frisvad-style branchless)."""
    sign = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + sign * n[..., 0] * n[..., 0] * a, sign * b, -sign * n[..., 0]], axis=-1
    )
    bt = jnp.stack([b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return t, bt


def _frame(n: Array, tangent: Array | None):
    """Shading tangent frame: the provided (UV-derived) tangent
    orthonormalized against n, else a deterministic ONB.  Without authored
    tangents anisotropy has no meaningful orientation — callers should pass
    hit_attributes' tangent when UVs exist."""
    if tangent is None:
        return _onb(n)
    t = tangent - n * jnp.sum(tangent * n, axis=-1, keepdims=True)
    norm = jnp.linalg.norm(t, axis=-1, keepdims=True)
    t_onb, bt_onb = _onb(n)
    ok = norm[:, 0] > 1e-6
    t = jnp.where(ok[:, None], t / jnp.maximum(norm, 1e-12), t_onb)
    bt = jnp.cross(n, t)
    return t, bt


def _to_world(n: Array, t: Array, bt: Array, local: Array) -> Array:
    return (
        local[..., 0:1] * t + local[..., 1:2] * bt + local[..., 2:3] * n
    )


def _lobe_probs(params) -> tuple[Array, Array, Array]:
    """(p_diffuse, p_specular, p_transmission) lobe-selection probabilities."""
    w_t = jnp.clip(params["spec_trans"] * (1.0 - params["metallic"]), 0.0, 1.0)
    w_d = (1.0 - params["metallic"]) * (1.0 - w_t)
    p_d = jnp.clip(w_d / (w_d + 1.0), 0.05, 0.9)
    p_t = jnp.clip(0.9 * w_t, 0.0, 0.5)
    scale = 1.0 - p_t
    return p_d * scale, (1.0 - p_d) * scale, p_t


def sample(
    params: dict[str, Array], n: Array, wo: Array, key: Array,
    tangent: Array | None = None,
):
    """Importance-sample wi; returns (wi, pdf, f).

    One stochastic lobe choice per point: cosine-hemisphere for diffuse,
    GGX-NDF for specular, and for the transmission lobe either the thin
    cosine *lower* hemisphere (thin = 1) or rough-dielectric glass
    (GGX half-vector, then Fresnel-weighted reflect/refract with TIR);
    pdf is the full mixture pdf so the estimator is unbiased regardless of
    the branch taken.
    """
    n_pts = n.shape[0]
    k_sel, k_a, k_b, k_c, k_d = jax.random.split(key, 5)
    u_sel = jax.random.uniform(k_sel, (n_pts,))
    u1 = jax.random.uniform(k_a, (n_pts,))
    u2 = jax.random.uniform(k_b, (n_pts,))
    u3 = jax.random.uniform(k_c, (n_pts,))
    u4 = jax.random.uniform(k_d, (n_pts,))

    t, bt = _frame(n, tangent)

    # Cosine-hemisphere sample.
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    local_diff = jnp.stack(
        [r * jnp.cos(phi), r * jnp.sin(phi), jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))],
        axis=-1,
    )
    wi_diff = _to_world(n, t, bt, local_diff)

    # Anisotropic GGX half-vector sample (Heitz NDF parametrization;
    # reduces to isotropic GGX at anisotropic = 0).
    ax, ay = _aniso_alphas(params)
    stretch = jnp.sqrt(jnp.maximum(u1 / jnp.maximum(1.0 - u1, 1e-9), 0.0))
    local_h = jnp.stack(
        [
            stretch * ax * jnp.cos(phi),
            stretch * ay * jnp.sin(phi),
            jnp.ones_like(u1),
        ],
        axis=-1,
    )
    local_h = local_h / jnp.linalg.norm(local_h, axis=-1, keepdims=True)
    h = _to_world(n, t, bt, local_h)
    wi_spec = 2.0 * jnp.sum(wo * h, axis=-1, keepdims=True) * h - wo

    # Glass lobe: isotropic GGX half-vector, Fresnel-weighted branch.
    eta = _eta_rel(params)
    alpha_g = jnp.clip(params["roughness"], 0.01, 1.0) ** 2
    cos_hg = jnp.sqrt(
        jnp.clip((1.0 - u1) / (1.0 + (alpha_g * alpha_g - 1.0) * u1), 0.0, 1.0)
    )
    sin_hg = jnp.sqrt(jnp.maximum(1.0 - cos_hg * cos_hg, 0.0))
    local_hg = jnp.stack(
        [sin_hg * jnp.cos(phi), sin_hg * jnp.sin(phi), cos_hg], axis=-1
    )
    hg = _to_world(n, t, bt, local_hg)
    wo_hg = jnp.sum(wo * hg, axis=-1)
    # Work with the half-vector on wo's side (grazing samples can flip it).
    hh = hg * jnp.sign(wo_hg + _EPS)[:, None]
    c = jnp.abs(wo_hg)
    f_g = _fresnel_dielectric(c, eta)
    wi_grefl = 2.0 * c[:, None] * hh - wo
    # Snell refraction about hh; TIR handled by f_g == 1 (reflect branch).
    sin2_t = jnp.maximum(1.0 - c * c, 0.0) / jnp.maximum(eta * eta, _EPS)
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    wi_grefr = -wo / eta[:, None] + ((c / eta) - cos_t)[:, None] * hh
    wi_grefr = wi_grefr / (jnp.linalg.norm(wi_grefr, axis=-1, keepdims=True) + 1e-20)
    take_refl = (u3 < f_g) | (sin2_t >= 1.0)
    wi_glass = jnp.where(take_refl[:, None], wi_grefl, wi_grefr)
    # Thin vs glass within the transmission lobe.
    thin = jnp.clip(params["thin"], 0.0, 1.0)
    wi_trans = jnp.where((u4 < thin)[:, None], -wi_diff, wi_glass)

    p_d, p_s, p_t = _lobe_probs(params)
    take_trans = u_sel >= (p_d + p_s)
    take_diff = u_sel < p_d
    wi = jnp.where(take_diff[:, None], wi_diff, wi_spec)
    wi = jnp.where(take_trans[:, None], wi_trans, wi)

    pdf = pdf_fn(params, n, wo, wi, tangent=tangent)
    f = evaluate(params, n, wo, wi, tangent=tangent)
    return wi, pdf, f


def pdf_fn(
    params: dict[str, Array], n: Array, wo: Array, wi: Array,
    tangent: Array | None = None,
) -> Array:
    """Mixture pdf of `sample` for MIS; (N,)."""
    cos_i = jnp.sum(n * wi, axis=-1)
    h = wo + wi
    h = h / (jnp.linalg.norm(h, axis=-1, keepdims=True) + 1e-20)
    cos_h = jnp.maximum(jnp.sum(n * h, axis=-1), 0.0)
    cos_d = jnp.maximum(jnp.sum(wo * h, axis=-1), _EPS)

    ax, ay = _aniso_alphas(params)
    t, bt = _frame(n, tangent)
    hx = jnp.sum(h * t, axis=-1)
    hy = jnp.sum(h * bt, axis=-1)
    pdf_diff = jnp.maximum(cos_i, 0.0) / jnp.pi
    pdf_spec = _d_ggx_aniso(hx, hy, cos_h, ax, ay) * cos_h / (4.0 * cos_d)
    pdf_thin = jnp.maximum(-cos_i, 0.0) / jnp.pi

    # Glass-lobe pdfs (isotropic GGX over the NDF, then the Fresnel branch).
    eta = _eta_rel(params)
    thin = jnp.clip(params["thin"], 0.0, 1.0)
    alpha_g = jnp.clip(params["roughness"], 0.01, 1.0) ** 2
    # Reflection branch shares the reflection half-vector h.
    f_h = _fresnel_dielectric(cos_d, eta)
    pdf_grefl = _d_ggx(cos_h, alpha_g) * cos_h / (4.0 * cos_d) * f_h
    # Refraction branch: wh_t = normalize(wo + eta wi), Jacobian
    # dwh/dwi = eta^2 |wi.wh| / (wo.wh + eta wi.wh)^2.
    wh_t = wo + eta[:, None] * wi
    wh_t = wh_t / (jnp.linalg.norm(wh_t, axis=-1, keepdims=True) + 1e-20)
    wh_t = wh_t * jnp.sign(jnp.sum(wh_t * n, axis=-1, keepdims=True) + 1e-20)
    cos_wh = jnp.clip(jnp.sum(n * wh_t, axis=-1), 0.0, 1.0)
    wo_wh = jnp.sum(wo * wh_t, axis=-1)
    wi_wh = jnp.sum(wi * wh_t, axis=-1)
    sqrt_denom = wo_wh + eta * wi_wh
    jac = eta * eta * jnp.abs(wi_wh) / jnp.maximum(sqrt_denom * sqrt_denom, _EPS)
    f_wh = _fresnel_dielectric(jnp.abs(wo_wh), eta)
    # A refraction output must straddle its half-vector (wo.h > 0, wi.h < 0);
    # the algebraic reconstruction also "succeeds" for directions refraction
    # cannot produce, and counting that phantom density made the mixture pdf
    # integrate to ~1.4.
    refr_ok = (wo_wh > _EPS) & (wi_wh < -_EPS)
    pdf_grefr = jnp.where(
        refr_ok, _d_ggx(cos_wh, alpha_g) * cos_wh * jac * (1.0 - f_wh), 0.0
    )

    p_d, p_s, p_t = _lobe_probs(params)
    # Half-vector lobes (specular reflection, glass reflection/refraction)
    # can land on EITHER hemisphere — a high-roughness reflection about a
    # tilted h goes below the horizon, a refraction about a tilted h can
    # come back above it.  Their densities are valid wherever the sample
    # lands (the h <-> wi maps are bijective given wo), so they must NOT be
    # gated by hemisphere: gating made the sampled density exceed the
    # claimed pdf below the horizon (measured 2-12x at roughness 0.7),
    # inflating every importance-sampled transmission estimate.
    pdf_hv = (
        p_s * pdf_spec
        + p_t * (1.0 - thin) * (pdf_grefl + pdf_grefr)
    )
    pdf_up = p_d * pdf_diff + pdf_hv
    pdf_down = p_t * thin * pdf_thin + pdf_hv
    return jnp.where(cos_i > _EPS, pdf_up, jnp.where(cos_i < -_EPS, pdf_down, 0.0))

"""Light sampling and evaluation (point / spot / projector).

Replaces Mitsuba's emitter plugins for the set the reference uses: spot
emitters with `intensity.value` (main.py:119-123) and the projector —
a textured spotlight carrying the laser pattern ("tex.data", main.py:64-77).

All emitters here are *delta* lights (positional), so next-event estimation
needs no MIS against BSDF sampling; area lights ride emissive materials in
the path tracer.

Convention: a spot/projector emitter looks down its local -Z (same as the
camera), matching the projection subsystem's NDC round-trips.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from fireflies_tpu.render.texture import bilinear_sample, bilinear_sample_packed
from fireflies_tpu.render.types import LIGHT_POINT, LIGHT_SPOT, Lights, Projector
from fireflies_tpu.render.vec3 import Vec3, from_array, splat
from fireflies_tpu.render import vec3 as v3m
from fireflies_tpu.utils import math as ffmath

Array = jax.Array


@jax.checkpoint
def _beam_splat_field(ndc_x: Array, ndc_y: Array, beams_ndc: Array,
                      beam_sigma: Array, half_w: Array, half_h: Array):
    """Sum-of-Gaussians beam splat g(p) = sum_k exp(-((d_px^2)/sigma)^2).

    (K, R) layout on purpose: R (rays) is a multiple of 128 so it rides the
    lane dimension pad-free, while K (beams, e.g. 144) rides sublanes — the
    transposed (R, K) form pads K up to the next 128 lanes (measured 1.8x
    HBM expansion on the OOM dump).  jax.checkpoint because the spp
    lax.scan otherwise STACKS the (K, R) exp residuals per sample for the
    backward pass: f32[spp, batch, 262144, 144] = 9 GiB unpadded at spp=4
    batch=16 — instant OOM on a 16 GiB chip.  Recomputing the fused
    broadcast-reduce in the backward pass is cheap VPU work.
    """
    dx = (beams_ndc[:, 0][:, None] - ndc_x[None, :]) * half_w  # (K, R)
    dy = (beams_ndc[:, 1][:, None] - ndc_y[None, :]) * half_h
    d2 = dx * dx + dy * dy
    return jnp.sum(jnp.exp(-jnp.square(d2 / beam_sigma)), axis=0)  # (R,)


def eval_light_v(lights: Lights, index: int, p: Vec3):
    """Component-form eval_light: returns (wi: Vec3, dist (N,), rad: Vec3)."""
    to_world = lights.to_world[index]
    pos = splat(to_world[:3, 3])
    kind = lights.kinds[index]
    intensity = splat(lights.intensity[index])

    delta = pos - p
    dist = delta.norm()
    wi = delta * (1.0 / (dist + 1e-20))

    inv_r2 = 1.0 / jnp.maximum(dist * dist, 1e-12)
    radiance = intensity * inv_r2

    # Spot falloff: angle between the emitter's -Z axis and the direction
    # from the light to the point.
    fwd = splat(-to_world[:3, 2])
    cos_angle = (-wi).dot(fwd)
    falloff = spot_falloff(cos_angle, lights.cutoff_cos[index], lights.beam_cos[index])
    falloff = jnp.where(kind == LIGHT_SPOT, falloff, 1.0)
    scale = jnp.where(lights.active[index], falloff, 0.0)
    return wi, dist, radiance * scale


def eval_projector_v(projector: Projector, p: Vec3, tex_table: Array | None = None):
    """Component-form eval_projector (see eval_projector).

    `tex_table` (optional): pack_neighborhood_table(projector.texture) — the
    hot path passes it so the texture lookup costs ONE gather instead of 4
    (TPU gathers are per-row bound; see texture.py)."""
    to_world = projector.to_world
    pos = splat(to_world[:3, 3])
    delta = pos - p
    dist = delta.norm()
    wi = delta * (1.0 / (dist + 1e-20))

    # Transform points into projector NDC (rows of the inverse matrix).
    world_to_proj = jnp.linalg.inv(to_world)
    r = world_to_proj
    vx = r[0, 0] * p.x + r[0, 1] * p.y + r[0, 2] * p.z + r[0, 3]
    vy = r[1, 0] * p.x + r[1, 1] * p.y + r[1, 2] * p.z + r[1, 3]
    vz = r[2, 0] * p.x + r[2, 1] * p.y + r[2, 2] * p.z + r[2, 3]
    depth = -vz
    tan_half = jnp.tan(jnp.deg2rad(projector.fov) / 2.0)
    safe = jnp.where(depth < 1e-6, 1e-6, depth)
    ndc_x = vx / (safe * tan_half)
    ndc_y = vy / (safe * tan_half)

    if projector.beams_ndc is not None:
        # Analytic beam-splat pattern: evaluate the continuous Gaussian
        # field the texture route rasterizes (falloff exp(-((d_px^2)/s)^2),
        # graphics/rasterization.py), at this point's projector-NDC coords.
        # Distances are flip-invariant, so NDC deltas scaled by the pixel
        # metric reproduce the texture's pixel-space distances exactly.
        # One fused broadcast-reduce over K beams — no gather, no scatter
        # in the backward pass, and exact gradients w.r.t. the beam NDC.
        h_px, w_px = projector.beam_hw
        g = _beam_splat_field(
            ndc_x, ndc_y, projector.beams_ndc, projector.beam_sigma,
            jnp.float32(0.5 * w_px), jnp.float32(0.5 * h_px),
        )
        tex = Vec3(
            projector.beam_color[0] * g,
            projector.beam_color[1] * g,
            projector.beam_color[2] * g,
        )
    else:
        uv = jnp.stack([(ndc_x + 1.0) * 0.5, (ndc_y + 1.0) * 0.5], axis=-1)
        if tex_table is not None:
            h, w = projector.texture.shape[0], projector.texture.shape[1]
            tex = from_array(bilinear_sample_packed(tex_table, h, w, uv))
        else:
            tex = from_array(bilinear_sample(projector.texture, uv))

    in_frustum = (
        (depth > projector.near)
        & (depth < projector.far)
        & (jnp.abs(ndc_x) <= 1.0)
        & (jnp.abs(ndc_y) <= 1.0)
    )
    inv_r2 = 1.0 / jnp.maximum(dist * dist, 1e-12)
    radiance = tex * jnp.where(in_frustum, projector.scale * inv_r2, 0.0)
    return wi, dist, radiance


def total_incident_v(
    lights: Lights,
    projector: Optional[Projector],
    p: Vec3,
    proj_tex_table: Array | None = None,
):
    """Component-form total_incident: lists of (Vec3, (N,), Vec3)."""
    acc_wi, acc_dist, acc_rad = [], [], []
    for i in range(lights.count):
        wi, dist, rad = eval_light_v(lights, i, p)
        acc_wi.append(wi)
        acc_dist.append(dist)
        acc_rad.append(rad)
    if projector is not None:
        wi, dist, rad = eval_projector_v(projector, p, tex_table=proj_tex_table)
        acc_wi.append(wi)
        acc_dist.append(dist)
        acc_rad.append(rad)
    return acc_wi, acc_dist, acc_rad


def envmap_distribution(env_tex: Array, eps: float = 0.01) -> dict:
    """Importance-sampling distribution over an equirectangular envmap.

    Replaces Mitsuba's envmap emitter sampling (the reference's scenes can
    carry `envmap`; Mitsuba importance-samples every emitter in NEE).  Cell
    (i, j) covers theta in pi*[i, i+1]/H (theta measured from +Y, matching
    texture.sample_envmap's v = 1 - theta/pi) and phi in 2*pi*[j/W - 0.5,
    (j+1)/W - 0.5]; its weight is (3x3-neighborhood-max luminance
    + eps * mean) * sin(theta_c).  The neighborhood max matters twice: it
    keeps pdf > 0 wherever the BILINEAR radiance field is nonzero
    (unbiasedness — a zero texel next to a bright one still receives
    blended radiance), and it BOUNDS blended-radiance / cell-weight —
    without it a dark texel bordering a bright one yields rare
    blended-radiance / dark-pdf spikes (measured: 8% relative std at
    spp 128 on a one-texel spot; the max collapses it).

    Returns {"cdf": (H*W,) inclusive flat CDF, "pmf": (H, W) cell masses,
    "h": H, "w": W} — all jittable (one cumsum; built once per render).
    """
    h, w = env_tex.shape[0], env_tex.shape[1]
    lum = (
        0.2126 * env_tex[:, :, 0]
        + 0.7152 * env_tex[:, :, 1]
        + 0.0722 * env_tex[:, :, 2]
    )
    lum = jnp.maximum(lum, 0.0)
    # 3x3 neighborhood max: wrap in phi (the map is periodic), clamp in
    # theta (pole rows have no neighbor beyond the pole).
    lum = jnp.maximum(
        lum, jnp.maximum(jnp.roll(lum, 1, axis=1), jnp.roll(lum, -1, axis=1))
    )
    shift_up = jnp.concatenate([lum[:1], lum[:-1]], axis=0)
    shift_dn = jnp.concatenate([lum[1:], lum[-1:]], axis=0)
    lum = jnp.maximum(lum, jnp.maximum(shift_up, shift_dn))
    lum = lum + eps * jnp.maximum(jnp.mean(lum), 1e-12)
    theta_c = jnp.pi * (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    weights = lum * jnp.sin(theta_c)[:, None]  # (H, W)
    flat = weights.reshape(-1)
    total = jnp.maximum(jnp.sum(flat), 1e-20)
    pmf = weights / total
    cdf = jnp.cumsum(flat) / total
    return {"cdf": cdf, "pmf": pmf, "h": h, "w": w}


def _envmap_cell_dir(i: Array, j: Array, ju: Array, jv: Array, h: int, w: int):
    """Direction (component form) for jitter (ju, jv) inside cell (i, j),
    in the ENVMAP frame (matches texture.sample_envmap: theta from +Y,
    phi = atan2(x, -z))."""
    theta = jnp.pi * (i.astype(jnp.float32) + jv) / h
    phi = 2.0 * jnp.pi * ((j.astype(jnp.float32) + ju) / w - 0.5)
    st = jnp.sin(theta)
    return st * jnp.sin(phi), jnp.cos(theta), -st * jnp.cos(phi)


def sample_envmap_nee(dist: dict, n_pts: int, key: Array):
    """Draw one envmap direction per shading point from `dist`.

    Returns (wi: Vec3 in the ENVMAP frame, pdf_solid (N,)).  The caller
    rotates wi into world space (background_to_world) and evaluates
    radiance with texture.sample_envmap so value and gradient paths match
    the escape-radiance lookup exactly.

    pdf_solid(dir) = pmf[i, j] * H * W / (2 pi^2 sin(theta)) — the exact
    density of cell-categorical + in-cell-uniform sampling in (u, v),
    pushed through the lat-long Jacobian.
    """
    h, w = dist["h"], dist["w"]
    k_cell, k_jit = jax.random.split(key)
    u = jax.random.uniform(k_cell, (n_pts,))
    idx = jnp.clip(
        jnp.searchsorted(dist["cdf"], u, side="left"), 0, h * w - 1
    ).astype(jnp.int32)
    i = idx // w
    j = idx % w
    jit = jax.random.uniform(k_jit, (2, n_pts))
    dx, dy, dz = _envmap_cell_dir(i, j, jit[0], jit[1], h, w)
    theta = jnp.pi * (i.astype(jnp.float32) + jit[1]) / h
    pmf_ij = dist["pmf"].reshape(-1)[idx]
    pdf = pmf_ij * (h * w) / (2.0 * jnp.pi * jnp.pi * jnp.maximum(jnp.sin(theta), 1e-6))
    return Vec3(dx, dy, dz), pdf


def envmap_pdf_of_dir(dist: dict, dx: Array, dy: Array, dz: Array) -> Array:
    """pdf_solid the NEE sampler would assign to an (ENVMAP-frame) direction
    — the MIS counterpart of sample_envmap_nee for BSDF-sampled escapes."""
    h, w = dist["h"], dist["w"]
    inv_len = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz + 1e-20)
    x, y, z = dx * inv_len, dy * inv_len, dz * inv_len
    theta = jnp.arccos(jnp.clip(y, -1.0, 1.0))
    phi_u = jnp.arctan2(x, -z) * (0.5 / jnp.pi) + 0.5  # in [0, 1]
    i = jnp.clip((theta * (h / jnp.pi)).astype(jnp.int32), 0, h - 1)
    j = jnp.clip((phi_u * w).astype(jnp.int32), 0, w - 1)
    pmf_ij = dist["pmf"][i, j]
    return pmf_ij * (h * w) / (
        2.0 * jnp.pi * jnp.pi * jnp.maximum(jnp.sin(theta), 1e-6)
    )


def spot_falloff(cos_angle: Array, cutoff_cos: Array, beam_cos: Array) -> Array:
    """Mitsuba-style smooth spot falloff: 1 inside the beam, linear in cosine
    down to the cutoff, 0 outside."""
    denom = jnp.maximum(beam_cos - cutoff_cos, 1e-6)
    return jnp.clip((cos_angle - cutoff_cos) / denom, 0.0, 1.0)


def eval_light(lights: Lights, index: int, p: Array):
    """Radiance arriving at points p (N, 3) from light slot `index`.

    Returns (wi, dist, radiance): unit direction to the light, distance, and
    incident radiance (N, 3) including falloff and 1/r^2 (zero if inactive).
    """
    to_world = lights.to_world[index]
    pos = to_world[:3, 3]
    kind = lights.kinds[index]
    intensity = lights.intensity[index]

    delta = pos[None, :] - p
    dist = jnp.linalg.norm(delta, axis=-1)
    wi = delta / (dist[:, None] + 1e-20)

    inv_r2 = 1.0 / jnp.maximum(dist * dist, 1e-12)
    radiance = intensity[None, :] * inv_r2[:, None]

    # Spot falloff: angle between the emitter's -Z axis and the direction
    # from the light to the point.
    fwd = -to_world[:3, 2]
    cos_angle = jnp.sum((-wi) * fwd[None, :], axis=-1)
    falloff = spot_falloff(cos_angle, lights.cutoff_cos[index], lights.beam_cos[index])
    radiance = jnp.where(
        (kind == LIGHT_SPOT), radiance * falloff[:, None], radiance
    )

    active = lights.active[index]
    radiance = jnp.where(active, radiance, 0.0)
    return wi, dist, radiance


def eval_projector(projector: Projector, p: Array):
    """Incident radiance from the projector at points p (N, 3).

    The pattern texture is sampled at the projector-NDC footprint of each
    point — differentiable w.r.t. the texture (this is the gradient path for
    laser-pattern optimization through full renders).
    """
    to_world = projector.to_world
    pos = to_world[:3, 3]
    delta = pos[None, :] - p
    dist = jnp.linalg.norm(delta, axis=-1)
    wi = delta / (dist[:, None] + 1e-20)

    # Transform points into projector NDC.
    world_to_proj = jnp.linalg.inv(to_world)
    view = ffmath.transform_points(p, world_to_proj)
    depth = -view[:, 2]
    tan_half = jnp.tan(jnp.deg2rad(projector.fov) / 2.0)
    safe = jnp.where(depth < 1e-6, 1e-6, depth)
    ndc_x = view[:, 0] / (safe * tan_half)
    ndc_y = view[:, 1] / (safe * tan_half)

    uv = jnp.stack([(ndc_x + 1.0) * 0.5, (ndc_y + 1.0) * 0.5], axis=-1)
    import os as _os  # noqa: PLC0415

    if projector.beams_ndc is not None:
        # Analytic beam-splat pattern (see eval_projector_v).
        h_px, w_px = projector.beam_hw
        g = _beam_splat_field(
            ndc_x, ndc_y, projector.beams_ndc, projector.beam_sigma,
            jnp.float32(0.5 * w_px), jnp.float32(0.5 * h_px),
        )
        tex = g[:, None] * projector.beam_color[None, :]
    elif _os.environ.get("FF_PROJ_CONST"):  # perf-bisection knob
        tex = jnp.broadcast_to(
            jnp.mean(projector.texture, axis=(0, 1)), (p.shape[0], 3)
        ) + 1e-20 * uv[:, :1]
    else:
        tex = bilinear_sample(projector.texture, uv)

    in_frustum = (
        (depth > projector.near)
        & (depth < projector.far)
        & (jnp.abs(ndc_x) <= 1.0)
        & (jnp.abs(ndc_y) <= 1.0)
    )
    inv_r2 = 1.0 / jnp.maximum(dist * dist, 1e-12)
    radiance = tex * (projector.scale * inv_r2)[:, None]
    radiance = jnp.where(in_frustum[:, None], radiance, 0.0)
    return wi, dist, radiance


def sample_one_light(
    lights: Lights,
    projector: Optional[Projector],
    p: Array,
    key: Array,
):
    """Uniformly pick one emitter per shading point (NEE).

    Returns (wi, dist, radiance_over_pdf).  With L light slots (+1 if a
    projector exists) the pdf is 1/total, applied here.
    """
    n_lights = lights.count
    total = n_lights + (1 if projector is not None else 0)
    if total == 0:
        zeros = jnp.zeros_like(p)
        return zeros, jnp.zeros(p.shape[0]), zeros

    choice = jax.random.randint(key, (p.shape[0],), 0, total)

    wi_all, dist_all, rad_all = [], [], []
    for i in range(n_lights):
        wi, dist, rad = eval_light(lights, i, p)
        wi_all.append(wi)
        dist_all.append(dist)
        rad_all.append(rad)
    if projector is not None:
        wi, dist, rad = eval_projector(projector, p)
        wi_all.append(wi)
        dist_all.append(dist)
        rad_all.append(rad)

    wi_s = jnp.stack(wi_all)  # (total, N, 3)
    dist_s = jnp.stack(dist_all)
    rad_s = jnp.stack(rad_all)

    rows = jnp.arange(p.shape[0])
    wi = wi_s[choice, rows]
    dist = dist_s[choice, rows]
    rad = rad_s[choice, rows] * float(total)  # / pdf
    return wi, dist, rad


def emitter_positions(lights: Lights, projector: Optional[Projector]) -> list[Array]:
    """World positions of every delta emitter, in total_incident order."""
    positions = [lights.to_world[i, :3, 3] for i in range(lights.count)]
    if projector is not None:
        positions.append(projector.to_world[:3, 3])
    return positions


def emitter_apertures(
    lights: Lights, projector: Optional[Projector]
) -> list[tuple[Array, Array, Array] | None]:
    """Soft-shadow aperture spec per delta emitter, in total_incident order.

    Each entry is None (hard shadow, shared-origin occlusion eligible) or
    (radius (), x_axis (3,), y_axis (3,)) — the emitter's local XY disk in
    world space, over which NEE visibility is averaged (one disk sample per
    spp).  Statically gated: a Lights table / Projector without the
    radius/aperture field costs nothing.
    """
    out: list = []
    for i in range(lights.count):
        if lights.radius is None:
            out.append(None)
        else:
            out.append(
                (lights.radius[i], lights.to_world[i, :3, 0], lights.to_world[i, :3, 1])
            )
    if projector is not None:
        if projector.aperture is None:
            out.append(None)
        else:
            out.append(
                (projector.aperture, projector.to_world[:3, 0], projector.to_world[:3, 1])
            )
    return out


def sample_area_light(
    geometry,
    materials,
    p: Array,
    key: Array,
):
    """Sample one point on the scene's emissive faces for NEE.

    Area-weighted face selection, uniform barycentric point.  Returns
    (x (N,3) sampled points, n_l (N,3) light normals, Le (N,3) emission,
    pdf_area (N,) area-measure pdf).  Requires geometry.emissive_faces.
    """
    import jax

    efaces = geometry.faces[geometry.emissive_faces]  # (E, 3)
    v0 = geometry.vertices[efaces[:, 0]]
    v1 = geometry.vertices[efaces[:, 1]]
    v2 = geometry.vertices[efaces[:, 2]]
    cross = jnp.cross(v1 - v0, v2 - v0)
    areas = 0.5 * jnp.linalg.norm(cross, axis=-1)  # (E,)
    total_area = jnp.maximum(jnp.sum(areas), 1e-12)

    n_pts = p.shape[0]
    k_face, k_uv = jax.random.split(key)
    # Area-weighted categorical pick per shading point.
    cdf = jnp.cumsum(areas) / total_area
    u = jax.random.uniform(k_face, (n_pts,))
    idx = jnp.searchsorted(cdf, u)
    idx = jnp.clip(idx, 0, areas.shape[0] - 1)

    uv = jax.random.uniform(k_uv, (n_pts, 2))
    su = jnp.sqrt(uv[:, 0])
    b0 = 1.0 - su
    b1 = uv[:, 1] * su
    b2 = 1.0 - b0 - b1
    x = (
        b0[:, None] * v0[idx]
        + b1[:, None] * v1[idx]
        + b2[:, None] * v2[idx]
    )
    n_l = cross[idx]
    n_l = n_l / (jnp.linalg.norm(n_l, axis=-1, keepdims=True) + 1e-20)
    mat_id = geometry.face_mat[geometry.emissive_faces][idx]
    emission = materials.emission[mat_id]
    pdf_area = jnp.full((n_pts,), 1.0, jnp.float32) / total_area
    return x, n_l, emission, pdf_area


def area_pdf_of_hit(geometry, prim: Array) -> Array:
    """Area-measure pdf the NEE sampler would assign to a hit on `prim`
    (0 for non-emissive faces) — the MIS counterpart of sample_area_light."""
    if geometry.emissive_faces is None:
        return jnp.zeros(prim.shape, jnp.float32)
    efaces = geometry.faces[geometry.emissive_faces]
    v0 = geometry.vertices[efaces[:, 0]]
    v1 = geometry.vertices[efaces[:, 1]]
    v2 = geometry.vertices[efaces[:, 2]]
    areas = 0.5 * jnp.linalg.norm(jnp.cross(v1 - v0, v2 - v0), axis=-1)
    total_area = jnp.maximum(jnp.sum(areas), 1e-12)
    is_emissive = jnp.zeros((geometry.faces.shape[0],), bool).at[
        geometry.emissive_faces
    ].set(True)
    return jnp.where(is_emissive[jnp.maximum(prim, 0)], 1.0 / total_area, 0.0)


def total_incident(lights: Lights, projector: Optional[Projector], p: Array):
    """Sum of incident radiance from every delta emitter (deterministic NEE —
    exact for few lights, used when config.deterministic_nee)."""
    acc_wi, acc_dist, acc_rad = [], [], []
    for i in range(lights.count):
        wi, dist, rad = eval_light(lights, i, p)
        acc_wi.append(wi)
        acc_dist.append(dist)
        acc_rad.append(rad)
    if projector is not None:
        wi, dist, rad = eval_projector(projector, p)
        acc_wi.append(wi)
        acc_dist.append(dist)
        acc_rad.append(rad)
    return acc_wi, acc_dist, acc_rad

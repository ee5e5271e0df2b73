"""Differentiable path tracer.

The TPU-native replacement for `mi.render` (reference main.py:156,
examples/01_hello_world.py:29): a wavefront integrator with

  * static shapes throughout: spp via `lax.scan`, bounces as a static Python
    loop (max_bounces is small), masked inactive rays instead of compaction;
  * deterministic next-event estimation over every delta emitter (point /
    spot / projector) — exact for the few-light scenes this framework
    targets, drastically lower variance than one-light sampling;
  * area-light NEE over emissive faces with power-heuristic MIS against
    BSDF sampling; BSDF importance sampling for indirect bounces (diffuse /
    GGX specular / thin transmission lobes);
  * detached traversal + differentiable shading: gradients flow to material
    params, light intensity, the projector texture (pattern optimization!),
    vertices and poses through `hit_attributes`.

Everything is pure: `render_rgb(scene, key, config)` jits, vmaps across
scene variants, and reverse-differentiates.
"""

from __future__ import annotations

import os as _os

import jax
import jax.numpy as jnp

from fireflies_tpu.render import bsdf as bsdf_mod
from fireflies_tpu.render import lights as lights_mod
from fireflies_tpu.render.intersect import hit_attributes, closest_hit, occluded_any
from fireflies_tpu.render.rays import camera_rays, camera_rays_tiled
from fireflies_tpu.render.texture import bilinear_sample_stack
from fireflies_tpu.render.types import RenderConfig, RenderScene

Array = jax.Array

_SHADOW_EPS = 1e-3


def _shading_base_color(scene: RenderScene, params: dict, attrs: dict) -> dict:
    """Override base_color / roughness with texture lookups where materials
    carry maps (Mitsuba: textured `base_color` / `roughness` on the
    principled BSDF, reference main.py:127-136)."""
    mats = scene.materials
    if "uv" not in attrs:
        return params
    out = params
    if mats.textures is not None:
        tex_color = bilinear_sample_stack(mats.textures, attrs["mat_id"], attrs["uv"])
        has_tex = mats.has_texture[attrs["mat_id"]]
        out = dict(out)
        out["base_color"] = jnp.where(
            has_tex[:, None], tex_color, out["base_color"]
        )
    if mats.roughness_tex is not None:
        tex_rough = bilinear_sample_stack(
            mats.roughness_tex, attrs["mat_id"], attrs["uv"]
        )[:, 0]
        has_r = mats.has_roughness_tex[attrs["mat_id"]]
        out = dict(out)
        out["roughness"] = jnp.where(has_r, tex_rough, out["roughness"])
    return out


def _shading_normal(scene: RenderScene, attrs: dict, n: Array) -> Array:
    """Tangent-space normal mapping (Mitsuba `normalmap` BSDF wrapper):
    ns = normalize(T x + B y + N z) with (x, y, z) = 2 rgb - 1, using the
    UV-derived tangent from hit_attributes.  Falls back to the geometric
    normal where the material has no map or the tangent is degenerate."""
    mats = scene.materials
    if mats.normal_tex is None or "uv" not in attrs or "tangent" not in attrs:
        return n
    rgb = bilinear_sample_stack(mats.normal_tex, attrs["mat_id"], attrs["uv"])
    tloc = 2.0 * rgb - 1.0
    t_raw = attrs["tangent"]
    # Gram-Schmidt against the (flipped) shading-side geometric normal.
    t = t_raw - jnp.sum(t_raw * n, axis=-1, keepdims=True) * n
    t_len = jnp.linalg.norm(t, axis=-1, keepdims=True)
    ok = t_len[:, 0] > 1e-8
    t = t / jnp.maximum(t_len, 1e-20)
    b = jnp.cross(n, t)
    ns = tloc[:, 0:1] * t + tloc[:, 1:2] * b + tloc[:, 2:3] * n
    ns = ns / (jnp.linalg.norm(ns, axis=-1, keepdims=True) + 1e-20)
    # Keep the mapped normal in the geometric hemisphere (grazing maps can
    # flip it, which would punch light through the surface).
    ns = jnp.where(jnp.sum(ns * n, axis=-1, keepdims=True) > 1e-4, ns, n)
    has_n = mats.has_normal_tex[attrs["mat_id"]]
    return jnp.where((has_n & ok)[:, None], ns, n)


def trace_rays(
    scene: RenderScene,
    o: Array,
    d: Array,
    key: Array,
    config: RenderConfig,
    primary_origin: Array | None = None,
) -> Array:
    """Path-trace radiance for rays (N, 3); returns (N, 3).

    `primary_origin` (3,) marks the first bounce's rays as sharing that
    origin (camera position) — enables the fast shared-origin kernel.
    """
    n_rays = o.shape[0]
    radiance = jnp.zeros((n_rays, 3), jnp.float32)
    throughput = jnp.ones((n_rays, 3), jnp.float32)
    active = jnp.ones((n_rays,), bool)
    background = (
        scene.background
        if scene.background is not None
        else jnp.zeros(3, jnp.float32)
    )

    has_area_lights = scene.geometry.emissive_faces is not None
    prev_pdf = jnp.zeros((n_rays,), jnp.float32)  # bsdf pdf of the ray that got here

    for bounce in range(config.max_bounces):
        bkey = jax.random.fold_in(key, bounce)
        if bounce == 0:
            hit = closest_hit(
                o,
                d,
                scene.geometry,
                tri_chunk=config.tri_chunk,
                backend=config.backend,
                shared_origin=primary_origin,
            )
        elif _os.environ.get("FF_SORT_INDIRECT", "1") != "0":
            # Indirect rays have spatially coherent origins (tile-major
            # bounce-0 hits) but BSDF-sampled directions, which defeats the
            # intersection kernel's per-tile cluster prune (a tile whose
            # directions span the sphere activates almost every cluster).
            # Sorting rays by (tile, direction octant) restores coherence;
            # ids are detached so the permutation is gradient-free.
            tile_id = jnp.arange(n_rays, dtype=jnp.int32) // 2048
            dd = jax.lax.stop_gradient(d)
            octant = (
                (dd[:, 0] > 0).astype(jnp.int32) * 4
                + (dd[:, 1] > 0).astype(jnp.int32) * 2
                + (dd[:, 2] > 0).astype(jnp.int32)
            )
            perm = jnp.argsort(tile_id * 8 + octant, stable=True)
            inv = jnp.zeros_like(perm).at[perm].set(
                jnp.arange(n_rays, dtype=perm.dtype)
            )
            hit_s = closest_hit(
                o[perm],
                d[perm],
                scene.geometry,
                tri_chunk=config.tri_chunk,
                backend=config.backend,
            )
            hit = jax.tree.map(lambda x: x[inv], hit_s)
        else:
            hit = closest_hit(
                o, d, scene.geometry,
                tri_chunk=config.tri_chunk, backend=config.backend,
            )
        hit = jax.tree.map(jax.lax.stop_gradient, hit)

        # Background contribution for escaping rays, then retire them.
        escaped = active & ~hit.valid
        radiance = radiance + jnp.where(
            escaped[:, None], throughput * background[None, :], 0.0
        )
        active = active & hit.valid

        attrs = hit_attributes(o, d, hit, scene.geometry)
        p = attrs["position"]
        n_geo = attrs["normal"]
        # Face the normal against the incoming ray.
        flip = jnp.sign(-jnp.sum(n_geo * d, axis=-1))
        flip = jnp.where(flip == 0, 1.0, flip)
        n = n_geo * flip[:, None]
        wo = -d

        params = bsdf_mod.gather_params(scene.materials, attrs["mat_id"])
        # Medium sidedness for the rough-dielectric glass lobe: entering on
        # front-face hits (relative IOR = ior), exiting on back-face hits
        # (1 / ior).  The BSDF works in the flipped-normal frame and cannot
        # tell the two apart on its own.
        params["eta_rel"] = jnp.where(
            flip > 0, params["ior"], 1.0 / jnp.maximum(params["ior"], 1e-3)
        )
        params = _shading_base_color(scene, params, attrs)
        tangent = attrs.get("tangent")
        # Shading normal (normal-mapped where materials carry a map) drives
        # BSDF evaluation/sampling and cosine factors; the geometric `n`
        # keeps handling ray offsets and sidedness.
        ns = _shading_normal(scene, attrs, n)

        # Emissive surfaces contribute on any hit; for BSDF-sampled bounces
        # MIS-weight against the area-light NEE strategy (power heuristic) so
        # emitters aren't double counted.
        if has_area_lights and bounce > 0:
            pdf_area_hit = lights_mod.area_pdf_of_hit(scene.geometry, hit.prim)
            cos_l_hit = jnp.abs(jnp.sum(n_geo * d, axis=-1))
            pdf_solid_hit = pdf_area_hit * (hit.t * hit.t) / jnp.maximum(cos_l_hit, 1e-6)
            w_emit = (prev_pdf * prev_pdf) / jnp.maximum(
                prev_pdf * prev_pdf + pdf_solid_hit * pdf_solid_hit, 1e-12
            )
            w_emit = jnp.where(pdf_solid_hit > 0, w_emit, 1.0)
        else:
            w_emit = jnp.ones((n_rays,), jnp.float32)
        radiance = radiance + jnp.where(
            active[:, None], throughput * params["emission"] * w_emit[:, None], 0.0
        )

        # ---- Next-event estimation over every delta emitter --------------
        wi_list, dist_list, rad_list = lights_mod.total_incident(
            scene.lights, scene.projector, p
        )
        shadow_o = p + n * _SHADOW_EPS
        positions = lights_mod.emitter_positions(scene.lights, scene.projector)
        for li, (wi_l, dist_l, rad_l) in enumerate(zip(wi_list, dist_list, rad_list)):
            lit = jnp.any(rad_l > 0.0, axis=-1) & active
            # Shadow origin offset to the side the light is on: thin
            # transmission (spec_trans) lets below-horizon emitters
            # contribute through the surface.
            cos_i_s = jnp.sum(n * wi_l, axis=-1)
            side_l = jnp.where(cos_i_s >= 0, 1.0, -1.0)
            shadow_o_l = p + n * (side_l * _SHADOW_EPS)[:, None]
            # Shadow segments reversed (light -> surface) so every ray in the
            # batch shares the light's origin — fast-kernel eligible.  The
            # direction is the unnormalized segment; t in (eps, 1 - eps)
            # excludes the endpoints (surface point already offset along n).
            seg_d = jax.lax.stop_gradient(shadow_o_l - positions[li][None, :])
            if _os.environ.get("FF_SKIP_OCCL"):  # perf-bisection knob
                blocked = jnp.zeros(seg_d.shape[0], bool)
            else:
                blocked = occluded_any(
                    shadow_o_l,
                    seg_d,
                    scene.geometry,
                    t_min=1e-4,
                    t_max=1.0 - 1e-4,
                    tri_chunk=config.tri_chunk,
                    backend=config.backend,
                    shared_origin=positions[li],
                )
            f = bsdf_mod.evaluate(params, ns, wo, wi_l, tangent=tangent)
            cos_i = jnp.abs(jnp.sum(ns * wi_l, axis=-1))  # |cos|: f() gates the side
            contrib = throughput * f * rad_l * cos_i[:, None]
            use = lit & ~blocked
            radiance = radiance + jnp.where(use[:, None], contrib, 0.0)

        # ---- Area-light NEE (emissive faces) ------------------------------
        if has_area_lights:
            x_l, n_l, le, pdf_area = lights_mod.sample_area_light(
                scene.geometry, scene.materials, p, jax.random.fold_in(bkey, 3)
            )
            dir_a = x_l - p
            side_a = jnp.where(jnp.sum(n * dir_a, axis=-1) >= 0, 1.0, -1.0)
            shadow_o_a = p + n * (side_a * _SHADOW_EPS)[:, None]
            seg = jax.lax.stop_gradient(x_l - shadow_o_a)
            d2 = jnp.maximum(jnp.sum(seg * seg, axis=-1), 1e-12)
            dist = jnp.sqrt(d2)
            wi_a = seg / dist[:, None]
            cos_s = jnp.abs(jnp.sum(ns * wi_a, axis=-1))  # f() gates the side
            cos_l = jnp.abs(jnp.sum(n_l * wi_a, axis=-1))
            # Segment stops just short of the emitter face itself.
            blocked_a = occluded_any(
                shadow_o_a,
                seg,
                scene.geometry,
                t_min=1e-4,
                t_max=1.0 - 1e-3,
                tri_chunk=config.tri_chunk,
                backend=config.backend,
            )
            f_a = bsdf_mod.evaluate(params, ns, wo, wi_a, tangent=tangent)
            pdf_solid = pdf_area * d2 / jnp.maximum(cos_l, 1e-6)
            p_b = bsdf_mod.pdf_fn(params, ns, wo, wi_a, tangent=tangent)
            w_nee = (pdf_solid * pdf_solid) / jnp.maximum(
                pdf_solid * pdf_solid + p_b * p_b, 1e-12
            )
            contrib_a = (
                throughput
                * f_a
                * le
                * (cos_s / jnp.maximum(pdf_solid, 1e-12) * w_nee)[:, None]
            )
            use_a = (
                active
                & ~blocked_a
                & (cos_s > 0)
                & (jnp.max(le, axis=-1) > 0)
            )
            radiance = radiance + jnp.where(use_a[:, None], contrib_a, 0.0)

        # ---- Indirect bounce --------------------------------------------
        if bounce + 1 < config.max_bounces:
            wi, pdf, f = bsdf_mod.sample(
                params, ns, wo, jax.random.fold_in(bkey, 1), tangent=tangent
            )
            cos_i_s = jnp.sum(n * wi, axis=-1)  # geometric side (offsets)
            cos_i = jnp.abs(jnp.sum(ns * wi, axis=-1))  # shading cosine
            safe_pdf = jnp.maximum(pdf, 1e-6)
            weight = jnp.where(pdf > 1e-6, cos_i / safe_pdf, 0.0)
            throughput = throughput * f * weight[:, None]
            active = active & (jnp.max(throughput, axis=-1) > 1e-5) & (pdf > 1e-6)
            # Offset the new origin to the side the ray leaves through.
            side = jnp.where(cos_i_s >= 0, 1.0, -1.0)
            o = p + n * (side * _SHADOW_EPS)[:, None]
            d = wi
            prev_pdf = pdf

    return radiance


def _film_render(scene: RenderScene, key: Array, config: RenderConfig) -> Array:
    """One sample-per-pixel pass; (H*W, 3) in row-major pixel order."""
    k_pix, k_path = jax.random.split(key)
    if config.reparam:
        return _film_render_reparam(scene, k_pix, k_path, config)
    # Tile-major ray order: spatially local 2048-ray tiles so the Pallas
    # kernels' per-tile cluster pruning is effective (see camera_rays_tiled).
    o, d, inv_perm = camera_rays_tiled(
        scene.camera, config.width, config.height, key=k_pix
    )
    if config.ray_chunk and config.ray_chunk < o.shape[0]:
        n = o.shape[0]
        chunk = config.ray_chunk
        n_chunks = -(-n // chunk)
        pad = n_chunks * chunk - n
        if pad:
            o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
            d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        o = o.reshape(n_chunks, chunk, 3)
        d = d.reshape(n_chunks, chunk, 3)
        cam_pos = scene.camera.to_world[:3, 3]
        out = jax.lax.map(
            lambda od: trace_rays(
                scene, od[0], od[1], k_path, config, primary_origin=cam_pos
            ),
            (o, d),
        )
        return out.reshape(-1, 3)[inv_perm]
    radiance = trace_rays(
        scene, o, d, k_path, config, primary_origin=scene.camera.to_world[:3, 3]
    )
    return radiance[inv_perm]


def _film_render_reparam(
    scene: RenderScene, k_pix: Array, k_path: Array, config: RenderConfig
) -> Array:
    """Reparameterized one-sample pass: primary NDC samples are warped so
    their gradients carry silhouette motion, and radiance is scaled by the
    warp's area factor (primal 1).  EXPERIMENTAL — primary visibility only;
    shadow/indirect discontinuities keep detached-traversal gradients.  See
    render/reparam.py."""
    from fireflies_tpu.render.rays import (  # noqa: PLC0415
        _tile_permutation,
        pixel_to_ndc,
        rays_from_ndc,
    )
    from fireflies_tpu.render.reparam import reparam_ndc  # noqa: PLC0415

    k_jit, k_warp = jax.random.split(k_pix)
    w, h = config.width, config.height
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    px, py = jnp.meshgrid(xs, ys)
    jit_xy = jax.random.uniform(k_jit, (h * w, 2))
    u = pixel_to_ndc(
        px.reshape(-1) + jit_xy[:, 0], py.reshape(-1) + jit_xy[:, 1], w, h
    )
    positions = lights_mod.emitter_positions(scene.lights, scene.projector)
    light_positions = jnp.stack(positions) if positions else None
    u_rep, area = reparam_ndc(
        scene.camera, u, scene.geometry, k_warp,
        k_aux=config.reparam_k_aux, radius=config.reparam_radius,
        tri_chunk=config.tri_chunk, backend=config.backend,
        light_positions=light_positions,
    )
    o, d = rays_from_ndc(scene.camera, u_rep)

    perm, inv = _tile_permutation(w, h, 128, 16)
    perm = jnp.asarray(perm)
    radiance = trace_rays(
        scene, o[perm], d[perm], k_path, config,
        primary_origin=scene.camera.to_world[:3, 3],
    )
    radiance = radiance * area[perm][:, None]
    return radiance[jnp.asarray(inv)]


def render_rgb(scene: RenderScene, key: Array, config: RenderConfig) -> Array:
    """Monte-Carlo RGB render, (H, W, 3).  spp accumulated via lax.scan so
    compile time is independent of sample count.

    With config.reparam, the returned image's VALUE comes from an ordinary
    detached pass and its GRADIENT from an independently-seeded
    warped-area pass (render/reparam.py).  The decorrelation matters: a
    nonlinear loss g(img) differentiates as g'(img) * d(img), and when the
    same sample supplies both factors the product is biased — e.g. with an
    L2 loss every boundary sample lands on the covered side where
    (img - target) is exactly 0, silently killing all silhouette gradients
    (measured: an emissive-quad depth recovery stalls with grad == 0.0).
    Independent seeds restore E[g'(img)] * E[d(img)]."""
    if config.reparam:
        k_primal, k_grad = jax.random.split(key)
        primal = jax.lax.stop_gradient(
            render_rgb(scene, k_primal, config.replace(reparam=False))
        )
        grad_img = _render_rgb_samples(scene, k_grad, config)
        return primal + grad_img - jax.lax.stop_gradient(grad_img)
    return _render_rgb_samples(scene, key, config)


def _render_rgb_samples(scene: RenderScene, key: Array, config: RenderConfig) -> Array:
    keys = jax.random.split(key, config.spp)

    def body(acc, k):
        return acc + _film_render(scene, k, config), None

    init = jnp.zeros((config.width * config.height, 3), jnp.float32)
    total, _ = jax.lax.scan(body, init, keys)
    img = total / config.spp
    return img.reshape(config.height, config.width, 3)

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
from fireflies_tpu.render import vec3 as v3m
from fireflies_tpu.render.intersect import (
    build_face_table,
    closest_hit,
    hit_attributes,
    hit_attributes_table,
    occluded_any,
)
from fireflies_tpu.render.rays import (
    camera_rays,
    camera_rays_tiled,
    unpermute_rows,
)
from fireflies_tpu.render.texture import (
    bilinear_sample_stack,
    bilinear_sample_stack_packed,
    pack_neighborhood_stack,
    pack_neighborhood_table,
    sample_envmap,
)
from fireflies_tpu.render.types import RenderConfig, RenderScene
from fireflies_tpu.render.vec3 import Vec3, from_array, splat

Array = jax.Array

_SHADOW_EPS = 1e-3


def _attrs_uv(attrs: dict) -> Array | None:
    """(N, 2) uv from component attrs (boundary for texture sampling)."""
    if "uv_x" not in attrs:
        return None
    return jnp.stack([attrs["uv_x"], attrs["uv_y"]], axis=-1)


def _pack_textures(scene: RenderScene) -> dict:
    """Precompute 2x2-neighborhood tables for every texture the trace will
    sample (one per render, amortized over bounces): TPU gathers are
    per-row bound, so each bilinear site drops from 4 gathers to 1."""
    packs = {}
    mats = scene.materials
    if scene.projector is not None and scene.projector.texture is not None:
        packs["proj"] = pack_neighborhood_table(scene.projector.texture)
    if mats.textures is not None:
        packs["base"] = pack_neighborhood_stack(mats.textures)
        packs["base_hw"] = mats.textures.shape[1:3]
    if mats.roughness_tex is not None:
        packs["rough"] = pack_neighborhood_stack(mats.roughness_tex)
        packs["rough_hw"] = mats.roughness_tex.shape[1:3]
    if mats.normal_tex is not None:
        packs["normal"] = pack_neighborhood_stack(mats.normal_tex)
        packs["normal_hw"] = mats.normal_tex.shape[1:3]
    return packs


def _shading_base_color(
    scene: RenderScene, params: dict, attrs: dict, packs: dict | None = None
) -> dict:
    """Override base_color / roughness with texture lookups where materials
    carry maps (Mitsuba: textured `base_color` / `roughness` on the
    principled BSDF, reference main.py:127-136).  Component-attr version."""
    mats = scene.materials
    uv = _attrs_uv(attrs)
    if uv is None:
        return params
    out = params
    if mats.textures is not None:
        if packs is not None and "base" in packs:
            h, w = packs["base_hw"]
            tex_color = bilinear_sample_stack_packed(
                packs["base"], h, w, attrs["mat_id"], uv
            )
        else:
            tex_color = bilinear_sample_stack(mats.textures, attrs["mat_id"], uv)
        has_tex = mats.has_texture[attrs["mat_id"]]
        out = dict(out)
        out["base_color"] = jnp.where(
            has_tex[:, None], tex_color, out["base_color"]
        )
        out.pop("base_color_v", None)  # invalidate the cached component form
    if mats.roughness_tex is not None:
        if packs is not None and "rough" in packs:
            h, w = packs["rough_hw"]
            tex_rough = bilinear_sample_stack_packed(
                packs["rough"], h, w, attrs["mat_id"], uv
            )[:, 0]
        else:
            tex_rough = bilinear_sample_stack(
                mats.roughness_tex, attrs["mat_id"], uv
            )[:, 0]
        has_r = mats.has_roughness_tex[attrs["mat_id"]]
        out = dict(out)
        out["roughness"] = jnp.where(has_r, tex_rough, out["roughness"])
    return out


def _shading_normal(
    scene: RenderScene, attrs: dict, n: Vec3, packs: dict | None = None
) -> Vec3:
    """Tangent-space normal mapping (Mitsuba `normalmap` BSDF wrapper):
    ns = normalize(T x + B y + N z) with (x, y, z) = 2 rgb - 1, using the
    UV-derived tangent from hit_attributes.  Falls back to the geometric
    normal where the material has no map or the tangent is degenerate.
    Component form throughout."""
    mats = scene.materials
    uv = _attrs_uv(attrs)
    if mats.normal_tex is None or uv is None or "tangent" not in attrs:
        return n
    if packs is not None and "normal" in packs:
        h, w = packs["normal_hw"]
        rgb = bilinear_sample_stack_packed(
            packs["normal"], h, w, attrs["mat_id"], uv
        )
    else:
        rgb = bilinear_sample_stack(mats.normal_tex, attrs["mat_id"], uv)
    lx, ly, lz = 2.0 * rgb[:, 0] - 1.0, 2.0 * rgb[:, 1] - 1.0, 2.0 * rgb[:, 2] - 1.0
    t_raw = attrs["tangent"]
    # Gram-Schmidt against the (flipped) shading-side geometric normal.
    t = t_raw - n * t_raw.dot(n)
    t_len = t.norm()
    ok = t_len > 1e-8
    t = t * (1.0 / jnp.maximum(t_len, 1e-20))
    b = n.cross(t)
    ns = (t * lx + b * ly + n * lz).normalized()
    # Keep the mapped normal in the geometric hemisphere (grazing maps can
    # flip it, which would punch light through the surface).
    ns = v3m.where(ns.dot(n) > 1e-4, ns, n)
    has_n = mats.has_normal_tex[attrs["mat_id"]]
    return v3m.where(has_n & ok, ns, n)


def _sample_bounce(
    scene: RenderScene,
    config: RenderConfig,
    bounce: int,
    bkey: Array,
    shade: dict,
    throughput: Vec3,
    active: Array,
    n_rays: int,
):
    """BSDF-sample the next path segment from a shaded vertex.

    `shade` is the vertex state captured by trace_rays' shading section:
    params / ns / n / wo / p / d_v / tangent.  Returns the advanced ray
    state (o, d, o_v, d_v, throughput, active, prev_pdf).  Split out of
    trace_rays so the shared-primary spp path (_film_render_shared) can
    resample vertex 0 per spp sample without re-shading it (see
    RenderConfig.shared_primary).
    """
    params = shade["params"]
    ns = shade["ns"]
    n = shade["n"]
    wo = shade["wo"]
    p = shade["p"]
    d_v = shade["d_v"]
    tangent = shade["tangent"]
    if _os.environ.get("FF_CONST_SAMPLE"):  # perf-bisection knob
        # Mirror direction with unit pdf / grey f: removes the BSDF
        # importance-sampling math while keeping the bounce ray
        # data-dependent.  full - this = sample_v cost.
        wi = (d_v - ns * (2.0 * ns.dot(d_v))).normalized()
        pdf = jnp.ones((n_rays,), jnp.float32)
        f = Vec3(pdf * 0.3, pdf * 0.3, pdf * 0.3)
    elif config.coherent_bounce:
        # Per-tile SHARED sample draws (see RenderConfig.
        # coherent_bounce): one (u_sel, u1, u2, u3, u4) draw per
        # 2048-ray kernel tile, broadcast to the tile's rays.
        # Marginals stay U(0,1) per pixel; tile direction boxes
        # narrow to the tile's normal spread, so the culled
        # bounce kernels prune.
        n_tiles = -(-n_rays // 2048)
        u_tiles = jax.random.uniform(
            jax.random.fold_in(bkey, 1), (5, n_tiles)
        )
        u_rays = jnp.repeat(u_tiles, 2048, axis=1)[:, :n_rays]
        wi, pdf, f = bsdf_mod.sample_v(
            params, ns, wo, None, tangent=tangent,
            uniforms=tuple(u_rays),
        )
    else:
        wi, pdf, f = bsdf_mod.sample_v(
            params, ns, wo, jax.random.fold_in(bkey, 1), tangent=tangent
        )
    if (
        config.reparam
        and config.reparam_indirect
        and bounce < config.reparam_ind_bounces
    ):
        # Warped-area reparameterization of the sampled direction:
        # silhouettes of occluders seen from p become stationary in
        # the gnomonic patch around wi, making indirect visibility
        # at this vertex differentiable (render/reparam.py
        # DirectionDomain).  Primal direction and throughput are
        # exactly unchanged.  The warp is per-vertex, so it applies
        # at any bounce; reparam_ind_bounces bounds the cost.
        from fireflies_tpu.render.reparam import (  # noqa: PLC0415
            reparam_direction,
        )

        cos_pre = n.dot(wi)
        side_pre = jnp.where(cos_pre >= 0, 1.0, -1.0)
        x_ind = (p + n * (side_pre * _SHADOW_EPS)).to_array()
        d_new, area_ind = reparam_direction(
            x_ind,
            wi.to_array(),
            scene.geometry,
            jax.random.fold_in(bkey, 11),
            k_aux=config.reparam_k_aux,
            radius=config.reparam_ind_radius,
            tri_chunk=config.tri_chunk,
            backend=config.backend,
            chunk=config.reparam_chunk,
        )
        wi = from_array(d_new)
        throughput = throughput * area_ind
    cos_i_s = n.dot(wi)  # geometric side (offsets)
    cos_i = jnp.abs(ns.dot(wi))  # shading cosine
    safe_pdf = jnp.maximum(pdf, 1e-6)
    weight = jnp.where(pdf > 1e-6, cos_i / safe_pdf, 0.0)
    throughput = throughput * f * weight
    active = active & (throughput.max_component() > 1e-5) & (pdf > 1e-6)
    # Offset the new origin to the side the ray leaves through.
    side = jnp.where(cos_i_s >= 0, 1.0, -1.0)
    o_v = p + n * (side * _SHADOW_EPS)
    d_v = wi
    o = o_v.to_array()
    d = d_v.to_array()
    prev_pdf = pdf
    return o, d, o_v, d_v, throughput, active, prev_pdf


def trace_rays(
    scene: RenderScene,
    o: Array,
    d: Array,
    key: Array,
    config: RenderConfig,
    primary_origin: Array | None = None,
    v0_capture: dict | None = None,
    resume: dict | None = None,
) -> Array:
    """Path-trace radiance for rays (N, 3); returns (N, 3).

    `primary_origin` (3,) marks the first bounce's rays as sharing that
    origin (camera position) — enables the fast shared-origin kernel.

    Shared-primary plumbing (see _film_render_shared):
      * `v0_capture` (a dict): stop after vertex 0 is fully shaded (its
        emission + every NEE strategy + escape background are in the
        returned radiance) and stash the vertex state needed to resample
        the first bounce (`shade` for _sample_bounce, plus `active`).
      * `resume`: skip vertex 0 entirely — start the bounce loop at
        bounce 1 from the given ray state (o_v, d_v, throughput, active,
        prev_pdf), as produced by _sample_bounce.
    """
    n_rays = o.shape[0]
    zeros = jnp.zeros((n_rays,), jnp.float32)
    ones = jnp.ones((n_rays,), jnp.float32)
    # Component (SoA) state throughout the shading chain: (N, 3) tensors
    # materialize badly on TPU (minor-dim-3) and broke fusion — the r2 HLO
    # moved ~900 GB of HBM per training step in this loop before the port.
    radiance = Vec3(zeros, zeros, zeros)
    throughput = Vec3(ones, ones, ones)
    active = jnp.ones((n_rays,), bool)
    # Escape radiance: constant sky (3,) is splatted once; an (H, W, 3)
    # envmap is sampled per escaped direction inside the bounce loop.
    env_tex = None
    if scene.background is not None and scene.background.ndim == 3:
        env_tex = jnp.asarray(scene.background)  # bridge may hold host numpy
        background = splat(jnp.zeros(3, jnp.float32))
    else:
        background = splat(
            scene.background
            if scene.background is not None
            else jnp.zeros(3, jnp.float32)
        )
    o_v = from_array(o)
    d_v = from_array(d)
    # One packed (F, 17) row per face: hit attributes then need ONE big
    # gather per bounce instead of 4-6 (TPU gathers cost ~per-row; they
    # dominated the shading pass at 4M rays).
    face_table = build_face_table(scene.geometry)
    has_uvs = scene.geometry.uvs is not None
    has_normals = scene.geometry.normals is not None
    tex_packs = _pack_textures(scene)
    # Static-geometry fast path (config.static_geometry): take position /
    # geometric normal / material id straight from the intersection kernels
    # (Hit.nx/ny/nz/mat) and skip the per-row-bound face-table gather at
    # every path vertex.  Only valid when the trace needs no interpolated
    # per-vertex quantities: flat shading (no smooth normals), no surface
    # textures (base/roughness/normal maps sample UVs), and no anisotropy
    # (tangents come from the UV columns).  The lobes flag set is the
    # trace-time truth for anisotropy (bridge narrows it per scene).
    _flags = scene.materials.flags
    _aniso_on = _flags is None or "aniso" in _flags  # None = conservative all-on
    kernel_attrs = (
        config.static_geometry
        and not has_normals
        and not any(k in tex_packs for k in ("base", "rough", "normal"))
        # Without UVs the gather path emits no tangent either, so the fast
        # path is equivalent regardless of the anisotropy flag.
        and (not has_uvs or not _aniso_on)
    )
    # Envmap NEE distribution (one cumsum per render): importance-sample
    # the envmap as an emitter with MIS against BSDF sampling — without it
    # an envmap is escape-only and small bright regions explode variance
    # (Mitsuba importance-samples every emitter).
    env_dist = None
    if env_tex is not None and config.env_nee:
        env_dist = lights_mod.envmap_distribution(env_tex)

    has_area_lights = scene.geometry.emissive_faces is not None
    prev_pdf = jnp.zeros((n_rays,), jnp.float32)  # bsdf pdf of the ray that got here

    start_bounce = 0
    if resume is not None:
        o_v = resume["o_v"]
        d_v = resume["d_v"]
        o = o_v.to_array()
        d = d_v.to_array()
        throughput = resume["throughput"]
        active = resume["active"]
        prev_pdf = resume["prev_pdf"]
        start_bounce = 1

    for bounce in range(start_bounce, config.max_bounces):
        bkey = jax.random.fold_in(key, bounce)
        # Dead-ray gating for bounce passes: retired paths (escaped at an
        # earlier bounce, throughput-killed) carry t_max = -1, the kernels'
        # dead-ray convention — the cull pass drops them from tile bounds
        # and all-dead tiles (sky regions, tile-major order keeps them
        # contiguous) skip their cluster loops entirely.
        if _os.environ.get("FF_NO_DEAD_GATE"):  # perf-bisection knob
            tmax_b = jnp.float32(1e30)
        else:
            tmax_b = jnp.where(active, jnp.float32(1e30), jnp.float32(-1.0))
        if bounce == 0:
            hit = closest_hit(
                o,
                d,
                scene.geometry,
                tri_chunk=config.tri_chunk,
                backend=config.backend,
                shared_origin=primary_origin,
                emit_attrs=kernel_attrs,
            )
        elif _os.environ.get("FF_SORT_INDIRECT", "0") != "0":
            # OFF by default: the permutation/unpermutation gathers cost more
            # (~70ms/step at 4M rays) than the kernel coherence saves.
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
                t_max=tmax_b[perm] if jnp.ndim(tmax_b) else tmax_b,
                tri_chunk=config.tri_chunk,
                backend=config.backend,
                emit_attrs=kernel_attrs,
            )
            hit = jax.tree.map(lambda x: x[inv], hit_s)
        elif _os.environ.get("FF_B1_FAKE_HIT"):  # perf-bisection knob
            # Replace the bounce closest-hit with a synthetic hit that still
            # data-depends on the rays (so the downstream shading chain can't
            # be constant-folded away): full - this = the bounce-pass kernel
            # cost, with shading/NEE untouched.
            from fireflies_tpu.render.types import Hit as _Hit  # noqa: PLC0415

            n_f = scene.geometry.faces.shape[0]
            fake_prim = (
                jnp.arange(n_rays, dtype=jnp.int32)
                + (d[:, 0] > 0).astype(jnp.int32)
            ) % n_f
            fake_t = 1.0 + 1e-3 * d[:, 1]
            hit = _Hit(
                t=fake_t,
                prim=jnp.where(active, fake_prim, -1),
                u=zeros,
                v=zeros,
                valid=active,
                nx=zeros if kernel_attrs else None,
                ny=zeros if kernel_attrs else None,
                nz=(zeros + 1.0) if kernel_attrs else None,
                mat=jnp.zeros_like(fake_prim) if kernel_attrs else None,
            )
        else:
            hit = closest_hit(
                o, d, scene.geometry, t_max=tmax_b,
                tri_chunk=config.tri_chunk, backend=config.backend,
                emit_attrs=kernel_attrs,
            )
        hit = jax.tree.map(jax.lax.stop_gradient, hit)

        # Background contribution for escaping rays, then retire them.
        escaped = active & ~hit.valid
        if env_tex is not None:
            ex, ey, ez = d_v.x, d_v.y, d_v.z
            if scene.background_to_world is not None:
                # Pull the direction back into the envmap frame (R^T d).
                r = scene.background_to_world[:3, :3]
                ex, ey, ez = (
                    r[0, 0] * ex + r[1, 0] * ey + r[2, 0] * ez,
                    r[0, 1] * ex + r[1, 1] * ey + r[2, 1] * ez,
                    r[0, 2] * ex + r[1, 2] * ey + r[2, 2] * ez,
                )
            bg = from_array(sample_envmap(env_tex, ex, ey, ez))
        else:
            bg = background
        if env_dist is not None and bounce > 0:
            # BSDF-sampled escape competes with envmap NEE at the previous
            # vertex: power-heuristic MIS (the NEE side carries the
            # complement).  Bounce 0 has no NEE competitor — full weight.
            pdf_env_esc = lights_mod.envmap_pdf_of_dir(env_dist, ex, ey, ez)
            w_esc = (prev_pdf * prev_pdf) / jnp.maximum(
                prev_pdf * prev_pdf + pdf_env_esc * pdf_env_esc, 1e-12
            )
        else:
            w_esc = 1.0
        radiance = radiance + throughput * bg * jnp.where(escaped, w_esc, 0.0)
        active = active & hit.valid

        if _os.environ.get("FF_FAKE_ATTRS"):  # perf-bisection knob
            # Synthetic hit attributes (no face-table gather, no barycentric
            # re-derivation) that keep every downstream dependency alive:
            # full - this = hit_attributes_table cost (ONE packed per-bounce
            # gather + attr math).
            pos = o_v + d_v * hit.t
            nrm = (-d_v).normalized()
            attrs = {
                "position": pos,
                "normal": nrm,
                "mat_id": jnp.maximum(hit.prim, 0)
                % scene.materials.base_color.shape[0],
            }
            if has_uvs:
                attrs["uv_x"] = pos.x - jnp.floor(pos.x)
                attrs["uv_y"] = pos.y - jnp.floor(pos.y)
        elif kernel_attrs:
            # Static-geometry fast path: attributes straight from the
            # traversal (see gate above).  position = o + t d needs no face
            # data at all; the normal is the kernel-carried plane normal
            # (W2 = cross(e1, e2)/det — same orientation as the gather
            # path's e1 x e2, so values match exactly after normalization).
            attrs = {
                "position": o_v + d_v * hit.t,
                "normal": v3m.Vec3(hit.nx, hit.ny, hit.nz).normalized(),
                "mat_id": hit.mat,
            }
        elif _os.environ.get("FF_ATTRS_GATHER_ONLY"):  # perf-bisection knob
            # The packed gather RUNS but the barycentric re-derivation math
            # is replaced by raw row reads: full - this = attr MATH cost;
            # this - fake_attrs = the gather itself.  Splits the
            # hit_attributes_table budget so the optimization target is
            # known (per-row-bound gather vs fusable VPU chains).
            prim = jnp.maximum(hit.prim, 0)
            row = face_table[prim]
            pos = o_v + d_v * hit.t
            attrs = {
                "position": pos,
                "normal": v3m.Vec3(row[:, 0], row[:, 1], row[:, 2]).normalized(),
                "mat_id": row[:, 15].astype(jnp.int32),
            }
            if has_uvs:
                attrs["uv_x"] = row[:, 9]
                attrs["uv_y"] = row[:, 10]
        else:
            attrs = hit_attributes_table(
                o_v, d_v, hit, face_table, has_uvs, has_normals
            )
        p = attrs["position"]
        n_geo = attrs["normal"]
        # Face the normal against the incoming ray.
        flip = jnp.sign(-n_geo.dot(d_v))
        flip = jnp.where(flip == 0, 1.0, flip)
        n = n_geo * flip
        wo = -d_v

        params = bsdf_mod.gather_params(scene.materials, attrs["mat_id"])
        # Medium sidedness for the rough-dielectric glass lobe: entering on
        # front-face hits (relative IOR = ior), exiting on back-face hits
        # (1 / ior).  The BSDF works in the flipped-normal frame and cannot
        # tell the two apart on its own.
        params["eta_rel"] = jnp.where(
            flip > 0, params["ior"], 1.0 / jnp.maximum(params["ior"], 1e-3)
        )
        if not _os.environ.get("FF_NO_BASETEX"):  # perf-bisection knob
            params = _shading_base_color(scene, params, attrs, packs=tex_packs)
        tangent = attrs.get("tangent")
        # Shading normal drives BSDF evaluation/sampling and cosine factors;
        # the geometric `n` keeps handling ray offsets and sidedness.  Base =
        # Phong-interpolated vertex normal where the mesh is smooth-shaded
        # (Mitsuba's default mesh shading), kept in the geometric hemisphere
        # so grazing interpolation can't punch light through the surface;
        # material normal maps perturb on top of that.
        if "smooth_normal" in attrs:
            n_sm = attrs["smooth_normal"] * flip
            n_base = v3m.where(n_sm.dot(n) > 1e-4, n_sm, n)
        else:
            n_base = n
        ns = _shading_normal(scene, attrs, n_base, packs=tex_packs)

        # Emissive surfaces contribute on any hit; for BSDF-sampled bounces
        # MIS-weight against the area-light NEE strategy (power heuristic) so
        # emitters aren't double counted.
        if has_area_lights and bounce > 0:
            pdf_area_hit = lights_mod.area_pdf_of_hit(scene.geometry, hit.prim)
            cos_l_hit = jnp.abs(n_geo.dot(d_v))
            pdf_solid_hit = pdf_area_hit * (hit.t * hit.t) / jnp.maximum(cos_l_hit, 1e-6)
            w_emit = (prev_pdf * prev_pdf) / jnp.maximum(
                prev_pdf * prev_pdf + pdf_solid_hit * pdf_solid_hit, 1e-12
            )
            w_emit = jnp.where(pdf_solid_hit > 0, w_emit, 1.0)
        else:
            w_emit = jnp.ones((n_rays,), jnp.float32)
        emission = bsdf_mod._colv(params, "emission")
        radiance = radiance + throughput * emission * jnp.where(active, w_emit, 0.0)

        # ---- Next-event estimation over every delta emitter --------------
        if _os.environ.get("FF_SKIP_NEE"):  # perf-bisection knob
            wi_list, dist_list, rad_list = [], [], []
        else:
            wi_list, dist_list, rad_list = lights_mod.total_incident_v(
                scene.lights, scene.projector, p,
                proj_tex_table=tex_packs.get("proj"),
            )
        if _os.environ.get("FF_NEE_CONST_RAD"):  # perf-bisection knob
            one_v = Vec3(
                jnp.ones_like(p.x), jnp.ones_like(p.x), jnp.ones_like(p.x)
            )
            rad_list = [one_v * (0.1 + 1e-20 * r.x) for r in rad_list]
        positions = lights_mod.emitter_positions(scene.lights, scene.projector)
        apertures = lights_mod.emitter_apertures(scene.lights, scene.projector)
        for li, (wi_l, dist_l, rad_l) in enumerate(zip(wi_list, dist_list, rad_list)):
            lit = (rad_l.max_component() > 0.0) & active
            # Shadow origin offset to the side the light is on: thin
            # transmission (spec_trans) lets below-horizon emitters
            # contribute through the surface.
            cos_i_s = n.dot(wi_l)
            side_l = jnp.where(cos_i_s >= 0, 1.0, -1.0)
            shadow_o_l = p + n * (side_l * _SHADOW_EPS)
            # Shadow segments reversed (light -> surface) so every ray in the
            # batch shares the light's origin — fast-kernel eligible.  The
            # direction is the unnormalized segment; t in (eps, 1 - eps)
            # excludes the endpoints (surface point already offset along n).
            shadow_o_arr = shadow_o_l.to_array()
            seg_d = jax.lax.stop_gradient(shadow_o_arr - positions[li][None, :])
            # Dead-ray gating: points the emitter cannot light (outside a
            # spot/projector cone, dark texel, inactive path) get t_max = -1,
            # which the kernels treat as dead — the any-hit while exits
            # immediately on all-dead ray tiles and the slab gate skips the
            # triangle loops otherwise.  A projector's cone covers a small
            # part of the frame, so most shadow tiles skip entirely.
            tmax_l = jnp.where(lit, 1.0 - 1e-4, -1.0)
            if _os.environ.get("FF_NO_NEE_GATE"):  # perf-bisection knob
                tmax_l = jnp.full_like(tmax_l, 1.0 - 1e-4)
            if _os.environ.get("FF_SKIP_OCCL"):  # perf-bisection knob
                blocked = jnp.zeros(seg_d.shape[0], bool)
            elif apertures[li] is not None:
                # Soft-shadow aperture: jitter the OCCLUSION origin over the
                # emitter's local-XY disk (one sample per spp pass; spp
                # averages the penumbra).  Radiance/direction keep the delta
                # model — only visibility is area-averaged, the dominant
                # soft-shadow term.  Per-ray origins spread by the radius,
                # so this pass uses the general (per-ray-origin) kernel.
                radius_a, ax_a, ay_a = apertures[li]
                ka = jax.random.fold_in(bkey, 101 + li)
                u_ap = jax.random.uniform(ka, (2, n_rays))
                rr = jnp.sqrt(u_ap[0]) * radius_a
                th = (2.0 * jnp.pi) * u_ap[1]
                cx = rr * jnp.cos(th)
                cy = rr * jnp.sin(th)
                light_o = (
                    positions[li][None, :]
                    + cx[:, None] * ax_a[None, :]
                    + cy[:, None] * ay_a[None, :]
                )
                seg_ap = jax.lax.stop_gradient(shadow_o_arr - light_o)
                blocked = occluded_any(
                    jax.lax.stop_gradient(light_o),
                    seg_ap,
                    scene.geometry,
                    t_min=1e-4,
                    t_max=tmax_l,
                    tri_chunk=config.tri_chunk,
                    backend=config.backend,
                )
            elif _os.environ.get("FF_OCCL_FORWARD"):  # perf-bisection knob
                # Forward (receiver-origin) segments: per-ray origins stay
                # tile-coherent so the general kernel's box prune applies.
                blocked = occluded_any(
                    shadow_o_arr,
                    -seg_d,
                    scene.geometry,
                    t_min=1e-4,
                    t_max=tmax_l,
                    tri_chunk=config.tri_chunk,
                    backend=config.backend,
                )
            else:
                blocked = occluded_any(
                    shadow_o_arr,
                    seg_d,
                    scene.geometry,
                    t_min=1e-4,
                    t_max=tmax_l,
                    tri_chunk=config.tri_chunk,
                    backend=config.backend,
                    shared_origin=positions[li],
                )
            if _os.environ.get("FF_NEE_CONST_F"):  # perf-bisection knob
                f = Vec3(
                    0.3 + 1e-20 * wi_l.x, 0.3 + 1e-20 * wi_l.y, 0.3 + 1e-20 * wi_l.z
                )
            else:
                f = bsdf_mod.evaluate_v(params, ns, wo, wi_l, tangent=tangent)
            cos_i = jnp.abs(ns.dot(wi_l))  # |cos|: f() gates the side
            use = lit & ~blocked
            radiance = radiance + throughput * f * rad_l * jnp.where(use, cos_i, 0.0)

        # ---- Envmap NEE (importance-sampled background) -------------------
        if env_dist is not None:
            wi_env, pdf_env = lights_mod.sample_envmap_nee(
                env_dist, n_rays, jax.random.fold_in(bkey, 7)
            )
            # Radiance lookup in the ENVMAP frame (same path as escape
            # lookups — value and texture gradients match exactly), then
            # rotate the direction into world space for shading/occlusion.
            rad_e = from_array(
                sample_envmap(env_tex, wi_env.x, wi_env.y, wi_env.z)
            )
            if scene.background_to_world is not None:
                r_env = scene.background_to_world[:3, :3]
                wi_e = Vec3(
                    r_env[0, 0] * wi_env.x + r_env[0, 1] * wi_env.y + r_env[0, 2] * wi_env.z,
                    r_env[1, 0] * wi_env.x + r_env[1, 1] * wi_env.y + r_env[1, 2] * wi_env.z,
                    r_env[2, 0] * wi_env.x + r_env[2, 1] * wi_env.y + r_env[2, 2] * wi_env.z,
                )
            else:
                wi_e = wi_env
            cos_e_geo = n.dot(wi_e)
            side_e = jnp.where(cos_e_geo >= 0, 1.0, -1.0)
            shadow_o_e = (p + n * (side_e * _SHADOW_EPS)).to_array()
            # Dead-ray gating: dark samples / retired paths skip the kernel.
            gate_e = active & (rad_e.max_component() > 0) & (pdf_env > 1e-12)
            blocked_e = occluded_any(
                shadow_o_e,
                jax.lax.stop_gradient(wi_e.to_array()),
                scene.geometry,
                t_min=1e-4,
                t_max=jnp.where(gate_e, jnp.float32(1e30), jnp.float32(-1.0)),
                tri_chunk=config.tri_chunk,
                backend=config.backend,
            )
            f_env = bsdf_mod.evaluate_v(params, ns, wo, wi_e, tangent=tangent)
            p_b_env = bsdf_mod.pdf_v(params, ns, wo, wi_e, tangent=tangent)
            w_mis_e = (pdf_env * pdf_env) / jnp.maximum(
                pdf_env * pdf_env + p_b_env * p_b_env, 1e-12
            )
            cos_e = jnp.abs(ns.dot(wi_e))  # f() gates the side
            use_e = gate_e & ~blocked_e
            scale_e = jnp.where(
                use_e, cos_e / jnp.maximum(pdf_env, 1e-12) * w_mis_e, 0.0
            )
            radiance = radiance + throughput * f_env * rad_e * scale_e

        # ---- Area-light NEE (emissive faces) ------------------------------
        if has_area_lights:
            x_l_a, n_l_a, le_a, pdf_area = lights_mod.sample_area_light(
                scene.geometry, scene.materials, p.to_array(),
                jax.random.fold_in(bkey, 3)
            )
            x_l = from_array(x_l_a)
            n_l = from_array(n_l_a)
            le = from_array(le_a)
            dir_a = x_l - p
            side_a = jnp.where(n.dot(dir_a) >= 0, 1.0, -1.0)
            shadow_o_v = p + n * (side_a * _SHADOW_EPS)
            shadow_o_a = shadow_o_v.to_array()
            seg = jax.lax.stop_gradient(x_l_a - shadow_o_a)
            seg_v = x_l - shadow_o_v
            d2 = jnp.maximum(seg_v.norm2(), 1e-12)
            dist = jnp.sqrt(d2)
            wi_a = seg_v * (1.0 / dist)
            cos_s = jnp.abs(ns.dot(wi_a))  # f() gates the side
            cos_l = jnp.abs(n_l.dot(wi_a))
            # Segment stops just short of the emitter face itself.  Dead-ray
            # gating as in the delta-NEE above: paths that cannot use the
            # sample skip the kernel work.
            gate_a = active & (cos_s > 0) & (le.max_component() > 0)
            blocked_a = occluded_any(
                shadow_o_a,
                seg,
                scene.geometry,
                t_min=1e-4,
                t_max=jnp.where(gate_a, 1.0 - 1e-3, -1.0),
                tri_chunk=config.tri_chunk,
                backend=config.backend,
            )
            f_a = bsdf_mod.evaluate_v(params, ns, wo, wi_a, tangent=tangent)
            pdf_solid = pdf_area * d2 / jnp.maximum(cos_l, 1e-6)
            p_b = bsdf_mod.pdf_v(params, ns, wo, wi_a, tangent=tangent)
            w_nee = (pdf_solid * pdf_solid) / jnp.maximum(
                pdf_solid * pdf_solid + p_b * p_b, 1e-12
            )
            use_a = (
                active
                & ~blocked_a
                & (cos_s > 0)
                & (le.max_component() > 0)
            )
            scale_a = jnp.where(
                use_a, cos_s / jnp.maximum(pdf_solid, 1e-12) * w_nee, 0.0
            )
            radiance = radiance + throughput * f_a * le * scale_a

        # ---- Indirect bounce --------------------------------------------
        if v0_capture is not None and bounce == 0:
            # Vertex 0 fully shaded: hand the sampling state to the caller
            # (shared-primary spp path) instead of advancing the path.
            v0_capture.update(
                shade=dict(params=params, ns=ns, n=n, wo=wo, p=p, d_v=d_v,
                           tangent=tangent),
                active=active,
            )
            return radiance.to_array()

        if bounce + 1 < config.max_bounces:
            o, d, o_v, d_v, throughput, active, prev_pdf = _sample_bounce(
                scene, config, bounce, bkey,
                dict(params=params, ns=ns, n=n, wo=wo, p=p, d_v=d_v,
                     tangent=tangent),
                throughput, active, n_rays,
            )
    return radiance.to_array()


def _film_render(
    scene: RenderScene,
    key: Array,
    config: RenderConfig,
    film_y0: Array | int = 0,
    film_full_height: int | None = None,
) -> Array:
    """One sample-per-pixel pass; (H*W, 3) in row-major pixel order.

    `film_y0`/`film_full_height` render a config.height-row horizontal BAND
    of a film_full_height-row film (band-parallel rendering: each mesh
    device renders its band; see parallel.render_tile_parallel)."""
    k_pix, k_path = jax.random.split(key)
    if config.reparam:
        return _film_render_reparam(scene, k_pix, k_path, config)
    # Tile-major ray order: spatially local 2048-ray tiles so the Pallas
    # kernels' per-tile cluster pruning is effective (see camera_rays_tiled).
    o, d, inv_perm = camera_rays_tiled(
        scene.camera, config.width, config.height, key=k_pix,
        y_offset=film_y0, full_height=film_full_height,
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
        out = out.reshape(-1, 3)[: config.width * config.height]
        return unpermute_rows(out, inv_perm, config.width, config.height)
    radiance = trace_rays(
        scene, o, d, k_path, config, primary_origin=scene.camera.to_world[:3, 3]
    )
    return unpermute_rows(radiance, inv_perm, config.width, config.height)


def _film_render_shared(
    scene: RenderScene,
    key: Array,
    config: RenderConfig,
    film_y0: Array | int = 0,
    film_full_height: int | None = None,
) -> Array:
    """All-spp render with the FIRST path vertex shared across samples
    (RenderConfig.shared_primary; returns (H, W, 3), replaces the per-spp
    scan of _render_rgb_samples).

    Vertex 0's work — primary closest hit, attributes, and every NEE
    strategy including its occlusion kernels — is spp-invariant for delta
    emitters under a fixed camera: only the BSDF bounce draw differs per
    sample.  It is computed ONCE (trace_rays v0_capture), then each spp
    sample resamples the bounce (_sample_bounce) and traces the remaining
    vertices (trace_rays resume).  spp cost drops from spp x (v0 + rest)
    to v0 + spp x rest — measured r5 (11.5k faces, 512^2, coherent
    static-geometry, same window): see BENCH_VARIANTS.json shared-primary
    entries.

    Semantics vs the default path: ONE pixel jitter + one set of vertex-0
    NEE aperture/area/envmap draws is shared by all spp samples, so spp
    no longer averages antialiasing or vertex-0 penumbra noise (it still
    averages all bounce randomness).  Per-pixel estimates stay unbiased;
    only the noise decomposition changes.  Not compatible with reparam
    (boundary gradients need fresh primary samples per pass).
    """
    k_pix, k_v0, k_spp = jax.random.split(key, 3)
    o, d, inv_perm = camera_rays_tiled(
        scene.camera, config.width, config.height, key=k_pix,
        y_offset=film_y0, full_height=film_full_height,
    )
    cam_pos = scene.camera.to_world[:3, 3]
    n_rays = o.shape[0]
    cap: dict = {}
    rad_v0 = trace_rays(
        scene, o, d, k_v0, config, primary_origin=cam_pos, v0_capture=cap
    )

    if config.max_bounces == 1:
        total = rad_v0
    else:
        ones = jnp.ones((n_rays,), jnp.float32)
        throughput1 = Vec3(ones, ones, ones)

        def body(acc, ks):
            _o2, _d2, o_v2, d_v2, thr, act, ppdf = _sample_bounce(
                scene, config, 0, jax.random.fold_in(ks, 0),
                cap["shade"], throughput1, cap["active"], n_rays,
            )
            rest = trace_rays(
                scene, _o2, _d2, ks, config,
                resume=dict(o_v=o_v2, d_v=d_v2, throughput=thr,
                            active=act, prev_pdf=ppdf),
            )
            return acc + rest, None

        keys = jax.random.split(k_spp, config.spp)
        rest_total, _ = jax.lax.scan(
            body, jnp.zeros((n_rays, 3), jnp.float32), keys
        )
        total = rad_v0 + rest_total / config.spp

    img = unpermute_rows(total, inv_perm, config.width, config.height)
    return img.reshape(config.height, config.width, 3)


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
        light_positions=light_positions, chunk=config.reparam_chunk,
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


def render_rgb(
    scene: RenderScene,
    key: Array,
    config: RenderConfig,
    *,
    film_y0: Array | int = 0,
    film_full_height: int | None = None,
) -> Array:
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
    Independent seeds restore E[g'(img)] * E[d(img)].

    Caveat for POINTWISE NONSMOOTH losses (L1/sign-like) at spp=1: the
    warped-area flux lives on the pixels where f != 0 (the lit side of a
    moving edge), and a single-sample g' carries no signal exactly there
    (both primal and target are lit, so sign(primal - target) is jitter
    noise) — measured ~4% of the true gradient on a shadow-edge pose
    recovery.  Blur the images inside the loss (postprocessing.
    gaussian_blur2d) or raise spp so g' sees the edge; see
    tests/test_reparam_shadow.py::test_pure_pose_recovery_with_reparam_only."""
    if config.reparam:
        if film_full_height is not None:
            raise NotImplementedError(
                "band-parallel rendering (film_y0/film_full_height) is not "
                "supported with config.reparam — the warped-area pass samples "
                "the full film"
            )
        k_primal, k_grad = jax.random.split(key)
        primal = jax.lax.stop_gradient(
            render_rgb(scene, k_primal, config.replace(reparam=False))
        )
        grad_img = _render_rgb_samples(scene, k_grad, config)
        return primal + grad_img - jax.lax.stop_gradient(grad_img)
    return _render_rgb_samples(
        scene, key, config, film_y0=film_y0, film_full_height=film_full_height
    )


def _render_rgb_samples(
    scene: RenderScene,
    key: Array,
    config: RenderConfig,
    film_y0: Array | int = 0,
    film_full_height: int | None = None,
) -> Array:
    if config.shared_primary and not config.reparam and not config.ray_chunk:
        # Shared first vertex across spp (see _film_render_shared).  reparam
        # needs fresh primary samples per pass and ray_chunk re-chunks the
        # film inside trace_rays; both keep the per-spp scan below.
        return _film_render_shared(scene, key, config, film_y0, film_full_height)

    keys = jax.random.split(key, config.spp)

    def body(acc, k):
        return acc + _film_render(scene, k, config, film_y0, film_full_height), None

    init = jnp.zeros((config.width * config.height, 3), jnp.float32)
    total, _ = jax.lax.scan(body, init, keys)
    img = total / config.spp
    return img.reshape(config.height, config.width, 3)

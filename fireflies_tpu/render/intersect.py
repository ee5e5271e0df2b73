"""Ray/triangle intersection (pure-JAX reference path).

Replaces `scene.ray_intersect` of the Mitsuba backend (reference
fireflies/graphics/depth.py:77).  Möller-Trumbore over triangle chunks with a
running best-hit carried through `lax.scan`, so peak memory is
O(rays x tri_chunk) regardless of scene size.  All math is f32 VPU work with
big static shapes — XLA tiles it well on TPU; the Pallas kernel
(fireflies_tpu.render.pallas.intersect) is the fused hot path and must agree
with this one bit-for-bit-ish (tested).

Differentiation: traversal returns integer prim ids (inherently
non-differentiable); `hit_attributes` re-derives (t, u, v, position, normal)
differentiably from the chosen primitive — the standard detached-traversal
trick, giving correct gradients w.r.t. vertices and ray origin/direction
everywhere except across silhouettes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fireflies_tpu.render.types import Geometry, Hit

Array = jax.Array

_EPS_DET = 1e-9
# Slightly conservative barycentric bounds: rays grazing a shared edge hit at
# least one of the adjacent triangles instead of slipping through the seam.
_EPS_BARY = 1e-6
_BIG = jnp.float32(3.4e38)


def _mt_chunk(o: Array, d: Array, v0: Array, e1: Array, e2: Array):
    """Möller-Trumbore for all (ray, tri) pairs.

    o, d: (N, 3); v0, e1, e2: (C, 3).  Returns t, u, v, valid of shape (N, C).

    Internally structure-of-arrays: every temporary is an (N, C) plane, never
    (N, C, 3) — a minormost dim of 3 would waste 125/128 TPU vector lanes.
    """
    ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]  # (N, 1)
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
    v0x, v0y, v0z = v0[None, :, 0], v0[None, :, 1], v0[None, :, 2]  # (1, C)
    e1x, e1y, e1z = e1[None, :, 0], e1[None, :, 1], e1[None, :, 2]
    e2x, e2y, e2z = e2[None, :, 0], e2[None, :, 1], e2[None, :, 2]

    # pvec = d x e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) < _EPS_DET, 0.0, 1.0 / det)

    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det

    # qvec = tvec x e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det

    valid = (
        (jnp.abs(det) >= _EPS_DET)
        & (u >= -_EPS_BARY)
        & (v >= -_EPS_BARY)
        & (u + v <= 1.0 + _EPS_BARY)
    )
    return t, u, v, valid


def _per_ray(bound) -> Array:
    """Normalize a scalar or (N,) t-bound for broadcasting against (N, C)."""
    bound = jnp.asarray(bound, jnp.float32)
    return bound[:, None] if bound.ndim == 1 else bound


def intersect_brute(
    o: Array,
    d: Array,
    geometry: Geometry,
    t_min: float | Array = 1e-4,
    t_max: float | Array = 1e30,
    tri_chunk: int = 512,
) -> Hit:
    """Closest-hit query. o, d: (N, 3) world-space rays (d need not be unit —
    t is in units of |d|). Returns Hit with prim = -1 on miss."""
    v0, e1, e2 = geometry.triangle_corners()
    n_tri = v0.shape[0]
    n_rays = o.shape[0]

    chunk = max(min(tri_chunk, n_tri), 1)
    n_chunks = -(-n_tri // chunk)
    pad = n_chunks * chunk - n_tri
    if pad:
        # Degenerate padding triangles never intersect (zero-area at origin).
        zpad = jnp.zeros((pad, 3), v0.dtype)
        v0 = jnp.concatenate([v0, zpad])
        e1 = jnp.concatenate([e1, zpad])
        e2 = jnp.concatenate([e2, zpad])

    v0c = v0.reshape(n_chunks, chunk, 3)
    e1c = e1.reshape(n_chunks, chunk, 3)
    e2c = e2.reshape(n_chunks, chunk, 3)
    base_ids = jnp.arange(n_chunks, dtype=jnp.int32) * chunk

    t_min = _per_ray(t_min)
    t_max = _per_ray(t_max)

    def body(carry, chunk_data):
        # Track only (t, prim): barycentrics are re-derived differentiably in
        # hit_attributes, so carrying u/v (plus the per-row gathers that
        # entails) would be pure overhead in the hot loop.
        best_t, best_prim = carry
        cv0, ce1, ce2, base = chunk_data
        t, _u, _v, valid = _mt_chunk(o, d, cv0, ce1, ce2)
        valid &= (t > t_min) & (t < t_max)
        t = jnp.where(valid, t, _BIG)
        chunk_min = jnp.min(t, axis=-1)
        chunk_arg = jnp.argmin(t, axis=-1).astype(jnp.int32)
        better = chunk_min < best_t
        best_prim = jnp.where(better, base + chunk_arg, best_prim)
        best_t = jnp.minimum(best_t, chunk_min)
        return (best_t, best_prim), None

    init = (
        jnp.full((n_rays,), _BIG, jnp.float32),
        jnp.full((n_rays,), -1, jnp.int32),
    )
    (best_t, best_prim), _ = jax.lax.scan(body, init, (v0c, e1c, e2c, base_ids))
    valid = best_prim >= 0
    return Hit(
        t=jnp.where(valid, best_t, 0.0),
        prim=best_prim,
        u=jnp.zeros((n_rays,), jnp.float32),
        v=jnp.zeros((n_rays,), jnp.float32),
        valid=valid,
    )


def occluded(
    o: Array,
    d: Array,
    geometry: Geometry,
    t_min: float | Array = 1e-4,
    t_max: float | Array = 1.0,
    tri_chunk: int = 512,
) -> Array:
    """Any-hit query for shadow rays: True where segment [t_min, t_max] along
    d is blocked.  t_max is in units of |d| (pass 1.0 with d = light - p)."""
    v0, e1, e2 = geometry.triangle_corners()
    n_tri = v0.shape[0]
    chunk = max(min(tri_chunk, n_tri), 1)
    n_chunks = -(-n_tri // chunk)
    pad = n_chunks * chunk - n_tri
    if pad:
        zpad = jnp.zeros((pad, 3), v0.dtype)
        v0 = jnp.concatenate([v0, zpad])
        e1 = jnp.concatenate([e1, zpad])
        e2 = jnp.concatenate([e2, zpad])

    v0c = v0.reshape(n_chunks, chunk, 3)
    e1c = e1.reshape(n_chunks, chunk, 3)
    e2c = e2.reshape(n_chunks, chunk, 3)
    t_min = _per_ray(t_min)
    t_max = _per_ray(t_max)

    def body(blocked, chunk_data):
        cv0, ce1, ce2 = chunk_data
        t, _, _, valid = _mt_chunk(o, d, cv0, ce1, ce2)
        hit = valid & (t > t_min) & (t < t_max)
        return blocked | jnp.any(hit, axis=-1), None

    blocked, _ = jax.lax.scan(
        body, jnp.zeros((o.shape[0],), bool), (v0c, e1c, e2c)
    )
    return blocked


# The Pallas kernels keep the triangle SoA in SMEM (scalar-indexable); v5e
# SMEM is 1 MiB (measured via compiler OOM dumps), so the 12-row f32 Woop
# table caps out near 20k faces single-buffered (12 x Tpad x 4B <= ~960 KiB
# after the box / list tables) — but under vmap (batched variants, the
# production mode) every batch element carries its OWN geometry, so Mosaic
# double-buffers the per-batch SMEM windows and the cap HALVES: at chunk 16
# the budget is ~103 B/face (woop 96 + boxes 3 + lists 4, x2 buffering),
# i.e. ~9.8k faces.  Default to 8192 for margin; larger scenes use the
# HBM-streamed kernels (measured OOM: 11.5k faces x batch 16 asked 1.42 MiB
# of 1 MiB SMEM).
PALLAS_MAX_TRIS = int(__import__("os").environ.get("FF_PALLAS_MAX_TRIS", 8192))

# Tile-culled shared-origin kernels (intersect_culled.py): per-tile cluster
# lists built by a conservative XLA cone/AABB pass.  Default ON for the
# coherent passes; FF_NO_TILE_CULL=1 restores the slab-scan kernels.
# Measured (v5e, 512x512 primary): 1.5x at 1.4k faces, 2.35x at 11.5k,
# 2.2x (streamed) at 51k.
_TILE_CULL = __import__("os").environ.get("FF_NO_TILE_CULL") is None
_CULL_CHUNK = int(__import__("os").environ.get("FF_CULL_CHUNK", 16))
# General (per-ray-origin, incoherent-direction) passes: a tile's direction
# box spans the sphere, so conservative culling lists ~everything — but the
# per-tile FRONT-TO-BACK order still feeds the best-t clip.  Measured: wash
# at 1.4k faces, worthwhile at 10k+.  Threshold + chunk:
_GEN_CULL_MIN_FACES = int(
    __import__("os").environ.get("FF_GEN_CULL_MIN_FACES", 4096)
)
_GEN_CULL_CHUNK = int(__import__("os").environ.get("FF_GEN_CULL_CHUNK", 64))


def _use_pallas(backend: str, n_faces: int) -> bool:
    if backend == "pallas":
        return True
    if backend == "jax":
        return False
    # auto: compiled Pallas on TPU-like backends (within SMEM capacity),
    # pure JAX elsewhere.
    return jax.default_backend() not in ("cpu",) and n_faces <= PALLAS_MAX_TRIS


def _attrs_fallback(hit: Hit, geometry: Geometry) -> Hit:
    """Fill Hit.nx/ny/nz/mat for paths whose kernels don't emit them: ONE
    packed (F, 4) gather of [face normal, mat id] rows (per-row-bound like
    any TPU gather, but 4x narrower than the differentiable face table and
    with none of the re-derivation math).  Detached by construction."""
    v0 = geometry.vertices[geometry.faces[:, 0]]
    e1 = geometry.vertices[geometry.faces[:, 1]] - v0
    e2 = geometry.vertices[geometry.faces[:, 2]] - v0
    n = jnp.cross(e1, e2)
    table = jax.lax.stop_gradient(
        jnp.concatenate(
            [n, geometry.face_mat[:, None].astype(jnp.float32)], axis=1
        )
    )
    rows = table[jnp.maximum(hit.prim, 0)]
    return hit.replace(
        nx=rows[:, 0], ny=rows[:, 1], nz=rows[:, 2],
        mat=rows[:, 3].astype(jnp.int32),
    )


def closest_hit(
    o: Array,
    d: Array,
    geometry: Geometry,
    t_min: float = 1e-4,
    t_max: Array | float = 1e30,
    tri_chunk: int = 512,
    backend: str = "auto",
    shared_origin: Array | None = None,
    emit_attrs: bool = False,
) -> Hit:
    """Closest-hit dispatcher: Pallas kernel on TPU, JAX scan elsewhere.

    Pass `shared_origin` (3,) when every ray starts there (camera-primary,
    reversed shadow batches): the Pallas path then uses the Woop
    precomputed-transform kernel (~1.5x fewer ops per pair).

    With emit_attrs, the returned Hit carries nx/ny/nz/mat (detached plane
    normal + material id; see Hit docstring).  The streamed culled kernels
    emit them in-kernel for free bandwidth (the mat id rides the woop DMA's
    padding row); other paths fall back to one narrow packed gather.
    """
    n_faces = geometry.faces.shape[0]
    on_tpu = jax.default_backend() not in ("cpu",) and backend != "jax"
    if _use_pallas(backend, n_faces):
        from fireflies_tpu.render.pallas import (  # noqa: PLC0415
            intersect_pallas,
            intersect_pallas_shared,
        )

        if shared_origin is not None:
            if _TILE_CULL:
                from fireflies_tpu.render.pallas.intersect_culled import (  # noqa: PLC0415
                    intersect_pallas_shared_culled,
                )

                t, prim = intersect_pallas_shared_culled(
                    shared_origin, d, geometry.vertices, geometry.faces,
                    t_min=t_min, t_max=t_max, chunk=_CULL_CHUNK,
                )
            else:
                t, prim = intersect_pallas_shared(
                    shared_origin, d, geometry.vertices, geometry.faces,
                    t_min=t_min, t_max=t_max,
                )
        elif _TILE_CULL and n_faces >= _GEN_CULL_MIN_FACES:
            from fireflies_tpu.render.pallas.intersect_culled import (  # noqa: PLC0415
                intersect_pallas_general_culled,
            )

            t, prim = intersect_pallas_general_culled(
                o, d, geometry.vertices, geometry.faces,
                t_min=t_min, t_max=t_max, chunk=_GEN_CULL_CHUNK,
            )
        else:
            t, prim = intersect_pallas(
                o, d, geometry.vertices, geometry.faces, t_min=t_min, t_max=t_max
            )
        valid = prim >= 0
        zeros = jnp.zeros_like(t)
        hit = Hit(t=t, prim=prim, u=zeros, v=zeros, valid=valid)
        return _attrs_fallback(hit, geometry) if emit_attrs else hit
    if on_tpu:
        # Beyond SMEM residency: HBM-streamed double-buffered kernels.
        from fireflies_tpu.render.pallas import (  # noqa: PLC0415
            intersect_pallas_streamed,
            intersect_pallas_streamed_general,
        )

        fm = geometry.face_mat if emit_attrs else None
        attrs = ()
        if shared_origin is not None:
            if _TILE_CULL:
                from fireflies_tpu.render.pallas.intersect_stream import (  # noqa: PLC0415
                    intersect_pallas_streamed_culled,
                )

                t, prim, *attrs = intersect_pallas_streamed_culled(
                    shared_origin, d, geometry.vertices, geometry.faces,
                    t_min=t_min, t_max=t_max, face_mat=fm,
                )
            else:
                t, prim = intersect_pallas_streamed(
                    shared_origin, d, geometry.vertices, geometry.faces,
                    t_min=t_min, t_max=t_max,
                )
        elif _TILE_CULL:
            from fireflies_tpu.render.pallas.intersect_stream import (  # noqa: PLC0415
                intersect_pallas_streamed_general_culled,
            )

            t, prim, *attrs = intersect_pallas_streamed_general_culled(
                o, d, geometry.vertices, geometry.faces, t_min=t_min,
                t_max=t_max, face_mat=fm,
            )
        else:
            t, prim = intersect_pallas_streamed_general(
                o, d, geometry.vertices, geometry.faces, t_min=t_min, t_max=t_max
            )
        valid = prim >= 0
        zeros = jnp.zeros_like(t)
        if attrs:
            nx, ny, nz, mat = attrs
            return Hit(
                t=t, prim=prim, u=zeros, v=zeros, valid=valid,
                nx=nx, ny=ny, nz=nz, mat=mat,
            )
        hit = Hit(t=t, prim=prim, u=zeros, v=zeros, valid=valid)
        return _attrs_fallback(hit, geometry) if emit_attrs else hit
    if shared_origin is not None:
        o = jnp.broadcast_to(shared_origin, d.shape)
    hit = intersect_brute(o, d, geometry, t_min, t_max, tri_chunk)
    return _attrs_fallback(hit, geometry) if emit_attrs else hit


def occluded_any(
    o: Array,
    d: Array,
    geometry: Geometry,
    t_min: float = 1e-4,
    t_max: Array | float = 1.0,
    tri_chunk: int = 512,
    backend: str = "auto",
    shared_origin: Array | None = None,
) -> Array:
    """Any-hit dispatcher (shadow rays).  See closest_hit for shared_origin."""
    import os as _os  # noqa: PLC0415

    any_hit = _os.environ.get("FF_OCCL_CLOSEST") is None  # perf-bisection knob
    n_faces = geometry.faces.shape[0]
    on_tpu = jax.default_backend() not in ("cpu",) and backend != "jax"
    if _use_pallas(backend, n_faces):
        from fireflies_tpu.render.pallas import (  # noqa: PLC0415
            intersect_pallas,
            intersect_pallas_shared,
        )

        if shared_origin is not None:
            if _TILE_CULL:
                from fireflies_tpu.render.pallas.intersect_culled import (  # noqa: PLC0415
                    intersect_pallas_shared_culled,
                )

                _, prim = intersect_pallas_shared_culled(
                    shared_origin, d, geometry.vertices, geometry.faces,
                    t_min=t_min, t_max=t_max, any_hit=any_hit,
                    chunk=_CULL_CHUNK,
                )
            else:
                _, prim = intersect_pallas_shared(
                    shared_origin, d, geometry.vertices, geometry.faces,
                    t_min=t_min, t_max=t_max, any_hit=any_hit,
                )
        elif _TILE_CULL and n_faces >= _GEN_CULL_MIN_FACES:
            from fireflies_tpu.render.pallas.intersect_culled import (  # noqa: PLC0415
                intersect_pallas_general_culled,
            )

            _, prim = intersect_pallas_general_culled(
                o, d, geometry.vertices, geometry.faces,
                t_min=t_min, t_max=t_max, any_hit=any_hit,
                chunk=_GEN_CULL_CHUNK,
            )
        else:
            _, prim = intersect_pallas(
                o, d, geometry.vertices, geometry.faces,
                t_min=t_min, t_max=t_max, any_hit=any_hit,
            )
        return prim >= 0
    if on_tpu:
        from fireflies_tpu.render.pallas import (  # noqa: PLC0415
            intersect_pallas_streamed,
            intersect_pallas_streamed_general,
        )

        if shared_origin is not None:
            if _TILE_CULL:
                from fireflies_tpu.render.pallas.intersect_stream import (  # noqa: PLC0415
                    intersect_pallas_streamed_culled,
                )

                _, prim = intersect_pallas_streamed_culled(
                    shared_origin, d, geometry.vertices, geometry.faces,
                    t_min=t_min, t_max=t_max, any_hit=any_hit,
                )
            else:
                _, prim = intersect_pallas_streamed(
                    shared_origin, d, geometry.vertices, geometry.faces,
                    t_min=t_min, t_max=t_max, any_hit=any_hit,
                )
        elif _TILE_CULL:
            from fireflies_tpu.render.pallas.intersect_stream import (  # noqa: PLC0415
                intersect_pallas_streamed_general_culled,
            )

            _, prim = intersect_pallas_streamed_general_culled(
                o, d, geometry.vertices, geometry.faces,
                t_min=t_min, t_max=t_max, any_hit=any_hit,
            )
        else:
            _, prim = intersect_pallas_streamed_general(
                o, d, geometry.vertices, geometry.faces,
                t_min=t_min, t_max=t_max, any_hit=any_hit,
            )
        return prim >= 0
    if shared_origin is not None:
        o = jnp.broadcast_to(shared_origin, d.shape)
    return occluded(o, d, geometry, t_min, t_max, tri_chunk)


def hit_attributes(o: Array, d: Array, hit: Hit, geometry: Geometry):
    """Differentiable surface attributes for a (detached) hit.

    Recomputes t, u, v with Möller-Trumbore on the *selected* primitive so
    gradients flow to vertices and rays.  Returns dict with:
      position (N,3), normal (N,3 geometric, unit), t (N,), u, v,
      mat_id (N,), mesh_id (N,), uv (N,2 texture coords if geometry.uvs).
    Missing rays yield zeros (mask with hit.valid).
    """
    prim = jnp.maximum(hit.prim, 0)
    faces = geometry.faces[prim]  # (N, 3)
    p0 = geometry.vertices[faces[:, 0]]
    p1 = geometry.vertices[faces[:, 1]]
    p2 = geometry.vertices[faces[:, 2]]
    e1 = p1 - p0
    e2 = p2 - p0

    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    # Guard the OPERAND, not just the result: where(cond, 0, 1/det) still
    # back-propagates -ct/det^2 through the 1/det branch, which is 0/0 = NaN
    # when det == 0 exactly (ray parallel to an extension plane).
    near0 = jnp.abs(det) < _EPS_DET
    det_safe = jnp.where(near0, 1.0, det)
    inv_det = jnp.where(near0, 0.0, 1.0 / det_safe)
    tvec = o - p0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    # Miss lanes re-derive against an arbitrary (wrapped) face; a ray nearly
    # parallel to that plane yields huge u/v/t whose downstream norms go
    # inf — finite in the masked primal but 0*inf = NaN in reverse mode.
    # Pin them to the face's p0 (t=1) instead.
    u = jnp.where(hit.valid, u, 0.0)
    v = jnp.where(hit.valid, v, 0.0)
    t = jnp.where(hit.valid, t, 1.0)

    w = 1.0 - u - v
    position = w[:, None] * p0 + u[:, None] * p1 + v[:, None] * p2
    normal = jnp.cross(e1, e2)
    normal = normal / (jnp.linalg.norm(normal, axis=-1, keepdims=True) + 1e-20)

    out = {
        "position": position,
        "normal": normal,
        "t": t,
        "u": u,
        "v": v,
        "mat_id": geometry.face_mat[prim],
        "mesh_id": geometry.face_mesh[prim],
    }
    if geometry.uvs is not None:
        uv0 = geometry.uvs[faces[:, 0]]
        uv1 = geometry.uvs[faces[:, 1]]
        uv2 = geometry.uvs[faces[:, 2]]
        out["uv"] = w[:, None] * uv0 + u[:, None] * uv1 + v[:, None] * uv2
        # UV-derived tangent (orients anisotropic BSDF lobes): solve
        # [e1; e2] = [duv1; duv2] [t; b] for t.
        duv1 = uv1 - uv0
        duv2 = uv2 - uv0
        det_uv = duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0]
        uv0_ = jnp.abs(det_uv) < 1e-12
        inv = jnp.where(uv0_, 0.0, 1.0 / jnp.where(uv0_, 1.0, det_uv))
        tangent = (duv2[:, 1:2] * e1 - duv1[:, 1:2] * e2) * inv[:, None]
        out["tangent"] = tangent
    if geometry.normals is not None:
        n0 = geometry.normals[faces[:, 0]]
        n1 = geometry.normals[faces[:, 1]]
        n2 = geometry.normals[faces[:, 2]]
        nsm = w[:, None] * n0 + u[:, None] * n1 + v[:, None] * n2
        # Max-guarded radicand: zero rows otherwise NaN the cotangent.
        nn2 = jnp.sum(nsm * nsm, axis=-1, keepdims=True)
        ok = nn2[:, 0] > 1e-6
        nsm = nsm * jax.lax.rsqrt(jnp.maximum(nn2, 1e-12))
        out["smooth_normal"] = jnp.where(ok[:, None], nsm, normal)
    return out


def hit_attributes_v(o, d, hit: Hit, geometry: Geometry):
    """Component-form hit_attributes (render/vec3.py): o, d are Vec3; the
    returned dict carries Vec3 for position/normal/tangent and (N,) arrays
    otherwise.  Same math as hit_attributes; the component layout keeps the
    TPU shading chain fused (minor-dim-3 tensors materialize badly)."""
    from fireflies_tpu.render.vec3 import from_array

    prim = jnp.maximum(hit.prim, 0)
    faces = geometry.faces[prim]  # (N, 3)
    # ONE (N, 3) gather per corner, then component slices: per-component
    # gathers tripled the gather count and regressed the step 2x.
    p0 = from_array(geometry.vertices[faces[:, 0]])
    p1 = from_array(geometry.vertices[faces[:, 1]])
    p2 = from_array(geometry.vertices[faces[:, 2]])
    e1 = p1 - p0
    e2 = p2 - p0

    pvec = d.cross(e2)
    det = e1.dot(pvec)
    near0 = jnp.abs(det) < _EPS_DET
    inv_det = jnp.where(near0, 0.0, 1.0 / jnp.where(near0, 1.0, det))
    tvec = o - p0
    u = tvec.dot(pvec) * inv_det
    qvec = tvec.cross(e1)
    v = d.dot(qvec) * inv_det
    t = e2.dot(qvec) * inv_det
    # Pin miss lanes to p0 (see hit_attributes: reverse-mode 0*inf NaNs).
    u = jnp.where(hit.valid, u, 0.0)
    v = jnp.where(hit.valid, v, 0.0)
    t = jnp.where(hit.valid, t, 1.0)

    w = 1.0 - u - v
    position = p0 * w + p1 * u + p2 * v
    normal = e1.cross(e2).normalized()

    out = {
        "position": position,
        "normal": normal,
        "t": t,
        "u": u,
        "v": v,
        "mat_id": geometry.face_mat[prim],
        "mesh_id": geometry.face_mesh[prim],
    }
    if geometry.uvs is not None:
        uv0 = geometry.uvs[faces[:, 0]]
        uv1 = geometry.uvs[faces[:, 1]]
        uv2 = geometry.uvs[faces[:, 2]]
        u0x, u0y = uv0[:, 0], uv0[:, 1]
        u1x, u1y = uv1[:, 0], uv1[:, 1]
        u2x, u2y = uv2[:, 0], uv2[:, 1]
        out["uv_x"] = w * u0x + u * u1x + v * u2x
        out["uv_y"] = w * u0y + u * u1y + v * u2y
        # UV-derived tangent (orients anisotropic BSDF lobes).
        d1x, d1y = u1x - u0x, u1y - u0y
        d2x, d2y = u2x - u0x, u2y - u0y
        det_uv = d1x * d2y - d1y * d2x
        uv0_ = jnp.abs(det_uv) < 1e-12
        inv = jnp.where(uv0_, 0.0, 1.0 / jnp.where(uv0_, 1.0, det_uv))
        out["tangent"] = (e1 * d2y - e2 * d1y) * inv
    if geometry.normals is not None:
        n0 = from_array(geometry.normals[faces[:, 0]])
        n1 = from_array(geometry.normals[faces[:, 1]])
        n2 = from_array(geometry.normals[faces[:, 2]])
        out["smooth_normal"] = _interp_smooth_normal(
            n0, n1 - n0, n2 - n0, u, v, normal
        )
    return out


def build_face_table(geometry: Geometry) -> Array:
    """Per-face shading data packed into ONE (F, D) row table.

    TPU gathers cost ~per-row regardless of row width (measured ~23 ms per
    4M-row gather on v5e) — hit_attributes' separate faces/vertex/uv
    gathers dominated the whole shading pass.  Packing every per-face
    quantity into one row turns 4-6 big gathers per bounce into one.

    Layout (D = 17): p0 (3), e1 (3), e2 (3), uv0 (2), duv1 (2), duv2 (2),
    mat_id (1), mesh_id (1).  With geometry.normals, 9 more columns:
    n0 (3), dn1 (3), dn2 (3) for smooth shading (D = 26 — widening is
    ~free, the gather cost is per-row).  Differentiable w.r.t. vertices
    (built from tiny F-row gathers); uv columns are zero when the mesh has
    no UVs.
    """
    v0 = geometry.vertices[geometry.faces[:, 0]]
    v1 = geometry.vertices[geometry.faces[:, 1]]
    v2 = geometry.vertices[geometry.faces[:, 2]]
    cols = [v0, v1 - v0, v2 - v0]
    if geometry.uvs is not None:
        uv0 = geometry.uvs[geometry.faces[:, 0]]
        uv1 = geometry.uvs[geometry.faces[:, 1]]
        uv2 = geometry.uvs[geometry.faces[:, 2]]
        cols += [uv0, uv1 - uv0, uv2 - uv0]
    else:
        zeros2 = jnp.zeros((geometry.faces.shape[0], 2), jnp.float32)
        cols += [zeros2, zeros2, zeros2]
    cols += [
        geometry.face_mat[:, None].astype(jnp.float32),
        geometry.face_mesh[:, None].astype(jnp.float32),
    ]
    if geometry.normals is not None:
        n0 = geometry.normals[geometry.faces[:, 0]]
        n1 = geometry.normals[geometry.faces[:, 1]]
        n2 = geometry.normals[geometry.faces[:, 2]]
        cols += [n0, n1 - n0, n2 - n0]
    return jnp.concatenate(cols, axis=1)  # (F, 17) or (F, 26)


def hit_attributes_table(
    o, d, hit: Hit, face_table: Array, has_uvs: bool, has_normals: bool = False
):
    """Component-form hit attributes from ONE face-table gather.

    o, d: Vec3; returns the same dict as hit_attributes_v.  See
    build_face_table for why this exists (TPU gather cost).
    """
    from fireflies_tpu.render.vec3 import Vec3

    prim = jnp.maximum(hit.prim, 0)
    row = face_table[prim]  # (N, 17) — the one big gather
    p0 = Vec3(row[:, 0], row[:, 1], row[:, 2])
    e1 = Vec3(row[:, 3], row[:, 4], row[:, 5])
    e2 = Vec3(row[:, 6], row[:, 7], row[:, 8])

    pvec = d.cross(e2)
    det = e1.dot(pvec)
    near0 = jnp.abs(det) < _EPS_DET
    inv_det = jnp.where(near0, 0.0, 1.0 / jnp.where(near0, 1.0, det))
    tvec = o - p0
    u = tvec.dot(pvec) * inv_det
    qvec = tvec.cross(e1)
    v = d.dot(qvec) * inv_det
    t = e2.dot(qvec) * inv_det
    # Pin miss lanes to p0 (see hit_attributes: reverse-mode 0*inf NaNs).
    u = jnp.where(hit.valid, u, 0.0)
    v = jnp.where(hit.valid, v, 0.0)
    t = jnp.where(hit.valid, t, 1.0)

    position = p0 + e1 * u + e2 * v
    normal = e1.cross(e2).normalized()

    out = {
        "position": position,
        "normal": normal,
        "t": t,
        "u": u,
        "v": v,
        "mat_id": row[:, 15].astype(jnp.int32),
        "mesh_id": row[:, 16].astype(jnp.int32),
    }
    if has_uvs:
        u0x, u0y = row[:, 9], row[:, 10]
        d1x, d1y = row[:, 11], row[:, 12]
        d2x, d2y = row[:, 13], row[:, 14]
        out["uv_x"] = u0x + u * d1x + v * d2x
        out["uv_y"] = u0y + u * d1y + v * d2y
        det_uv = d1x * d2y - d1y * d2x
        uv0_ = jnp.abs(det_uv) < 1e-12
        inv = jnp.where(uv0_, 0.0, 1.0 / jnp.where(uv0_, 1.0, det_uv))
        out["tangent"] = (e1 * d2y - e2 * d1y) * inv
    if has_normals:
        out["smooth_normal"] = _interp_smooth_normal(
            Vec3(row[:, 17], row[:, 18], row[:, 19]),
            Vec3(row[:, 20], row[:, 21], row[:, 22]),
            Vec3(row[:, 23], row[:, 24], row[:, 25]),
            u, v, normal,
        )
    return out


def _interp_smooth_normal(n0, dn1, dn2, u, v, geometric):
    """Phong-interpolated unit shading normal n0 + u*dn1 + v*dn2.

    Falls back to the geometric normal where the interpolation is
    (near-)zero: all-zero rows mark flat-shaded meshes (Geometry.normals),
    and unit corner normals can only cancel across a >120-degree fold.
    """
    from fireflies_tpu.render import vec3 as v3m

    nsm = n0 + dn1 * u + dn2 * v
    # Max-guarded radicand (not sqrt-then-max): zero-interp rows otherwise
    # NaN the cotangent through the norm's VJP.
    nn2 = nsm.norm2()
    ok = nn2 > 1e-6
    nsm = nsm * jax.lax.rsqrt(jnp.maximum(nn2, 1e-12))
    return v3m.where(ok, nsm, geometric)

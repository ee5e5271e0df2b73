"""Pallas TPU ray/triangle intersection kernels.

The fused hot path replacing the pure-JAX scan in
fireflies_tpu.render.intersect (which remains the reference/CPU
implementation; both are cross-checked in tests).

Design (see pallas_guide.md):
  * Rays are SoA (6, R/128, 128) f32 — every vector op runs on full
    (16, 128) tiles, no wasted lanes (an (N, 3) layout would use 3/128).
  * Triangles are SoA (9, Tpad) resident in VMEM, consecutive faces grouped
    into CHUNK-sized clusters with precomputed AABBs (6, NC).  Faces are
    Morton-ordered at bridge build (static topology), so clusters are
    spatially tight and cluster AABBs act as a flat one-level BVH.
  * Grid over ray tiles (2048 rays each).  Per cluster: a vectorized slab
    test against the whole tile; `lax.cond` skips the 64-triangle
    Möller-Trumbore block when no ray in the tile can hit the cluster
    closer than its current best — this is where coherent rays win big.
  * Best (t, prim) carried in registers; barycentrics are re-derived
    differentiably outside (detached-traversal design, intersect.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

RAY_TILE = 2048  # rays per grid program
LANES = 128
SUBLANES = RAY_TILE // LANES  # 16
import os as _os
CHUNK = int(_os.environ.get("FF_TRI_CLUSTER", 64))  # triangles per AABB cluster

_BIG = 3.0e38  # python float: jnp scalars would be captured consts in the kernel
_EPS_DET = 1e-9
_EPS_BARY = 1e-6


# ---------------------------------------------------------------------------
# Packing
# ---------------------------------------------------------------------------


def morton_order(centroids) -> "jnp.ndarray":
    """Face ordering along a 3D Morton curve (host-side, rest pose)."""
    import numpy as np

    c = np.asarray(centroids, np.float64)
    lo = c.min(axis=0)
    span = np.maximum(c.max(axis=0) - lo, 1e-12)
    q = np.clip(((c - lo) / span * 1023.0).astype(np.uint64), 0, 1023)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    code = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    return np.argsort(code, kind="stable")


def pack_triangles(vertices: Array, faces: Array, chunk: int = CHUNK):
    """Build the kernel's triangle SoA + cluster AABBs from (possibly
    randomized) world-space vertices.  Pure JAX — runs inside the render jit
    every variant (vertices change, topology doesn't).

    Returns (tri (9, Tpad), boxes (6, NC)).
    """
    v0 = vertices[faces[:, 0]]
    v1 = vertices[faces[:, 1]]
    v2 = vertices[faces[:, 2]]
    e1 = v1 - v0
    e2 = v2 - v0
    f = v0.shape[0]
    n_chunks = -(-f // chunk)
    pad = n_chunks * chunk - f

    tri = jnp.concatenate([v0, e1, e2], axis=1).T  # (9, F)
    if pad:
        tri = jnp.pad(tri, ((0, 0), (0, pad)))

    fmin = jnp.minimum(jnp.minimum(v0, v1), v2)
    fmax = jnp.maximum(jnp.maximum(v0, v1), v2)
    if pad:
        fmin = jnp.concatenate([fmin, jnp.full((pad, 3), _BIG)], axis=0)
        fmax = jnp.concatenate([fmax, jnp.full((pad, 3), -_BIG)], axis=0)
    cmin = jnp.min(fmin.reshape(n_chunks, chunk, 3), axis=1)
    cmax = jnp.max(fmax.reshape(n_chunks, chunk, 3), axis=1)
    boxes = jnp.concatenate([cmin, cmax], axis=1).T  # (6, NC)
    return tri, boxes


def pack_rays(o: Array, d: Array, t_max) -> tuple[Array, Array, int]:
    """(N, 3) rays -> ((6, R/128, 128) SoA, (R/128, 128) tmax, N)."""
    n = o.shape[0]
    r = -(-n // RAY_TILE) * RAY_TILE
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if r != n:
        o = jnp.concatenate([o, jnp.zeros((r - n, 3), jnp.float32)])
        d = jnp.concatenate([d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (r - n, 1))])
        t_max = jnp.concatenate([t_max, jnp.full((r - n,), -1.0, jnp.float32)])
    soa = jnp.concatenate([o.T, d.T], axis=0)  # (6, R)
    return soa.reshape(6, r // LANES, LANES), t_max.reshape(r // LANES, LANES), n


def pack_triangles_woop(vertices: Array, faces: Array, origin: Array, chunk: int = None):
    """Woop-style precompute for *shared-origin* ray batches.

    For each triangle build the affine map into its unit-triangle frame:
    with n = e1 x e2 and det = |n|^2, the inverse of [e1 e2 n] has rows
    W0 = (e2 x n)/det, W1 = (n x e1)/det, W2 = n/det.  For a ray o + t d with
    o shared across the batch, o' = W (o - v0) is a per-triangle constant, so
    the kernel only computes d' = W d per (ray, tri) pair:
        t = -o'_z / d'_z,  u = o'_x + t d'_x,  v = o'_y + t d'_y.
    ~1.5x fewer vector ops than general Möller-Trumbore.  Camera-primary rays
    share the camera origin; shadow rays reversed (light -> surface) share
    each light's origin.

    Returns (woop (12, Tpad), boxes (6, NC) *shifted by -origin*).
    """
    chunk = chunk or CHUNK
    v0 = vertices[faces[:, 0]]
    v1 = vertices[faces[:, 1]]
    v2 = vertices[faces[:, 2]]
    e1 = v1 - v0
    e2 = v2 - v0
    n = jnp.cross(e1, e2)
    det = jnp.sum(n * n, axis=-1, keepdims=True)
    safe_det = jnp.where(det < 1e-18, 1.0, det)
    zero_mask = det < 1e-18
    w0 = jnp.where(zero_mask, 0.0, jnp.cross(e2, n) / safe_det)
    w1 = jnp.where(zero_mask, 0.0, jnp.cross(n, e1) / safe_det)
    w2 = jnp.where(zero_mask, 0.0, n / safe_det)
    rel = origin[None, :] - v0
    op = jnp.stack(
        [jnp.sum(w0 * rel, -1), jnp.sum(w1 * rel, -1), jnp.sum(w2 * rel, -1)], axis=-1
    )

    f = v0.shape[0]
    n_chunks = -(-f // chunk)
    pad = n_chunks * chunk - f
    woop = jnp.concatenate([w0, w1, w2, op], axis=1).T  # (12, F)
    if pad:
        woop = jnp.pad(woop, ((0, 0), (0, pad)))

    fmin = jnp.minimum(jnp.minimum(v0, v1), v2) - origin[None, :]
    fmax = jnp.maximum(jnp.maximum(v0, v1), v2) - origin[None, :]
    if pad:
        fmin = jnp.concatenate([fmin, jnp.full((pad, 3), _BIG)], axis=0)
        fmax = jnp.concatenate([fmax, jnp.full((pad, 3), -_BIG)], axis=0)
    cmin = jnp.min(fmin.reshape(n_chunks, chunk, 3), axis=1)
    cmax = jnp.max(fmax.reshape(n_chunks, chunk, 3), axis=1)
    boxes = jnp.concatenate([cmin, cmax], axis=1).T
    return woop, boxes


def pack_dirs(d: Array, t_max, ray_tile: int = RAY_TILE) -> tuple[Array, Array, int]:
    """(N, 3) directions -> ((3, R/128, 128) SoA, (R/128, 128) tmax, N)."""
    n = d.shape[0]
    r = -(-n // ray_tile) * ray_tile
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if r != n:
        d = jnp.concatenate([d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (r - n, 1))])
        t_max = jnp.concatenate([t_max, jnp.full((r - n,), -1.0, jnp.float32)])
    return d.T.reshape(3, r // LANES, LANES), t_max.reshape(r // LANES, LANES), n


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _kernel(rays_ref, tmax_ref, tri_ref, box_ref, out_t_ref, out_prim_ref, *, t_min, n_chunks, any_hit, chunk=CHUNK, unroll=None):
    ox, oy, oz = rays_ref[0], rays_ref[1], rays_ref[2]  # (16, 128)
    dx, dy, dz = rays_ref[3], rays_ref[4], rays_ref[5]
    tmax = tmax_ref[...]

    def safe_inv(x):
        tiny = jnp.abs(x) < 1e-30
        sign = jnp.where(x < 0, -1.0, 1.0)
        return jnp.where(tiny, sign * 1e30, 1.0 / jnp.where(tiny, 1.0, x))

    inv_dx = safe_inv(dx)
    inv_dy = safe_inv(dy)
    inv_dz = safe_inv(dz)

    # Best hit carried as a RATIONAL (tn, dn) with dn = |det| > 0: the MT
    # test needs t = (e2.q)/det only for comparisons, and every comparison
    # cross-multiplies instead — no per-(ray, triangle) division (the VPU
    # divide is many-cycle).  One real division per chunk for the slab clip
    # and one at the end.  Cf. _kernel_shared.
    best_tn0 = jnp.full((SUBLANES, LANES), _BIG, jnp.float32)
    best_dn0 = jnp.ones((SUBLANES, LANES), jnp.float32)
    best_p0 = jnp.full((SUBLANES, LANES), -1, jnp.int32)

    def chunk_body(c, carry):
        best_tn, best_dn, best_p = carry
        best_t = best_tn / best_dn  # one div per (chunk, tile) for the slab
        bx0 = box_ref[0, c]
        by0 = box_ref[1, c]
        bz0 = box_ref[2, c]
        bx1 = box_ref[3, c]
        by1 = box_ref[4, c]
        bz1 = box_ref[5, c]

        t0x = (bx0 - ox) * inv_dx
        t1x = (bx1 - ox) * inv_dx
        t0y = (by0 - oy) * inv_dy
        t1y = (by1 - oy) * inv_dy
        t0z = (bz0 - oz) * inv_dz
        t1z = (bz1 - oz) * inv_dz
        tnear = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), t_min),
        )
        tfar = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.minimum(jnp.maximum(t0z, t1z), jnp.minimum(tmax, best_t)),
        )
        tile_hits = jnp.any(tnear <= tfar)

        def process(carry):
            def tri_body(j, carry2):
                btn, bdn, bp = carry2
                idx = c * chunk + j
                v0x = tri_ref[0, idx]
                v0y = tri_ref[1, idx]
                v0z = tri_ref[2, idx]
                e1x = tri_ref[3, idx]
                e1y = tri_ref[4, idx]
                e1z = tri_ref[5, idx]
                e2x = tri_ref[6, idx]
                e2y = tri_ref[7, idx]
                e2z = tri_ref[8, idx]

                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz

                tx = ox - v0x
                ty = oy - v0y
                tz = oz - v0z
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x

                if _os.environ.get("FF_MT_DIV"):  # perf-bisection knob
                    inv_det = jnp.where(jnp.abs(det) < _EPS_DET, 0.0, 1.0 / det)
                    u = (tx * px + ty * py + tz * pz) * inv_det
                    v = (dx * qx + dy * qy + dz * qz) * inv_det
                    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                    ok = (
                        (jnp.abs(det) >= _EPS_DET)
                        & (u >= -_EPS_BARY)
                        & (v >= -_EPS_BARY)
                        & (u + v <= 1.0 + _EPS_BARY)
                        & (t > t_min)
                        & (t < tmax)
                        & (t * bdn < btn)
                    )
                    btn = jnp.where(ok, t, btn)
                    bp = jnp.where(ok, idx, bp)
                    return btn, bdn, bp

                sgn = jnp.where(det >= 0.0, 1.0, -1.0)
                dn = det * sgn  # |det|
                un = (tx * px + ty * py + tz * pz) * sgn
                vn = (dx * qx + dy * qy + dz * qz) * sgn
                tn = (e2x * qx + e2y * qy + e2z * qz) * sgn

                eb = _EPS_BARY * dn
                ok = (
                    (dn >= _EPS_DET)
                    & (un >= -eb)
                    & (vn >= -eb)
                    & (un + vn <= dn + eb)
                    & (tn > t_min * dn)
                    & (tn < tmax * dn)
                    & (tn * bdn < btn * dn)
                )
                btn = jnp.where(ok, tn, btn)
                bdn = jnp.where(ok, dn, bdn)
                bp = jnp.where(ok, idx, bp)
                return btn, bdn, bp

            unroll_ = unroll or int(_os.environ.get("FF_TRI_UNROLL", 4))

            def unrolled(jj, carry2):
                for k in range(unroll_):
                    carry2 = tri_body(jj * unroll_ + k, carry2)
                return carry2

            return jax.lax.fori_loop(0, chunk // unroll_, unrolled, carry)

        return jax.lax.cond(
            tile_hits, process, lambda x: x, (best_tn, best_dn, best_p)
        )

    # Rays with tmax < 0 are dead (retired paths / padding): they can never
    # register a hit, so they count as done for early exits, and an all-dead
    # tile skips the cluster loop outright (bounce passes after paths escape).
    dead = tmax < 0.0

    def all_done(carry):
        # Any-hit early out: once every ray in the tile is blocked (or dead),
        # stop.
        _, _, best_p = carry
        return jnp.all((best_p >= 0) | dead)

    if any_hit:
        def while_body(carry):
            c, state = carry
            return c + 1, chunk_body(c, state)

        def while_cond(carry):
            c, state = carry
            return (c < n_chunks) & ~all_done(state)

        _, (best_tn, best_dn, best_p) = jax.lax.while_loop(
            while_cond, while_body, (0, (best_tn0, best_dn0, best_p0))
        )
    else:
        n_eff = jnp.where(jnp.all(dead), 0, n_chunks)
        best_tn, best_dn, best_p = jax.lax.fori_loop(
            0, n_eff, chunk_body, (best_tn0, best_dn0, best_p0)
        )

    out_t_ref[...] = jnp.where(best_p >= 0, best_tn / best_dn, 0.0)
    out_prim_ref[...] = best_p


def _kernel_shared(
    dirs_ref, tmax_ref, woop_ref, box_ref, order_ref, out_t_ref, out_prim_ref, *, t_min, n_chunks, any_hit, chunk=CHUNK, unroll=None, mode=None, sublanes=SUBLANES,
):
    """Shared-origin variant: boxes pre-shifted so the origin is 0."""
    dx, dy, dz = dirs_ref[0], dirs_ref[1], dirs_ref[2]  # (16, 128)
    tmax = tmax_ref[...]

    def safe_inv(x):
        tiny = jnp.abs(x) < 1e-30
        sign = jnp.where(x < 0, -1.0, 1.0)
        return jnp.where(tiny, sign * 1e30, 1.0 / jnp.where(tiny, 1.0, x))

    inv_dx = safe_inv(dx)
    inv_dy = safe_inv(dy)
    inv_dz = safe_inv(dz)

    # Best hit carried as a RATIONAL (tn, dn) with dn > 0: the per-triangle
    # Woop test needs t = -o'_z / d'_z only for comparisons, and every
    # comparison cross-multiplies instead — no per-triangle division (the
    # VPU divide is many-cycle).  One real division at the end.
    best_tn0 = jnp.full((sublanes, LANES), _BIG, jnp.float32)
    best_dn0 = jnp.ones((sublanes, LANES), jnp.float32)
    best_p0 = jnp.full((sublanes, LANES), -1, jnp.int32)

    def chunk_body(ci, carry):
        # FRONT-TO-BACK traversal: clusters are visited in order of distance
        # from the shared origin, so once a tile's rays have nearby hits the
        # best_t clip in tfar prunes every farther cluster outright.
        c = order_ref[0, ci]
        best_tn, best_dn, best_p = carry
        best_t = best_tn / best_dn  # one div per (cluster, tile) for the slab
        t0x = box_ref[0, c] * inv_dx
        t1x = box_ref[3, c] * inv_dx
        t0y = box_ref[1, c] * inv_dy
        t1y = box_ref[4, c] * inv_dy
        t0z = box_ref[2, c] * inv_dz
        t1z = box_ref[5, c] * inv_dz
        tnear = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), t_min),
        )
        tfar = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.minimum(jnp.maximum(t0z, t1z), jnp.minimum(tmax, best_t)),
        )
        tile_hits = jnp.any(tnear <= tfar)

        def process(carry):
            def tri_body(j, carry2):
                btn, bdn, bp = carry2
                idx = c * chunk + j
                w00 = woop_ref[0, idx]
                w01 = woop_ref[1, idx]
                w02 = woop_ref[2, idx]
                w10 = woop_ref[3, idx]
                w11 = woop_ref[4, idx]
                w12 = woop_ref[5, idx]
                w20 = woop_ref[6, idx]
                w21 = woop_ref[7, idx]
                w22 = woop_ref[8, idx]
                opx = woop_ref[9, idx]
                opy = woop_ref[10, idx]
                opz = woop_ref[11, idx]

                dpx = w00 * dx + w01 * dy + w02 * dz
                dpy = w10 * dx + w11 * dy + w12 * dz
                dpz = w20 * dx + w21 * dy + w22 * dz

                # Division-free: t = tn / dn with dn = |dpz| > 0 and
                # tn = -opz * sign(dpz); every t-comparison and the u/v
                # in-triangle tests cross-multiply by dn instead.
                sgn = jnp.where(dpz >= 0.0, 1.0, -1.0)
                dn = dpz * sgn
                tn = -opz * sgn
                # u = opx + (tn/dn) dpx  =>  u*dn = opx*dn + tn*dpx
                u_n = opx * dn + tn * dpx
                v_n = opy * dn + tn * dpy
                ok = (
                    (dn > 1e-12)
                    & (u_n >= -_EPS_BARY * dn)
                    & (v_n >= -_EPS_BARY * dn)
                    & (u_n + v_n <= (1.0 + _EPS_BARY) * dn)
                    & (tn > t_min * dn)
                    & (tn < tmax * dn)
                    & (tn * bdn < btn * dn)
                )
                btn = jnp.where(ok, tn, btn)
                bdn = jnp.where(ok, dn, bdn)
                bp = jnp.where(ok, idx, bp)
                return btn, bdn, bp

            unroll_ = unroll or int(_os.environ.get("FF_TRI_UNROLL", 4))

            def unrolled(jj, carry2):
                for k in range(unroll_):
                    carry2 = tri_body(jj * unroll_ + k, carry2)
                return carry2

            return jax.lax.fori_loop(0, chunk // unroll_, unrolled, carry)

        mode_ = mode or _os.environ.get("FF_KERNEL_MODE", "full")  # debug bisection knob
        if mode_ == "slab":
            return (best_tn + tnear * 0.0, best_dn, best_p)
        if mode_ == "noprune":
            return process((best_tn, best_dn, best_p))
        return jax.lax.cond(
            tile_hits, process, lambda x: x, (best_tn, best_dn, best_p)
        )

    # Dead rays (tmax < 0) count as done; all-dead tiles skip the loop.
    dead = tmax < 0.0
    if any_hit:
        def while_body(carry):
            c, state = carry
            return c + 1, chunk_body(c, state)

        def while_cond(carry):
            c, state = carry
            return (c < n_chunks) & ~jnp.all((state[2] >= 0) | dead)

        _, (best_tn, best_dn, best_p) = jax.lax.while_loop(
            while_cond, while_body, (0, (best_tn0, best_dn0, best_p0))
        )
    else:
        n_eff = jnp.where(jnp.all(dead), 0, n_chunks)
        best_tn, best_dn, best_p = jax.lax.fori_loop(
            0, n_eff, chunk_body, (best_tn0, best_dn0, best_p0)
        )

    out_t_ref[...] = jnp.where(best_p >= 0, best_tn / best_dn, 0.0)
    out_prim_ref[...] = best_p


@functools.partial(jax.jit, static_argnames=("t_min", "any_hit", "interpret", "chunk", "unroll", "mode", "sublanes"))
def _intersect_shared_packed(
    dirs_soa: Array,
    tmax_tiles: Array,
    woop: Array,
    boxes: Array,
    t_min: float,
    any_hit: bool,
    interpret: bool,
    chunk: int = CHUNK,
    unroll: int | None = None,
    mode: str | None = None,
    sublanes: int = SUBLANES,
):
    n_rows = dirs_soa.shape[1]
    n_tiles = n_rows // sublanes
    n_chunks = boxes.shape[1]
    kernel = functools.partial(
        _kernel_shared, t_min=t_min, n_chunks=n_chunks, any_hit=any_hit,
        chunk=chunk, unroll=unroll, mode=mode, sublanes=sublanes,
    )
    center = 0.5 * (boxes[:3] + boxes[3:])  # origin-relative (shared path)
    # (1, NC): a 1-D SMEM operand's auto-batched block under vmap violates
    # Mosaic's last-two-dims rule; with a leading unit dim the block equals
    # the full array shape.
    order = jnp.argsort(jnp.sum(center * center, axis=0)).astype(jnp.int32)[None, :]
    out_t, out_prim = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((3, sublanes, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((sublanes, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(woop.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(boxes.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((sublanes, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((sublanes, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(dirs_soa, tmax_tiles, woop, boxes, order)
    return out_t, out_prim


def intersect_pallas_shared(
    origin: Array,
    d: Array,
    vertices: Array,
    faces: Array,
    t_min: float = 1e-4,
    t_max: Array | float = 1e30,
    any_hit: bool = False,
    interpret: bool = False,
    chunk: int | None = None,
    unroll: int | None = None,
    mode: str | None = None,
    ray_tile: int | None = None,
):
    """Shared-origin closest/any-hit: origin (3,), d (N, 3) (t in units |d|)."""
    chunk = chunk or CHUNK
    ray_tile = ray_tile or RAY_TILE
    woop, boxes = pack_triangles_woop(vertices, faces, origin, chunk=chunk)
    dirs_soa, tmax_tiles, n = pack_dirs(d, t_max, ray_tile=ray_tile)
    out_t, out_prim = _intersect_shared_packed(
        jax.lax.stop_gradient(dirs_soa),
        jax.lax.stop_gradient(tmax_tiles),
        jax.lax.stop_gradient(woop),
        jax.lax.stop_gradient(boxes),
        t_min,
        any_hit,
        interpret,
        chunk=chunk,
        unroll=unroll,
        mode=mode,
        sublanes=ray_tile // LANES,
    )
    return out_t.reshape(-1)[:n], out_prim.reshape(-1)[:n]


@functools.partial(jax.jit, static_argnames=("t_min", "any_hit", "interpret", "chunk", "unroll"))
def _intersect_packed(
    rays_soa: Array,
    tmax_tiles: Array,
    tri: Array,
    boxes: Array,
    t_min: float,
    any_hit: bool,
    interpret: bool,
    chunk: int = CHUNK,
    unroll: int | None = None,
):
    n_rows = rays_soa.shape[1]  # R / 128
    n_tiles = n_rows // SUBLANES
    n_chunks = boxes.shape[1]

    kernel = functools.partial(
        _kernel, t_min=t_min, n_chunks=n_chunks, any_hit=any_hit,
        chunk=chunk, unroll=unroll,
    )
    out_t, out_prim = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((6, SUBLANES, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            # Per-triangle/per-cluster values are consumed as *scalars*
            # broadcast against ray tiles — scalar dynamic indexing is an
            # SMEM affordance (VMEM lane indexing must be 128-aligned).
            pl.BlockSpec(tri.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(boxes.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(rays_soa, tmax_tiles, tri, boxes)
    return out_t, out_prim


def intersect_pallas(
    o: Array,
    d: Array,
    vertices: Array,
    faces: Array,
    t_min: float = 1e-4,
    t_max: Array | float = 1e30,
    any_hit: bool = False,
    interpret: bool = False,
    chunk: int | None = None,
    unroll: int | None = None,
):
    """Closest-hit (or any-hit) query; returns (t (N,), prim (N,) int32).

    Traversal is non-differentiable by construction (integer output +
    detached t); differentiable attributes come from
    intersect.hit_attributes.
    """
    chunk = chunk or CHUNK
    tri, boxes = pack_triangles(vertices, faces, chunk=chunk)
    rays_soa, tmax_tiles, n = pack_rays(o, d, t_max)
    out_t, out_prim = _intersect_packed(
        jax.lax.stop_gradient(rays_soa),
        jax.lax.stop_gradient(tmax_tiles),
        jax.lax.stop_gradient(tri),
        jax.lax.stop_gradient(boxes),
        t_min,
        any_hit,
        interpret,
        chunk=chunk,
        unroll=unroll,
    )
    return out_t.reshape(-1)[:n], out_prim.reshape(-1)[:n]

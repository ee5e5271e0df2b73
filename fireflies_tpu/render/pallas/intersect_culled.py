"""Tile-culled shared-origin intersection kernels.

The baseline kernels (intersect_kernel.py / intersect_stream.py) visit every
triangle cluster from every 2048-ray tile, relying on an in-kernel slab test
+ `lax.cond` to skip the triangle loop.  Measured on v5e that leaves per-tile
work essentially LINEAR in scene size (CLAUDE.md r2 notes): most clusters of
a compact mesh overlap most tiles' frusta in angle, and the serial
slab-scan itself costs ~20 VPU issues per cluster per tile.

This variant hoists the pruning OUT of the kernel into one vectorized XLA
pass over (tiles x clusters):

  1. per ray tile, the direction AABB [dmin, dmax] (16x128 rays reduce);
  2. a conservative interval-arithmetic slab test: does ANY ray t*d with
     d in the tile's direction box hit the cluster AABB (origin at 0)?
  3. passing clusters are compacted into a per-tile list sorted
     front-to-back by cluster centroid distance, plus a per-tile count.

The kernel then runs a data-dependent `lax.while_loop` over ONLY the listed
clusters (count varies per tile), keeping the per-cluster slab test for its
best-t clip.  Work becomes proportional to the geometry actually visible
from each tile.

Shared-origin only (camera-primary and reversed shadow batches — the
coherent passes where a tile's direction box is narrow).  The general
(bounce) pass keeps the baseline kernel: BSDF-sampled directions span the
sphere, so a direction box culls nothing.

Replaces Mitsuba's BVH traversal for these passes (reference
fireflies/graphics/depth.py:77 `scene.ray_intersect`); redesigned rather
than ported — a per-ray divergent BVH walk does not map to the VPU.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fireflies_tpu.render.pallas.intersect_kernel import (
    _BIG,
    _EPS_BARY,
    LANES,
    RAY_TILE,
    SUBLANES,
    pack_dirs,
    pack_triangles_woop,
)

Array = jax.Array

_INF = 3.0e38


def _cull_subtiles() -> tuple[int, int]:
    """Sub-tile split (sublane_groups, lane_groups) for list building.

    One interval box per 2048-ray tile is loose: it admits phantom
    (origin-from-ray-A, direction-from-ray-B) combinations, which for
    coherent bounce tiles (direction correlated with position) lists far
    more clusters than any actual ray can hit.  Splitting the tile into
    sub-groups, testing each sub-box independently, and OR-ing the results
    is still conservative (every ray lies in exactly one sub-group) but
    strictly tighter.  "SxL" splits the 16 sublanes into S groups (pixel-row
    strips) and the 128 lanes into L groups (pixel-column bands); with the
    128x16 pixel tiles a 2x2 split tests four 64x8-pixel quadrants.

    Default 1x1 (OFF) — MEASURED WASH at the reference workload shape
    (r5, same tunnel window, 11.5k faces spp4 coherent static): 1x1
    8.21/s, 2x2 8.12, 4x4 8.13, 2x8 8.05 renders/s/chip, even though the
    lists DO tighten (mean listed clusters 291 -> 245 (2x2) -> 222 (4x4)
    of 722 on the measured bounce load).  The culled clusters are exactly
    the ones the kernel's in-tile slab test already skips without running
    their triangle loops, so tightening the list removes only
    already-cheap work.  Kept as a knob for workloads with genuinely
    divergent tiles (the subset/exactness tests pin the mechanism).
    """
    spec = _os.environ.get("FF_CULL_SUBTILES", "1x1")
    parts = spec.split("x")
    try:
        ss, ls = (int(v) for v in parts)
    except (TypeError, ValueError):
        raise ValueError(
            f"FF_CULL_SUBTILES must be 'SxL' with integer S, L; got {spec!r}"
        ) from None
    if ss < 1 or ls < 1 or SUBLANES % ss or LANES % ls:
        raise ValueError(
            f"FF_CULL_SUBTILES={spec!r}: S must divide {SUBLANES} and "
            f"L must divide {LANES}"
        )
    return ss, ls


def _subgroup_minmax(x_tiles: Array, alive: Array | None, ss: int, ls: int):
    """Per-subgroup min/max over a (C, T, SUBLANES, LANES) tile tensor.

    Returns (lo, hi) of shape (C, T, G) with G = ss*ls, plus the per-group
    alive mask (T, G) (None when `alive` is None).  Dead rays (alive False)
    are excluded; a group with no alive rays gets lo=+INF / hi=-INF and
    alive False.
    """
    c, t = x_tiles.shape[0], x_tiles.shape[1]
    g = x_tiles.reshape(c, t, ss, SUBLANES // ss, ls, LANES // ls)
    if alive is not None:
        a = alive.reshape(1, t, ss, SUBLANES // ss, ls, LANES // ls)
        lo = jnp.min(jnp.where(a, g, _INF), axis=(3, 5))
        hi = jnp.max(jnp.where(a, g, -_INF), axis=(3, 5))
        galive = jnp.any(a, axis=(0, 3, 5)).reshape(t, ss * ls)
    else:
        lo = jnp.min(g, axis=(3, 5))
        hi = jnp.max(g, axis=(3, 5))
        galive = None
    return lo.reshape(c, t, ss * ls), hi.reshape(c, t, ss * ls), galive


def _safe_div(a, b):
    return a / jnp.where(jnp.abs(b) < 1e-30, jnp.where(b < 0, -1e-30, 1e-30), b)


def _interval_slab_hit(dl, dh, bl, bh, t_min: float) -> Array:
    """Conservative interval slab test, broadcast over trailing dims.

    dl/dh: (3, T, G, 1) direction interval; bl/bh: (3, T-or-1, G-or-1, NC)
    target box (origin-shifted).  Returns hit (T, G, NC): does ANY t > t_min
    with d in [dl, dh] satisfy t*d in [bl, bh] on all three axes?
    """
    lo = jnp.full(jnp.broadcast_shapes(dl.shape, bl.shape), t_min)
    hi = jnp.full(lo.shape, _INF)
    # c1: t*dl <= bh
    lo = jnp.where(dl < 0, jnp.maximum(lo, _safe_div(bh, dl)), lo)
    hi = jnp.where(dl > 0, jnp.minimum(hi, _safe_div(bh, dl)), hi)
    empty = (dl == 0) & (bh < 0)
    # c2: t*dh >= bl
    lo = jnp.where(dh > 0, jnp.maximum(lo, _safe_div(bl, dh)), lo)
    hi = jnp.where(dh < 0, jnp.minimum(hi, _safe_div(bl, dh)), hi)
    empty = empty | ((dh == 0) & (bl > 0))
    return (jnp.max(lo, axis=0) <= jnp.min(hi, axis=0)) & ~jnp.any(
        empty, axis=0
    )


def tile_cluster_lists(
    dirs_soa: Array, boxes: Array, t_min: float = 0.0,
    tmax_tiles: Array | None = None,
) -> tuple[Array, Array]:
    """Conservative per-tile cluster culling (shared origin at 0).

    dirs_soa: (3, R/128, 128) ray directions in tile-major order;
    boxes: (6, NC) cluster AABBs, origin-shifted (min xyz rows 0-2, max 3-5).

    Returns (lists (T, NC) int32, counts (T, 1) int32): for tile i,
    lists[i, :counts[i, 0]] are the clusters that MAY be hit, sorted
    front-to-back by centroid distance.  The test is conservative: it uses
    the tile's direction bounding box, so false positives are possible,
    false negatives are not.

    With `tmax_tiles` ((R/128, 128), kernel dead-ray convention: tmax < 0
    means the ray is masked off / padding), dead rays are excluded from the
    tile's direction box and all-dead tiles get count 0 — NEE gating then
    empties every tile outside a projector's cone before the kernel runs.

    FF_CULL_SUBTILES="SxL" (default 1x1 = off; see _cull_subtiles for the
    measured wash) splits the tile into sub-groups, each tested with its
    own direction box, OR-ed — strictly tighter, still conservative.
    """
    n_rows = dirs_soa.shape[1]
    t = n_rows // SUBLANES
    ss, ls = _cull_subtiles()
    d_tiles = dirs_soa.reshape(3, t, SUBLANES, LANES)
    alive = (
        (tmax_tiles >= 0.0).reshape(1, t, SUBLANES, LANES)
        if tmax_tiles is not None else None
    )
    dl, dh, galive = _subgroup_minmax(d_tiles, alive, ss, ls)  # (3, T, G)

    # Interval slab test per (tile, group, cluster, axis), all conservative.
    # U_a = {t > 0 : t*dl <= bh  AND  t*dh >= bl}   (see module docstring)
    bl = boxes[0:3, None, None, :]  # (3, 1, 1, NC)
    bh = boxes[3:6, None, None, :]
    hit_g = _interval_slab_hit(
        dl[..., None], dh[..., None], bl, bh, t_min
    )  # (T, G, NC)
    if galive is not None:
        hit_g &= galive[..., None]
    hit = jnp.any(hit_g, axis=1)  # (T, NC)

    center = 0.5 * (boxes[0:3] + boxes[3:6])  # (3, NC), origin-relative
    dist2 = jnp.sum(center * center, axis=0)  # (NC,)
    sort_key = jnp.where(hit, dist2[None, :], _INF)
    lists = jnp.argsort(sort_key, axis=1).astype(jnp.int32)  # (T, NC)
    counts = jnp.sum(hit, axis=1, dtype=jnp.int32)[:, None]  # (T, 1)
    return lists, counts


def tile_cluster_lists_general(
    rays_soa: Array, boxes: Array, t_min: float = 0.0,
    tmax_tiles: Array | None = None,
) -> tuple[Array, Array]:
    """Per-tile cluster culling + FRONT-TO-BACK ordering for general rays.

    rays_soa: (6, R/128, 128) packed o/d in tile-major order; boxes (6, NC)
    world-space cluster AABBs.  The interval test widens the target box by
    the tile's origin box ([bl - omax, bh - omin]); the surviving clusters
    are ordered by distance from the tile's mean origin, so the kernel's
    best-t clip prunes far clusters once near hits land — the baseline
    general kernel scans in static Morton order, where a bounce tile
    (spatially tight origins, hemisphere directions) can prune nothing.

    `tmax_tiles` (optional, (R/128, 128)): rays with tmax < 0 are dead
    (retired paths / padding) — they are excluded from the tile's origin
    AND direction boxes (a retired bounce ray still carries its stale
    camera-origin ray, which would blow the origin box wide open), and
    all-dead tiles get count 0.

    Sub-tile split (FF_CULL_SUBTILES="SxL", default 1x1 = off): sub-groups
    with independent origin AND direction boxes, OR-ed — prunes the phantom
    origin-A/direction-B combinations a whole-tile box admits, but the
    pruned clusters are ones the kernel's slab gate already skips cheaply
    (see _cull_subtiles for the measured wash at the target workload).
    """
    n_rows = rays_soa.shape[1]
    t = n_rows // SUBLANES
    ss, ls = _cull_subtiles()
    r_tiles = rays_soa.reshape(6, t, SUBLANES, LANES)
    alive = (
        (tmax_tiles >= 0.0).reshape(1, t, SUBLANES, LANES)
        if tmax_tiles is not None else None
    )
    rlo, rhi, galive = _subgroup_minmax(r_tiles, alive, ss, ls)  # (6, T, G)
    ol, dl = rlo[:3], rlo[3:]
    oh, dh = rhi[:3], rhi[3:]

    bl = boxes[0:3, None, None, :] - oh[..., None]  # (3, T, G, NC) widened
    bh = boxes[3:6, None, None, :] - ol[..., None]
    hit_g = _interval_slab_hit(
        dl[..., None], dh[..., None], bl, bh, t_min
    )  # (T, G, NC)
    if galive is not None:
        hit_g &= galive[..., None]
    hit = jnp.any(hit_g, axis=1)  # (T, NC)

    center = 0.5 * (boxes[0:3] + boxes[3:6])  # (3, NC) world space
    # Tile origin center for the front-to-back sort: collapse the group
    # boxes (empty groups carry +/-INF; masked min/max over groups).
    if galive is not None:
        g_ok = galive[None]  # (1, T, G)
        ol_t = jnp.min(jnp.where(g_ok, ol, _INF), axis=2)  # (3, T)
        oh_t = jnp.max(jnp.where(g_ok, oh, -_INF), axis=2)
    else:
        ol_t = jnp.min(ol, axis=2)
        oh_t = jnp.max(oh, axis=2)
    oc = 0.5 * (ol_t + oh_t)  # (3, T)
    diff = center[:, None, :] - oc[:, :, None]  # (3, T, NC)
    dist2 = jnp.sum(diff * diff, axis=0)  # (T, NC)
    sort_key = jnp.where(hit, dist2, _INF)
    lists = jnp.argsort(sort_key, axis=1).astype(jnp.int32)
    counts = jnp.sum(hit, axis=1, dtype=jnp.int32)[:, None]  # (T, 1)
    return lists, counts


def _kernel_general_culled(
    rays_ref, tmax_ref, tri_ref, box_ref, list_ref, count_ref,
    out_t_ref, out_prim_ref, *, t_min, any_hit, chunk, unroll=4,
):
    """General (per-ray origin) Moller-Trumbore kernel over the tile's culled,
    front-to-back cluster list.  Cf. intersect_kernel._kernel."""
    ox, oy, oz = rays_ref[0], rays_ref[1], rays_ref[2]  # (16, 128)
    dx, dy, dz = rays_ref[3], rays_ref[4], rays_ref[5]
    tmax = tmax_ref[...]
    row = pl.program_id(0) % 8  # see _kernel_shared_culled
    n_listed = count_ref[row, 0]
    dead = tmax < 0.0

    def safe_inv(x):
        tiny = jnp.abs(x) < 1e-30
        sign = jnp.where(x < 0, -1.0, 1.0)
        return jnp.where(tiny, sign * 1e30, 1.0 / jnp.where(tiny, 1.0, x))

    inv_dx = safe_inv(dx)
    inv_dy = safe_inv(dy)
    inv_dz = safe_inv(dz)

    # Rational best-hit carry (tn, dn), dn = |det| > 0: no per-(ray, tri)
    # division; one div per (cluster, tile) for the slab clip and one at the
    # end.  Cf. intersect_kernel._kernel / _kernel_shared.
    best_tn0 = jnp.full((SUBLANES, LANES), _BIG, jnp.float32)
    best_dn0 = jnp.ones((SUBLANES, LANES), jnp.float32)
    best_p0 = jnp.full((SUBLANES, LANES), -1, jnp.int32)

    def cluster_body(ci, carry):
        c = list_ref[row, ci]
        best_tn, best_dn, best_p = carry
        best_t = best_tn / best_dn
        t0x = (box_ref[0, c] - ox) * inv_dx
        t1x = (box_ref[3, c] - ox) * inv_dx
        t0y = (box_ref[1, c] - oy) * inv_dy
        t1y = (box_ref[4, c] - oy) * inv_dy
        t0z = (box_ref[2, c] - oz) * inv_dz
        t1z = (box_ref[5, c] - oz) * inv_dz
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
                    inv_det = jnp.where(jnp.abs(det) < 1e-9, 0.0, 1.0 / det)
                    u = (tx * px + ty * py + tz * pz) * inv_det
                    v = (dx * qx + dy * qy + dz * qz) * inv_det
                    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                    ok = (
                        (jnp.abs(det) >= 1e-9)
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
                    (dn >= 1e-9)
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

            def unrolled(jj, carry2):
                for k in range(unroll):
                    carry2 = tri_body(jj * unroll + k, carry2)
                return carry2

            return jax.lax.fori_loop(0, chunk // unroll, unrolled, carry)

        return jax.lax.cond(
            tile_hits, process, lambda x: x, (best_tn, best_dn, best_p)
        )

    def while_body(carry):
        ci, state = carry
        return ci + 1, cluster_body(ci, state)

    if any_hit:
        def while_cond(carry):
            ci, state = carry
            return (ci < n_listed) & ~jnp.all((state[2] >= 0) | dead)
    else:
        def while_cond(carry):
            ci, _state = carry
            return ci < n_listed

    _, (best_tn, best_dn, best_p) = jax.lax.while_loop(
        while_cond, while_body, (0, (best_tn0, best_dn0, best_p0))
    )

    out_t_ref[...] = jnp.where(best_p >= 0, best_tn / best_dn, 0.0)
    out_prim_ref[...] = best_p


@functools.partial(
    jax.jit,
    static_argnames=("t_min", "any_hit", "interpret", "chunk", "unroll"),
)
def _intersect_general_culled_packed(
    rays_soa: Array,
    tmax_tiles: Array,
    tri: Array,
    boxes: Array,
    t_min: float,
    any_hit: bool,
    interpret: bool,
    chunk: int,
    unroll: int = 4,
):
    n_rows = rays_soa.shape[1]
    n_tiles = n_rows // SUBLANES
    lists, counts = tile_cluster_lists_general(
        rays_soa, boxes, t_min=t_min, tmax_tiles=tmax_tiles
    )
    lists, counts = _pad_tile_rows(lists, counts)
    kernel = functools.partial(
        _kernel_general_culled, t_min=t_min, any_hit=any_hit, chunk=chunk,
        unroll=unroll,
    )
    out_t, out_prim = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((6, SUBLANES, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tri.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(boxes.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, lists.shape[1]), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 1), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(rays_soa, tmax_tiles, tri, boxes, lists, counts)
    return out_t, out_prim


def intersect_pallas_general_culled(
    o: Array,
    d: Array,
    vertices: Array,
    faces: Array,
    t_min: float = 1e-4,
    t_max: Array | float = 1e30,
    any_hit: bool = False,
    interpret: bool = False,
    chunk: int = 16,
):
    """Tile-culled general closest/any-hit; (t (N,), prim (N,)).  For bounce
    rays: spatially-local origins per tile, arbitrary directions."""
    from fireflies_tpu.render.pallas.intersect_kernel import (  # noqa: PLC0415
        pack_rays,
        pack_triangles,
    )

    tri, boxes = pack_triangles(vertices, faces, chunk=chunk)
    rays_soa, tmax_tiles, n = pack_rays(o, d, t_max)
    out_t, out_prim = _intersect_general_culled_packed(
        jax.lax.stop_gradient(rays_soa),
        jax.lax.stop_gradient(tmax_tiles),
        jax.lax.stop_gradient(tri),
        jax.lax.stop_gradient(boxes),
        t_min,
        any_hit,
        interpret,
        chunk=chunk,
    )
    return out_t.reshape(-1)[:n], out_prim.reshape(-1)[:n]


def _pad_tile_rows(lists: Array, counts: Array):
    """Pad the tile axis to a multiple of 8 so the 8-row SMEM block windows
    never index out of bounds (padded tiles are never launched)."""
    t_pad = (-lists.shape[-2]) % 8
    if t_pad:
        pad = [(0, 0)] * lists.ndim
        pad[-2] = (0, t_pad)
        lists = jnp.pad(lists, pad)
        counts = jnp.pad(counts, pad)
    return lists, counts


def _kernel_shared_culled(
    dirs_ref, tmax_ref, woop_ref, box_ref, list_ref, count_ref,
    out_t_ref, out_prim_ref, *, t_min, any_hit, chunk, unroll=4,
):
    """Shared-origin Woop kernel over the tile's culled cluster list.

    Same rational best-hit carry as intersect_kernel._kernel_shared (one
    division at the end); the cluster loop is a while over count_ref's
    per-tile count, indices from list_ref.
    """
    dx, dy, dz = dirs_ref[0], dirs_ref[1], dirs_ref[2]  # (16, 128)
    tmax = tmax_ref[...]
    # list_ref/count_ref are blocked in 8-tile row groups (Mosaic requires
    # block rows divisible by 8); this tile's row within the window:
    row = pl.program_id(0) % 8
    n_listed = count_ref[row, 0]

    def safe_inv(x):
        tiny = jnp.abs(x) < 1e-30
        sign = jnp.where(x < 0, -1.0, 1.0)
        return jnp.where(tiny, sign * 1e30, 1.0 / jnp.where(tiny, 1.0, x))

    inv_dx = safe_inv(dx)
    inv_dy = safe_inv(dy)
    inv_dz = safe_inv(dz)
    # Padding / masked-off rays carry tmax < 0: they can never register a
    # hit, so treat them as already done for the any-hit early exit.
    dead = tmax < 0.0

    best_tn0 = jnp.full((SUBLANES, LANES), _BIG, jnp.float32)
    best_dn0 = jnp.ones((SUBLANES, LANES), jnp.float32)
    best_p0 = jnp.full((SUBLANES, LANES), -1, jnp.int32)

    def cluster_body(ci, carry):
        c = list_ref[row, ci]
        best_tn, best_dn, best_p = carry
        best_t = best_tn / best_dn
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

                sgn = jnp.where(dpz >= 0.0, 1.0, -1.0)
                dn = dpz * sgn
                tn = -opz * sgn
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

            def unrolled(jj, carry2):
                for k in range(unroll):
                    carry2 = tri_body(jj * unroll + k, carry2)
                return carry2

            return jax.lax.fori_loop(0, chunk // unroll, unrolled, carry)

        return jax.lax.cond(tile_hits, process, lambda x: x, (best_tn, best_dn, best_p))

    if any_hit:
        def while_body(carry):
            ci, state = carry
            return ci + 1, cluster_body(ci, state)

        def while_cond(carry):
            ci, state = carry
            return (ci < n_listed) & ~jnp.all((state[2] >= 0) | dead)

        _, (best_tn, best_dn, best_p) = jax.lax.while_loop(
            while_cond, while_body, (0, (best_tn0, best_dn0, best_p0))
        )
    else:
        def while_body2(carry):
            ci, state = carry
            return ci + 1, cluster_body(ci, state)

        def while_cond2(carry):
            ci, _state = carry
            return ci < n_listed

        _, (best_tn, best_dn, best_p) = jax.lax.while_loop(
            while_cond2, while_body2, (0, (best_tn0, best_dn0, best_p0))
        )

    out_t_ref[...] = jnp.where(best_p >= 0, best_tn / best_dn, 0.0)
    out_prim_ref[...] = best_p


@functools.partial(
    jax.jit,
    static_argnames=("t_min", "any_hit", "interpret", "chunk", "unroll"),
)
def _intersect_culled_packed(
    dirs_soa: Array,
    tmax_tiles: Array,
    woop: Array,
    boxes: Array,
    t_min: float,
    any_hit: bool,
    interpret: bool,
    chunk: int,
    unroll: int = 4,
):
    n_rows = dirs_soa.shape[1]
    n_tiles = n_rows // SUBLANES
    lists, counts = tile_cluster_lists(
        dirs_soa, boxes, t_min=t_min, tmax_tiles=tmax_tiles
    )
    lists, counts = _pad_tile_rows(lists, counts)
    kernel = functools.partial(
        _kernel_shared_culled, t_min=t_min, any_hit=any_hit, chunk=chunk,
        unroll=unroll,
    )
    out_t, out_prim = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((3, SUBLANES, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(woop.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(boxes.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
            # Blocked in 8-tile row groups: only a sliver of the (T, NC)
            # table rides SMEM (the whole table would blow the 1 MiB SMEM
            # budget at chunk 16); 8 rows because Mosaic requires block rows
            # divisible by 8.
            pl.BlockSpec((8, lists.shape[1]), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 1), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(dirs_soa, tmax_tiles, woop, boxes, lists, counts)
    return out_t, out_prim


def intersect_pallas_shared_culled(
    origin: Array,
    d: Array,
    vertices: Array,
    faces: Array,
    t_min: float = 1e-4,
    t_max: Array | float = 1e30,
    any_hit: bool = False,
    interpret: bool = False,
    chunk: int = 64,
):
    """Tile-culled shared-origin closest/any-hit; (t (N,), prim (N,)).

    Drop-in for intersect_kernel.intersect_pallas_shared; rays must be in
    tile-major spatially-local order (camera_rays_tiled) for the culling to
    bite — correctness does not depend on it.
    """
    woop, boxes = pack_triangles_woop(vertices, faces, origin, chunk=chunk)
    dirs_soa, tmax_tiles, n = pack_dirs(d, t_max)
    out_t, out_prim = _intersect_culled_packed(
        jax.lax.stop_gradient(dirs_soa),
        jax.lax.stop_gradient(tmax_tiles),
        jax.lax.stop_gradient(woop),
        jax.lax.stop_gradient(boxes),
        t_min,
        any_hit,
        interpret,
        chunk=chunk,
    )
    return out_t.reshape(-1)[:n], out_prim.reshape(-1)[:n]

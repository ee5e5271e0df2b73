"""HBM-streamed shared-origin intersection kernel (large scenes).

The resident kernels (intersect_kernel.py) keep the whole triangle SoA in
SMEM — capacity caps out around 12k faces on v5e.  This variant keeps the
Woop-transformed triangle data in HBM and double-buffers 128-triangle
clusters into SMEM scratch with async DMA, overlapping the copy of cluster
c+1 with the intersection math of cluster c.  Cluster AABBs still ride SMEM
(6 floats per cluster) for the slab prune; pruned clusters skip compute but
not the (cheap) DMA.

Layout: woop data (16, Tpad) f32 — rows 0..11 = W rows + o', rows 12..15
zero padding for the (8, 128) HBM tiling; Tpad a multiple of 128.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fireflies_tpu.render.pallas.intersect_kernel import (
    LANES,
    SUBLANES,
    _BIG,
    _EPS_BARY,
    pack_dirs,
    pack_triangles_woop,
)

Array = jax.Array

STREAM_CHUNK = 128  # DMA granularity (lane-tile aligned)


def pack_woop_streamed(
    vertices: Array, faces: Array, origin: Array | None,
    face_mat: Array | None = None,
):
    """(woop16 (16, Tpad), boxes (6, NC)) with Tpad % 128 == 0.

    With `origin`, rows 9..11 hold the per-tri constant o' = W(o - v0)
    (shared-origin fast path).  Without, rows 9..11 hold W @ v0 so the kernel
    can form o'_k = W_k . o - (W v0)_k per ray (general path); boxes are then
    NOT origin-shifted.

    Rows 12..15 are (8, 128)-tiling padding; with `face_mat`, row 12 carries
    the per-face material id as f32 — it rides the SAME DMAs the kernel
    already issues, so attribute emission (emit_attrs) costs no extra
    bandwidth.
    """
    zero = jnp.zeros(3, jnp.float32)
    woop, boxes = pack_triangles_woop(
        vertices, faces, origin if origin is not None else zero, chunk=STREAM_CHUNK
    )
    if origin is None:
        # pack_triangles_woop with origin=0 gives rows 9..11 = W @ (0 - v0);
        # negate to store W @ v0.
        woop = woop.at[9:12, :].multiply(-1.0)
    tpad = woop.shape[1]
    woop16 = jnp.zeros((16, tpad), jnp.float32).at[:12, :].set(woop)
    if face_mat is not None:
        woop16 = woop16.at[12, : face_mat.shape[0]].set(
            face_mat.astype(jnp.float32)
        )
    return woop16, boxes


def _kernel_stream(
    bidx_ref, rays_ref, tmax_ref, box_ref, woop_hbm, out_t_ref, out_prim_ref,
    scratch, sems, *, t_min, n_chunks, any_hit, shared, woop_batched=False,
    boxes_batched=False,
):
    # Batch index for vmapped variants (Mosaic requires SMEM/ANY operands
    # whole, so batched geometry is indexed in-kernel rather than blocked).
    b = bidx_ref[pl.program_id(0)]

    def bx(r, c):
        return box_ref[b, r, c] if boxes_batched else box_ref[r, c]

    if shared:
        dx, dy, dz = rays_ref[0], rays_ref[1], rays_ref[2]  # (16, 128)
    else:
        ox, oy, oz = rays_ref[0], rays_ref[1], rays_ref[2]
        dx, dy, dz = rays_ref[3], rays_ref[4], rays_ref[5]
    tmax = tmax_ref[...]

    def safe_inv(x):
        tiny = jnp.abs(x) < 1e-30
        sign = jnp.where(x < 0, -1.0, 1.0)
        return jnp.where(tiny, sign * 1e30, 1.0 / jnp.where(tiny, 1.0, x))

    inv_dx = safe_inv(dx)
    inv_dy = safe_inv(dy)
    inv_dz = safe_inv(dz)

    def dma(slot, c):
        # Batched geometry (vmapped variants) stays whole in HBM (ANY-space
        # blocks must cover the full array); slice the variant here instead.
        if woop_batched:
            src = woop_hbm.at[b, :, pl.ds(c * STREAM_CHUNK, STREAM_CHUNK)]
        else:
            src = woop_hbm.at[:, pl.ds(c * STREAM_CHUNK, STREAM_CHUNK)]
        return pltpu.make_async_copy(src, scratch.at[slot], sems.at[slot])

    dma(0, 0).start()

    # Rational best-hit carry (tn, dn), dn = |d'_z| > 0: no per-(ray, tri)
    # division; one div per (chunk, tile) for the slab clip and one at the
    # end.  Cf. intersect_kernel._kernel_shared.
    best_tn0 = jnp.full((SUBLANES, LANES), _BIG, jnp.float32)
    best_dn0 = jnp.ones((SUBLANES, LANES), jnp.float32)
    best_p0 = jnp.full((SUBLANES, LANES), -1, jnp.int32)

    def chunk_body(c, carry):
        best_tn, best_dn, best_p = carry
        best_t = best_tn / best_dn
        slot = c % 2

        @pl.when(c + 1 < n_chunks)
        def _():
            dma((c + 1) % 2, c + 1).start()

        dma(slot, c).wait()

        if shared:
            t0x = bx(0, c) * inv_dx
            t1x = bx(3, c) * inv_dx
            t0y = bx(1, c) * inv_dy
            t1y = bx(4, c) * inv_dy
            t0z = bx(2, c) * inv_dz
            t1z = bx(5, c) * inv_dz
        else:
            t0x = (bx(0, c) - ox) * inv_dx
            t1x = (bx(3, c) - ox) * inv_dx
            t0y = (bx(1, c) - oy) * inv_dy
            t1y = (bx(4, c) - oy) * inv_dy
            t0z = (bx(2, c) - oz) * inv_dz
            t1z = (bx(5, c) - oz) * inv_dz
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
                w00 = scratch[slot, 0, j]
                w01 = scratch[slot, 1, j]
                w02 = scratch[slot, 2, j]
                w10 = scratch[slot, 3, j]
                w11 = scratch[slot, 4, j]
                w12 = scratch[slot, 5, j]
                w20 = scratch[slot, 6, j]
                w21 = scratch[slot, 7, j]
                w22 = scratch[slot, 8, j]
                opx = scratch[slot, 9, j]
                opy = scratch[slot, 10, j]
                opz = scratch[slot, 11, j]

                dpx = w00 * dx + w01 * dy + w02 * dz
                dpy = w10 * dx + w11 * dy + w12 * dz
                dpz = w20 * dx + w21 * dy + w22 * dz
                if shared:
                    o_x, o_y, o_z = opx, opy, opz
                else:
                    # rows 9..11 hold (W v0)_k: o'_k = W_k . o - (W v0)_k.
                    o_x = w00 * ox + w01 * oy + w02 * oz - opx
                    o_y = w10 * ox + w11 * oy + w12 * oz - opy
                    o_z = w20 * ox + w21 * oy + w22 * oz - opz

                # Division-free: t = tn / dn, dn = |d'_z|; comparisons and
                # the u/v tests cross-multiply by dn (VPU div is many-cycle).
                sgn = jnp.where(dpz >= 0.0, 1.0, -1.0)
                dn = dpz * sgn
                tn = -o_z * sgn
                u_n = o_x * dn + tn * dpx
                v_n = o_y * dn + tn * dpy
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
                bp = jnp.where(ok, c * STREAM_CHUNK + j, bp)
                return btn, bdn, bp

            def unrolled(jj, carry2):
                for k in range(4):
                    carry2 = tri_body(jj * 4 + k, carry2)
                return carry2

            return jax.lax.fori_loop(0, STREAM_CHUNK // 4, unrolled, carry)

        return jax.lax.cond(
            tile_hits, process, lambda x: x, (best_tn, best_dn, best_p)
        )

    # Dead rays (tmax < 0: retired paths / padding) count as done for the
    # any-hit early exit; an all-dead tile runs zero chunks either way.
    dead = tmax < 0.0

    def while_body(carry):
        c, state = carry
        return c + 1, chunk_body(c, state)

    if any_hit:
        def while_cond(carry):
            c, state = carry
            return (c < n_chunks) & ~jnp.all((state[2] >= 0) | dead)
    else:
        n_eff = jnp.where(jnp.all(dead), 0, n_chunks)

        def while_cond(carry):
            c, _state = carry
            return c < n_eff

    c_fin, (best_tn, best_dn, best_p) = jax.lax.while_loop(
        while_cond, while_body, (0, (best_tn0, best_dn0, best_p0))
    )

    # Drain: an early exit leaves the prefetch for chunk c_fin in
    # flight; its semaphore signal would otherwise leak into the next
    # grid step's wait accounting and let it read a half-copied slot.
    @pl.when(c_fin < n_chunks)
    def _():
        dma(c_fin % 2, c_fin).wait()

    out_t_ref[...] = jnp.where(best_p >= 0, best_tn / best_dn, 0.0)
    out_prim_ref[...] = best_p


def _kernel_stream_culled(
    bidx_ref, dirs_ref, tmax_ref, box_ref, list_ref, count_ref, woop_hbm,
    out_t_ref, out_prim_ref, *rest, t_min, any_hit,
    woop_batched=False, boxes_batched=False, lists_batched=False,
    emit_attrs=False,
):
    """Tile-culled shared-origin streamed kernel: visits only the clusters in
    this tile's precomputed list (intersect_culled.tile_cluster_lists),
    double-buffering their woop data HBM->SMEM by dynamic index.  See
    intersect_culled.py for the culling pass.

    emit_attrs additionally outputs the winning triangle's unnormalized
    plane normal and material id (Hit.nx/ny/nz/mat): the normal IS the
    Woop row W2 = cross(e1, e2)/det — already loaded per test — and the
    mat id rides woop row 12 (pack_woop_streamed), so the only extra cost
    is 4 selects per test plus 4 output tiles."""
    if emit_attrs:
        out_nx_ref, out_ny_ref, out_nz_ref, out_mat_ref, scratch, sems = rest
    else:
        scratch, sems = rest
    b = bidx_ref[pl.program_id(0)]

    def bx(r, c):
        return box_ref[b, r, c] if boxes_batched else box_ref[r, c]

    # list/count windows cover 8 tile rows (Mosaic block-rows rule).
    row = pl.program_id(1) % 8

    def listed(ci):
        return list_ref[0, row, ci] if lists_batched else list_ref[row, ci]

    n_listed = count_ref[0, row, 0] if lists_batched else count_ref[row, 0]

    dx, dy, dz = dirs_ref[0], dirs_ref[1], dirs_ref[2]  # (16, 128)
    tmax = tmax_ref[...]
    dead = tmax < 0.0

    def safe_inv(x):
        tiny = jnp.abs(x) < 1e-30
        sign = jnp.where(x < 0, -1.0, 1.0)
        return jnp.where(tiny, sign * 1e30, 1.0 / jnp.where(tiny, 1.0, x))

    inv_dx = safe_inv(dx)
    inv_dy = safe_inv(dy)
    inv_dz = safe_inv(dz)

    def dma(slot, c):
        if woop_batched:
            src = woop_hbm.at[b, :, pl.ds(c * STREAM_CHUNK, STREAM_CHUNK)]
        else:
            src = woop_hbm.at[:, pl.ds(c * STREAM_CHUNK, STREAM_CHUNK)]
        return pltpu.make_async_copy(src, scratch.at[slot], sems.at[slot])

    @pl.when(n_listed > 0)
    def _():
        dma(0, listed(0)).start()

    # Rational best-hit carry (tn, dn): see _kernel_stream.
    best_tn0 = jnp.full((SUBLANES, LANES), _BIG, jnp.float32)
    best_dn0 = jnp.ones((SUBLANES, LANES), jnp.float32)
    best_p0 = jnp.full((SUBLANES, LANES), -1, jnp.int32)
    zeros0 = jnp.zeros((SUBLANES, LANES), jnp.float32)
    state0 = (best_tn0, best_dn0, best_p0)
    if emit_attrs:
        state0 = state0 + (zeros0, zeros0, zeros0 + 1.0, zeros0)

    def cluster_body(ci, carry):
        best_tn, best_dn = carry[0], carry[1]
        best_t = best_tn / best_dn
        c = listed(ci)
        slot = ci % 2

        @pl.when(ci + 1 < n_listed)
        def _():
            dma((ci + 1) % 2, listed(ci + 1)).start()

        dma(slot, c).wait()

        t0x = bx(0, c) * inv_dx
        t1x = bx(3, c) * inv_dx
        t0y = bx(1, c) * inv_dy
        t1y = bx(4, c) * inv_dy
        t0z = bx(2, c) * inv_dz
        t1z = bx(5, c) * inv_dz
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
                btn, bdn, bp = carry2[0], carry2[1], carry2[2]
                w00 = scratch[slot, 0, j]
                w01 = scratch[slot, 1, j]
                w02 = scratch[slot, 2, j]
                w10 = scratch[slot, 3, j]
                w11 = scratch[slot, 4, j]
                w12 = scratch[slot, 5, j]
                w20 = scratch[slot, 6, j]
                w21 = scratch[slot, 7, j]
                w22 = scratch[slot, 8, j]
                opx = scratch[slot, 9, j]
                opy = scratch[slot, 10, j]
                opz = scratch[slot, 11, j]

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
                bp = jnp.where(ok, c * STREAM_CHUNK + j, bp)
                if not emit_attrs:
                    return btn, bdn, bp
                bnx = jnp.where(ok, w20, carry2[3])
                bny = jnp.where(ok, w21, carry2[4])
                bnz = jnp.where(ok, w22, carry2[5])
                bm = jnp.where(ok, scratch[slot, 12, j], carry2[6])
                return btn, bdn, bp, bnx, bny, bnz, bm

            def unrolled(jj, carry2):
                for k in range(4):
                    carry2 = tri_body(jj * 4 + k, carry2)
                return carry2

            return jax.lax.fori_loop(0, STREAM_CHUNK // 4, unrolled, carry)

        return jax.lax.cond(tile_hits, process, lambda x: x, carry)

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

    ci_fin, state = jax.lax.while_loop(while_cond, while_body, (0, state0))
    best_tn, best_dn, best_p = state[0], state[1], state[2]

    # Drain: an early exit (any-hit) leaves the prefetch for cluster ci_fin
    # in flight; its semaphore signal would otherwise leak into the next
    # grid step's wait accounting and let it read a half-copied slot.
    @pl.when(ci_fin < n_listed)
    def _():
        dma(ci_fin % 2, listed(ci_fin)).wait()

    out_t_ref[...] = jnp.where(best_p >= 0, best_tn / best_dn, 0.0)
    out_prim_ref[...] = best_p
    if emit_attrs:
        out_nx_ref[...] = state[3]
        out_ny_ref[...] = state[4]
        out_nz_ref[...] = state[5]
        out_mat_ref[...] = state[6].astype(jnp.int32)


def _stream_pallas_call(
    dirs_soa, tmax_tiles, woop16, boxes, *,
    t_min, any_hit, interpret, shared, in_batched, axis_size,
):
    """Single pallas_call over grid (B, n_tiles).  Each of the four inputs
    either carries a leading batch dim (per in_batched) or is shared across
    the batch.  Outputs always carry the batch dim."""
    b_dirs, b_tmax, b_woop, b_boxes = in_batched
    n_comp = dirs_soa.shape[1] if b_dirs else dirs_soa.shape[0]
    n_rows = dirs_soa.shape[-2]
    n_tiles = n_rows // SUBLANES
    n_chunks = boxes.shape[-1]
    kernel = functools.partial(
        _kernel_stream, t_min=t_min, n_chunks=n_chunks, any_hit=any_hit,
        shared=shared, woop_batched=b_woop, boxes_batched=b_boxes,
    )
    if b_dirs:
        dirs_spec = pl.BlockSpec(
            (None, n_comp, SUBLANES, LANES), lambda b, i: (b, 0, i, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        dirs_spec = pl.BlockSpec(
            (n_comp, SUBLANES, LANES), lambda b, i: (0, i, 0),
            memory_space=pltpu.VMEM,
        )
    if b_tmax:
        tmax_spec = pl.BlockSpec(
            (None, SUBLANES, LANES), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        )
    else:
        tmax_spec = pl.BlockSpec(
            (SUBLANES, LANES), lambda b, i: (i, 0), memory_space=pltpu.VMEM
        )
    # Mosaic requires SMEM operands whole (no grid blocking): pass boxes
    # whole and index the batch dim in-kernel.
    boxes_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    bidx = jnp.arange(axis_size, dtype=jnp.int32)  # (B,)
    bidx_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_t, out_prim = pl.pallas_call(
        kernel,
        grid=(axis_size, n_tiles),
        in_specs=[
            bidx_spec,
            dirs_spec,
            tmax_spec,
            boxes_spec,
            pl.BlockSpec(memory_space=pl.ANY),  # woop stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((None, SUBLANES, LANES), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, SUBLANES, LANES), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((axis_size, n_rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((axis_size, n_rows, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((2, 16, STREAM_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(bidx, dirs_soa, tmax_tiles, boxes, woop16)
    return out_t, out_prim


def _stream_culled_pallas_call(
    dirs_soa, tmax_tiles, woop16, boxes, *,
    t_min, any_hit, interpret, in_batched, axis_size, emit_attrs=False,
):
    """Tile-culled variant of _stream_pallas_call (shared origin only).
    Builds per-(variant, tile) cluster lists with the XLA culling pass and
    hands them to the culled kernel, blocked per grid step."""
    from fireflies_tpu.render.pallas.intersect_culled import (  # noqa: PLC0415
        tile_cluster_lists,
    )

    b_dirs, b_tmax, b_woop, b_boxes = in_batched
    n_rows = dirs_soa.shape[-2]
    n_tiles = n_rows // SUBLANES

    from fireflies_tpu.render.pallas.intersect_culled import (  # noqa: PLC0415
        _pad_tile_rows,
    )

    lists_batched = b_dirs or b_boxes or b_tmax
    if not lists_batched:
        lists, counts = tile_cluster_lists(
            dirs_soa, boxes, t_min=t_min, tmax_tiles=tmax_tiles
        )
    else:
        lists, counts = jax.vmap(
            lambda dd, tm, bx: tile_cluster_lists(
                dd, bx, t_min=t_min, tmax_tiles=tm
            ),
            in_axes=(
                0 if b_dirs else None,
                0 if b_tmax else None,
                0 if b_boxes else None,
            ),
        )(dirs_soa, tmax_tiles, boxes)
    lists, counts = _pad_tile_rows(lists, counts)

    kernel = functools.partial(
        _kernel_stream_culled, t_min=t_min, any_hit=any_hit,
        woop_batched=b_woop, boxes_batched=b_boxes, lists_batched=lists_batched,
        emit_attrs=emit_attrs,
    )
    if b_dirs:
        dirs_spec = pl.BlockSpec(
            (None, 3, SUBLANES, LANES), lambda b, i: (b, 0, i, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        dirs_spec = pl.BlockSpec(
            (3, SUBLANES, LANES), lambda b, i: (0, i, 0),
            memory_space=pltpu.VMEM,
        )
    if b_tmax:
        tmax_spec = pl.BlockSpec(
            (None, SUBLANES, LANES), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        )
    else:
        tmax_spec = pl.BlockSpec(
            (SUBLANES, LANES), lambda b, i: (i, 0), memory_space=pltpu.VMEM
        )
    nc = lists.shape[-1]
    if lists_batched:
        list_spec = pl.BlockSpec(
            (1, 8, nc), lambda b, i: (b, i // 8, 0), memory_space=pltpu.SMEM
        )
        count_spec = pl.BlockSpec(
            (1, 8, 1), lambda b, i: (b, i // 8, 0), memory_space=pltpu.SMEM
        )
    else:
        list_spec = pl.BlockSpec(
            (8, nc), lambda b, i: (i // 8, 0), memory_space=pltpu.SMEM
        )
        count_spec = pl.BlockSpec(
            (8, 1), lambda b, i: (i // 8, 0), memory_space=pltpu.SMEM
        )
    boxes_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    bidx = jnp.arange(axis_size, dtype=jnp.int32)  # (B,)
    n_out = 6 if emit_attrs else 2
    ray_spec = pl.BlockSpec(
        (None, SUBLANES, LANES), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    out_dtypes = [jnp.float32, jnp.int32]
    if emit_attrs:
        out_dtypes += [jnp.float32, jnp.float32, jnp.float32, jnp.int32]
    outs = pl.pallas_call(
        kernel,
        grid=(axis_size, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # bidx
            dirs_spec,
            tmax_spec,
            boxes_spec,
            list_spec,
            count_spec,
            pl.BlockSpec(memory_space=pl.ANY),  # woop stays in HBM
        ],
        out_specs=[ray_spec] * n_out,
        out_shape=[
            jax.ShapeDtypeStruct((axis_size, n_rows, LANES), dt)
            for dt in out_dtypes
        ],
        scratch_shapes=[
            pltpu.SMEM((2, 16, STREAM_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(bidx, dirs_soa, tmax_tiles, boxes, lists, counts, woop16)
    return tuple(outs)


@functools.lru_cache(maxsize=None)
def _stream_culled_fn(
    t_min: float, any_hit: bool, interpret: bool, emit_attrs: bool = False
):
    """custom_vmap wrapper for the culled streamed kernel (cf. _stream_fn)."""

    @jax.custom_batching.custom_vmap
    def f(dirs_soa, tmax_tiles, woop16, boxes):
        outs = _stream_culled_pallas_call(
            dirs_soa, tmax_tiles, woop16, boxes,
            t_min=t_min, any_hit=any_hit, interpret=interpret,
            in_batched=(False, False, False, False), axis_size=1,
            emit_attrs=emit_attrs,
        )
        return tuple(o[0] for o in outs)

    @f.def_vmap
    def _rule(axis_size, in_batched, dirs_soa, tmax_tiles, woop16, boxes):
        outs = _stream_culled_pallas_call(
            dirs_soa, tmax_tiles, woop16, boxes,
            t_min=t_min, any_hit=any_hit, interpret=interpret,
            in_batched=tuple(in_batched), axis_size=axis_size,
            emit_attrs=emit_attrs,
        )
        return tuple(outs), (True,) * len(outs)

    return f


@functools.partial(
    jax.jit, static_argnames=("t_min", "any_hit", "interpret", "emit_attrs")
)
def _intersect_stream_culled_packed(
    dirs_soa: Array, tmax_tiles: Array, woop16: Array, boxes: Array,
    t_min: float, any_hit: bool, interpret: bool, emit_attrs: bool = False,
):
    return _stream_culled_fn(t_min, any_hit, interpret, emit_attrs)(
        dirs_soa, tmax_tiles, woop16, boxes
    )


def intersect_pallas_streamed_culled(
    origin: Array,
    d: Array,
    vertices: Array,
    faces: Array,
    t_min: float = 1e-4,
    t_max: Array | float = 1e30,
    any_hit: bool = False,
    interpret: bool = False,
    face_mat: Array | None = None,
):
    """Tile-culled shared-origin closest/any-hit for large scenes:
    per-tile cluster lists + on-demand double-buffered HBM streaming.

    With `face_mat`, returns (t, prim, nx, ny, nz, mat): kernel-emitted
    plane normals + material ids (see Hit docstring)."""
    emit_attrs = face_mat is not None
    woop16, boxes = pack_woop_streamed(vertices, faces, origin, face_mat)
    dirs_soa, tmax_tiles, n = pack_dirs(d, t_max)
    outs = _intersect_stream_culled_packed(
        jax.lax.stop_gradient(dirs_soa),
        jax.lax.stop_gradient(tmax_tiles),
        jax.lax.stop_gradient(woop16),
        jax.lax.stop_gradient(boxes),
        t_min,
        any_hit,
        interpret,
        emit_attrs,
    )
    return tuple(o.reshape(-1)[:n] for o in outs)


@functools.lru_cache(maxsize=None)
def _stream_fn(t_min: float, any_hit: bool, interpret: bool, shared: bool):
    """custom_vmap wrapper: vmapping the streamed kernel folds the batch into
    the pallas grid (the default batching rule would demand a Squeezed()
    block on the ANY-space HBM operand, which Mosaic rejects)."""

    @jax.custom_batching.custom_vmap
    def f(dirs_soa, tmax_tiles, woop16, boxes):
        out_t, out_prim = _stream_pallas_call(
            dirs_soa, tmax_tiles, woop16, boxes,
            t_min=t_min, any_hit=any_hit, interpret=interpret, shared=shared,
            in_batched=(False, False, False, False), axis_size=1,
        )
        return out_t[0], out_prim[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, dirs_soa, tmax_tiles, woop16, boxes):
        out_t, out_prim = _stream_pallas_call(
            dirs_soa, tmax_tiles, woop16, boxes,
            t_min=t_min, any_hit=any_hit, interpret=interpret, shared=shared,
            in_batched=tuple(in_batched), axis_size=axis_size,
        )
        return (out_t, out_prim), (True, True)

    return f


@functools.partial(jax.jit, static_argnames=("t_min", "any_hit", "interpret", "shared"))
def _intersect_stream_packed(
    dirs_soa: Array, tmax_tiles: Array, woop16: Array, boxes: Array,
    t_min: float, any_hit: bool, interpret: bool, shared: bool = True,
):
    return _stream_fn(t_min, any_hit, interpret, shared)(
        dirs_soa, tmax_tiles, woop16, boxes
    )


def intersect_pallas_streamed(
    origin: Array,
    d: Array,
    vertices: Array,
    faces: Array,
    t_min: float = 1e-4,
    t_max: Array | float = 1e30,
    any_hit: bool = False,
    interpret: bool = False,
):
    """Shared-origin closest/any-hit for scenes beyond the SMEM-resident
    kernel's capacity; (t (N,), prim (N,))."""
    woop16, boxes = pack_woop_streamed(vertices, faces, origin)
    dirs_soa, tmax_tiles, n = pack_dirs(d, t_max)
    out_t, out_prim = _intersect_stream_packed(
        jax.lax.stop_gradient(dirs_soa),
        jax.lax.stop_gradient(tmax_tiles),
        jax.lax.stop_gradient(woop16),
        jax.lax.stop_gradient(boxes),
        t_min,
        any_hit,
        interpret,
        shared=True,
    )
    return out_t.reshape(-1)[:n], out_prim.reshape(-1)[:n]


def intersect_pallas_streamed_general(
    o: Array,
    d: Array,
    vertices: Array,
    faces: Array,
    t_min: float = 1e-4,
    t_max: Array | float = 1e30,
    any_hit: bool = False,
    interpret: bool = False,
):
    """Per-ray-origin streamed closest/any-hit for large scenes."""
    from fireflies_tpu.render.pallas.intersect_kernel import pack_rays  # noqa: PLC0415

    woop16, boxes = pack_woop_streamed(vertices, faces, None)
    rays_soa, tmax_tiles, n = pack_rays(o, d, t_max)
    out_t, out_prim = _intersect_stream_packed(
        jax.lax.stop_gradient(rays_soa),
        jax.lax.stop_gradient(tmax_tiles),
        jax.lax.stop_gradient(woop16),
        jax.lax.stop_gradient(boxes),
        t_min,
        any_hit,
        interpret,
        shared=False,
    )
    return out_t.reshape(-1)[:n], out_prim.reshape(-1)[:n]


def _kernel_stream_general_culled(
    bidx_ref, rays_ref, tmax_ref, box_ref, list_ref, count_ref, woop_hbm,
    out_t_ref, out_prim_ref, *rest, t_min, any_hit,
    woop_batched=False, boxes_batched=False, lists_batched=False,
    emit_attrs=False,
):
    """Tile-culled GENERAL-ray streamed kernel: per-ray origins (bounce
    passes on big scenes), per-tile front-to-back cluster lists from
    intersect_culled.tile_cluster_lists_general (dead rays excluded from
    the tile boxes), woop data double-buffered HBM->SMEM by list index.

    The un-culled streamed general kernel scans every cluster from every
    tile; on a bounce pass a tile's direction box spans the sphere so
    conservative culling lists most FORWARD clusters anyway, but the
    origin-distance ordering + best-t clip prune far ones, and all-dead
    tiles (retired paths) run zero DMAs.

    emit_attrs: see _kernel_stream_culled — plane normal (= Woop W2 row,
    already loaded) + material id (woop row 12) carried by 4 extra selects
    per test.
    """
    if emit_attrs:
        out_nx_ref, out_ny_ref, out_nz_ref, out_mat_ref, scratch, sems = rest
    else:
        scratch, sems = rest
    b = bidx_ref[pl.program_id(0)]

    def bx(r, c):
        return box_ref[b, r, c] if boxes_batched else box_ref[r, c]

    row = pl.program_id(1) % 8

    def listed(ci):
        return list_ref[0, row, ci] if lists_batched else list_ref[row, ci]

    n_listed = count_ref[0, row, 0] if lists_batched else count_ref[row, 0]

    ox, oy, oz = rays_ref[0], rays_ref[1], rays_ref[2]  # (16, 128)
    dx, dy, dz = rays_ref[3], rays_ref[4], rays_ref[5]
    tmax = tmax_ref[...]
    dead = tmax < 0.0

    def safe_inv(x):
        tiny = jnp.abs(x) < 1e-30
        sign = jnp.where(x < 0, -1.0, 1.0)
        return jnp.where(tiny, sign * 1e30, 1.0 / jnp.where(tiny, 1.0, x))

    inv_dx = safe_inv(dx)
    inv_dy = safe_inv(dy)
    inv_dz = safe_inv(dz)

    def dma(slot, c):
        if woop_batched:
            src = woop_hbm.at[b, :, pl.ds(c * STREAM_CHUNK, STREAM_CHUNK)]
        else:
            src = woop_hbm.at[:, pl.ds(c * STREAM_CHUNK, STREAM_CHUNK)]
        return pltpu.make_async_copy(src, scratch.at[slot], sems.at[slot])

    @pl.when(n_listed > 0)
    def _():
        dma(0, listed(0)).start()

    # Rational best-hit carry (tn, dn): see _kernel_stream.
    best_tn0 = jnp.full((SUBLANES, LANES), _BIG, jnp.float32)
    best_dn0 = jnp.ones((SUBLANES, LANES), jnp.float32)
    best_p0 = jnp.full((SUBLANES, LANES), -1, jnp.int32)
    zeros0 = jnp.zeros((SUBLANES, LANES), jnp.float32)
    state0 = (best_tn0, best_dn0, best_p0)
    if emit_attrs:
        state0 = state0 + (zeros0, zeros0, zeros0 + 1.0, zeros0)

    def cluster_body(ci, carry):
        best_tn, best_dn = carry[0], carry[1]
        best_t = best_tn / best_dn
        c = listed(ci)
        slot = ci % 2

        @pl.when(ci + 1 < n_listed)
        def _():
            dma((ci + 1) % 2, listed(ci + 1)).start()

        dma(slot, c).wait()

        t0x = (bx(0, c) - ox) * inv_dx
        t1x = (bx(3, c) - ox) * inv_dx
        t0y = (bx(1, c) - oy) * inv_dy
        t1y = (bx(4, c) - oy) * inv_dy
        t0z = (bx(2, c) - oz) * inv_dz
        t1z = (bx(5, c) - oz) * inv_dz
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
                btn, bdn, bp = carry2[0], carry2[1], carry2[2]
                w00 = scratch[slot, 0, j]
                w01 = scratch[slot, 1, j]
                w02 = scratch[slot, 2, j]
                w10 = scratch[slot, 3, j]
                w11 = scratch[slot, 4, j]
                w12 = scratch[slot, 5, j]
                w20 = scratch[slot, 6, j]
                w21 = scratch[slot, 7, j]
                w22 = scratch[slot, 8, j]
                # rows 9..11 hold (W v0)_k: o'_k = W_k . o - (W v0)_k.
                opx = w00 * ox + w01 * oy + w02 * oz - scratch[slot, 9, j]
                opy = w10 * ox + w11 * oy + w12 * oz - scratch[slot, 10, j]
                opz = w20 * ox + w21 * oy + w22 * oz - scratch[slot, 11, j]

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
                bp = jnp.where(ok, c * STREAM_CHUNK + j, bp)
                if not emit_attrs:
                    return btn, bdn, bp
                bnx = jnp.where(ok, w20, carry2[3])
                bny = jnp.where(ok, w21, carry2[4])
                bnz = jnp.where(ok, w22, carry2[5])
                bm = jnp.where(ok, scratch[slot, 12, j], carry2[6])
                return btn, bdn, bp, bnx, bny, bnz, bm

            def unrolled(jj, carry2):
                for k in range(4):
                    carry2 = tri_body(jj * 4 + k, carry2)
                return carry2

            return jax.lax.fori_loop(0, STREAM_CHUNK // 4, unrolled, carry)

        return jax.lax.cond(tile_hits, process, lambda x: x, carry)

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

    ci_fin, state = jax.lax.while_loop(while_cond, while_body, (0, state0))
    best_tn, best_dn, best_p = state[0], state[1], state[2]

    @pl.when(ci_fin < n_listed)
    def _():
        dma(ci_fin % 2, listed(ci_fin)).wait()

    out_t_ref[...] = jnp.where(best_p >= 0, best_tn / best_dn, 0.0)
    out_prim_ref[...] = best_p
    if emit_attrs:
        out_nx_ref[...] = state[3]
        out_ny_ref[...] = state[4]
        out_nz_ref[...] = state[5]
        out_mat_ref[...] = state[6].astype(jnp.int32)


def _stream_general_culled_pallas_call(
    rays_soa, tmax_tiles, woop16, boxes, *,
    t_min, any_hit, interpret, in_batched, axis_size, emit_attrs=False,
):
    """General-ray tile-culled variant of _stream_culled_pallas_call."""
    from fireflies_tpu.render.pallas.intersect_culled import (  # noqa: PLC0415
        _pad_tile_rows,
        tile_cluster_lists_general,
    )

    b_rays, b_tmax, b_woop, b_boxes = in_batched
    n_rows = rays_soa.shape[-2]
    n_tiles = n_rows // SUBLANES

    lists_batched = b_rays or b_boxes or b_tmax
    if not lists_batched:
        lists, counts = tile_cluster_lists_general(
            rays_soa, boxes, t_min=t_min, tmax_tiles=tmax_tiles
        )
    else:
        lists, counts = jax.vmap(
            lambda rr, tm, bx: tile_cluster_lists_general(
                rr, bx, t_min=t_min, tmax_tiles=tm
            ),
            in_axes=(
                0 if b_rays else None,
                0 if b_tmax else None,
                0 if b_boxes else None,
            ),
        )(rays_soa, tmax_tiles, boxes)
    lists, counts = _pad_tile_rows(lists, counts)

    kernel = functools.partial(
        _kernel_stream_general_culled, t_min=t_min, any_hit=any_hit,
        woop_batched=b_woop, boxes_batched=b_boxes, lists_batched=lists_batched,
        emit_attrs=emit_attrs,
    )
    if b_rays:
        rays_spec = pl.BlockSpec(
            (None, 6, SUBLANES, LANES), lambda b, i: (b, 0, i, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        rays_spec = pl.BlockSpec(
            (6, SUBLANES, LANES), lambda b, i: (0, i, 0),
            memory_space=pltpu.VMEM,
        )
    if b_tmax:
        tmax_spec = pl.BlockSpec(
            (None, SUBLANES, LANES), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        )
    else:
        tmax_spec = pl.BlockSpec(
            (SUBLANES, LANES), lambda b, i: (i, 0), memory_space=pltpu.VMEM
        )
    nc = lists.shape[-1]
    if lists_batched:
        list_spec = pl.BlockSpec(
            (1, 8, nc), lambda b, i: (b, i // 8, 0), memory_space=pltpu.SMEM
        )
        count_spec = pl.BlockSpec(
            (1, 8, 1), lambda b, i: (b, i // 8, 0), memory_space=pltpu.SMEM
        )
    else:
        list_spec = pl.BlockSpec(
            (8, nc), lambda b, i: (i // 8, 0), memory_space=pltpu.SMEM
        )
        count_spec = pl.BlockSpec(
            (8, 1), lambda b, i: (i // 8, 0), memory_space=pltpu.SMEM
        )
    boxes_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    bidx = jnp.arange(axis_size, dtype=jnp.int32)  # (B,)
    n_out = 6 if emit_attrs else 2
    ray_spec = pl.BlockSpec(
        (None, SUBLANES, LANES), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    out_dtypes = [jnp.float32, jnp.int32]
    if emit_attrs:
        out_dtypes += [jnp.float32, jnp.float32, jnp.float32, jnp.int32]
    outs = pl.pallas_call(
        kernel,
        grid=(axis_size, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # bidx
            rays_spec,
            tmax_spec,
            boxes_spec,
            list_spec,
            count_spec,
            pl.BlockSpec(memory_space=pl.ANY),  # woop stays in HBM
        ],
        out_specs=[ray_spec] * n_out,
        out_shape=[
            jax.ShapeDtypeStruct((axis_size, n_rows, LANES), dt)
            for dt in out_dtypes
        ],
        scratch_shapes=[
            pltpu.SMEM((2, 16, STREAM_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(bidx, rays_soa, tmax_tiles, boxes, lists, counts, woop16)
    return tuple(outs)


@functools.lru_cache(maxsize=None)
def _stream_general_culled_fn(
    t_min: float, any_hit: bool, interpret: bool, emit_attrs: bool = False
):
    """custom_vmap wrapper (cf. _stream_culled_fn), general rays."""

    @jax.custom_batching.custom_vmap
    def f(rays_soa, tmax_tiles, woop16, boxes):
        outs = _stream_general_culled_pallas_call(
            rays_soa, tmax_tiles, woop16, boxes,
            t_min=t_min, any_hit=any_hit, interpret=interpret,
            in_batched=(False, False, False, False), axis_size=1,
            emit_attrs=emit_attrs,
        )
        return tuple(o[0] for o in outs)

    @f.def_vmap
    def _rule(axis_size, in_batched, rays_soa, tmax_tiles, woop16, boxes):
        outs = _stream_general_culled_pallas_call(
            rays_soa, tmax_tiles, woop16, boxes,
            t_min=t_min, any_hit=any_hit, interpret=interpret,
            in_batched=tuple(in_batched), axis_size=axis_size,
            emit_attrs=emit_attrs,
        )
        return tuple(outs), (True,) * len(outs)

    return f


@functools.partial(
    jax.jit, static_argnames=("t_min", "any_hit", "interpret", "emit_attrs")
)
def _intersect_stream_general_culled_packed(
    rays_soa: Array, tmax_tiles: Array, woop16: Array, boxes: Array,
    t_min: float, any_hit: bool, interpret: bool, emit_attrs: bool = False,
):
    return _stream_general_culled_fn(t_min, any_hit, interpret, emit_attrs)(
        rays_soa, tmax_tiles, woop16, boxes
    )


def intersect_pallas_streamed_general_culled(
    o: Array,
    d: Array,
    vertices: Array,
    faces: Array,
    t_min: float = 1e-4,
    t_max: Array | float = 1e30,
    any_hit: bool = False,
    interpret: bool = False,
    face_mat: Array | None = None,
):
    """Tile-culled per-ray-origin streamed closest/any-hit for large scenes
    (the bounce pass at 10k+ faces).

    With `face_mat`, returns (t, prim, nx, ny, nz, mat): kernel-emitted
    plane normals + material ids (see Hit docstring)."""
    from fireflies_tpu.render.pallas.intersect_kernel import pack_rays  # noqa: PLC0415

    emit_attrs = face_mat is not None
    woop16, boxes = pack_woop_streamed(vertices, faces, None, face_mat)
    rays_soa, tmax_tiles, n = pack_rays(o, d, t_max)
    outs = _intersect_stream_general_culled_packed(
        jax.lax.stop_gradient(rays_soa),
        jax.lax.stop_gradient(tmax_tiles),
        jax.lax.stop_gradient(woop16),
        jax.lax.stop_gradient(boxes),
        t_min,
        any_hit,
        interpret,
        emit_attrs,
    )
    return tuple(o.reshape(-1)[:n] for o in outs)

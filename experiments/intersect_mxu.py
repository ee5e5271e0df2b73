"""EXPERIMENTAL: MXU matmul-based ray/triangle intersection.

STATUS: not wired into the renderer.  On real v5e hardware this lowers
pathologically (340s+ Mosaic compile, ~40x slower than the scalar v1 kernel
even at tiny sizes — the in-loop (8,128)x(8,128) HIGHEST-precision matmuls
plus (128,128) loop carries do not map to anything the compiler schedules
well).  Kept as a documented negative result + starting point for a future
rework (e.g. hoisting matmuls out of the chunk loop); correctness is fully
cross-checked in tests via interpret mode.

v2 of the Pallas intersection path.  The v1 kernel's cost is dominated by
per-triangle SMEM scalar loads (~300 cycles/triangle); here the per-pair
Woop transform d' = W d for a whole (128 rays x 128 triangles) block is
THREE K=8 matmuls on the MXU, and every per-triangle constant enters as a
lane-aligned (1, 128) vector — no scalar loads in the inner loop at all.

Layout (per ray tile of 2048 rays = 16 rowblocks):
  dirs   (R/128, 8, 128): K-slot-major — rows [dx, dy, dz, 0...], rays in
         lanes.  dot_general(DT, W_k, contract sublanes) -> (128, 128) with
         rays in SUBLANES and triangles in LANES.
  w      (NC, 3, 8, 128): W_k rows per cluster (k = output component).
  op     (NC, 8, 128): o' = W(o - v0) per-tri constants (rows 0..2 used).
  boxes  (6, NC) SMEM: cluster AABBs shifted by -origin (slab test on
         (1, 128) per rowblock).

Intersection per pair:  t = -o'_z / d'_z,  u = o'_x + t d'_x,
v = o'_y + t d'_y; best (t, id) carried as (128, 128) registers, reduced
over lanes once per rowblock.  Per-ray t_max is applied post-reduction
(valid for closest-hit AND any-hit: the closest hit decides both).

Matmul precision HIGH (bf16_3x ~ f32 quality) — geometry needs more than
one bf16 pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fireflies_tpu.render.pallas.intersect_kernel import LANES, RAY_TILE, SUBLANES, _BIG

Array = jax.Array

MXU_CHUNK = 128  # triangles per cluster (matmul lane width)
_EPS_BARY = 1e-6
_INT_BIG = 2**30


def pack_mxu_shared(vertices: Array, faces: Array, origin: Array):
    """Precompute (w (NC,3,8,128), op (NC,8,128), boxes (6,NC))."""
    v0 = vertices[faces[:, 0]]
    v1 = vertices[faces[:, 1]]
    v2 = vertices[faces[:, 2]]
    e1 = v1 - v0
    e2 = v2 - v0
    n = jnp.cross(e1, e2)
    det = jnp.sum(n * n, axis=-1, keepdims=True)
    zero = det < 1e-18
    safe = jnp.where(zero, 1.0, det)
    w0 = jnp.where(zero, 0.0, jnp.cross(e2, n) / safe)
    w1 = jnp.where(zero, 0.0, jnp.cross(n, e1) / safe)
    w2 = jnp.where(zero, 0.0, n / safe)
    rel = origin[None, :] - v0
    op = jnp.stack(
        [jnp.sum(w0 * rel, -1), jnp.sum(w1 * rel, -1), jnp.sum(w2 * rel, -1)], axis=-1
    )  # (F, 3)

    f = v0.shape[0]
    n_chunks = -(-f // MXU_CHUNK)
    fpad = n_chunks * MXU_CHUNK

    def pad(x, fill=0.0):
        return jnp.concatenate(
            [x, jnp.full((fpad - f, x.shape[1]), fill, x.dtype)], axis=0
        ) if fpad != f else x

    wk = jnp.stack([pad(w0), pad(w1), pad(w2)])  # (3, Fpad, 3)
    # -> (NC, 3 out-comps, 8 K-slots, 128 tris); K rows 0..2 hold W columns.
    wk = wk.reshape(3, n_chunks, MXU_CHUNK, 3)
    w_packed = jnp.zeros((n_chunks, 3, 8, MXU_CHUNK), jnp.float32)
    w_packed = w_packed.at[:, :, :3, :].set(jnp.transpose(wk, (1, 0, 3, 2)))

    opp = pad(op)  # (Fpad, 3)
    op_packed = jnp.zeros((n_chunks, 8, MXU_CHUNK), jnp.float32)
    op_packed = op_packed.at[:, :3, :].set(
        jnp.transpose(opp.reshape(n_chunks, MXU_CHUNK, 3), (0, 2, 1))
    )

    fmin = jnp.minimum(jnp.minimum(v0, v1), v2) - origin[None, :]
    fmax = jnp.maximum(jnp.maximum(v0, v1), v2) - origin[None, :]
    if fpad != f:
        fmin = jnp.concatenate([fmin, jnp.full((fpad - f, 3), _BIG)], axis=0)
        fmax = jnp.concatenate([fmax, jnp.full((fpad - f, 3), -_BIG)], axis=0)
    cmin = jnp.min(fmin.reshape(n_chunks, MXU_CHUNK, 3), axis=1)
    cmax = jnp.max(fmax.reshape(n_chunks, MXU_CHUNK, 3), axis=1)
    boxes = jnp.concatenate([cmin, cmax], axis=1).T  # (6, NC)
    return w_packed, op_packed, boxes


def pack_dirs_k8(d: Array, t_max) -> tuple[Array, Array, int]:
    """(N,3) dirs -> ((R/128, 8, 128) K-slot layout, (R/128,128) tmax, N)."""
    n = d.shape[0]
    r = -(-n // RAY_TILE) * RAY_TILE
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if r != n:
        d = jnp.concatenate([d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (r - n, 1))])
        t_max = jnp.concatenate([t_max, jnp.full((r - n,), -1.0, jnp.float32)])
    dirs = jnp.zeros((r // LANES, 8, LANES), jnp.float32)
    comps = d.T.reshape(3, r // LANES, LANES)  # (3, rows, 128)
    dirs = dirs.at[:, :3, :].set(jnp.transpose(comps, (1, 0, 2)))
    return dirs, t_max.reshape(r // LANES, LANES), n


def _kernel_mxu(
    dirs_ref, tmax_ref, w_ref, op_ref, box_ref, out_t_ref, out_prim_ref,
    *, t_min, n_chunks, any_hit,
):
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    prec = jax.lax.Precision.HIGHEST

    def rowblock(r, _):
        dt = dirs_ref[r]  # (8, 128): rows dx, dy, dz
        dx = dt[0:1, :]
        dy = dt[1:2, :]
        dz = dt[2:3, :]

        def safe_inv(x):
            tiny = jnp.abs(x) < 1e-30
            sign = jnp.where(x < 0, -1.0, 1.0)
            return jnp.where(tiny, sign * 1e30, 1.0 / jnp.where(tiny, 1.0, x))

        inv_dx = safe_inv(dx)
        inv_dy = safe_inv(dy)
        inv_dz = safe_inv(dz)

        best_t0 = jnp.full((LANES, LANES), _BIG, jnp.float32)
        best_id0 = jnp.full((LANES, LANES), _INT_BIG, jnp.int32)

        def chunk_body(c, carry):
            best_t, best_id = carry
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
                jnp.maximum(t0z, t1z),
            )
            hit_any = jnp.any(tnear <= tfar)

            def process(carry):
                best_t, best_id = carry
                wv = w_ref[c]  # (3, 8, 128)
                dp0 = jax.lax.dot_general(
                    dt, wv[0], (((0,), (0,)), ((), ())), precision=prec,
                    preferred_element_type=jnp.float32,
                )  # (128 rays, 128 tris)
                dp1 = jax.lax.dot_general(
                    dt, wv[1], (((0,), (0,)), ((), ())), precision=prec,
                    preferred_element_type=jnp.float32,
                )
                dp2 = jax.lax.dot_general(
                    dt, wv[2], (((0,), (0,)), ((), ())), precision=prec,
                    preferred_element_type=jnp.float32,
                )
                opv = op_ref[c]  # (8, 128)
                opx = opv[0:1, :]
                opy = opv[1:2, :]
                opz = opv[2:3, :]

                tiny = jnp.abs(dp2) < 1e-12
                invz = jnp.where(tiny, 0.0, 1.0 / jnp.where(tiny, 1.0, dp2))
                t = -opz * invz
                u = opx + t * dp0
                v = opy + t * dp1
                ok = (
                    ~tiny
                    & (u >= -_EPS_BARY)
                    & (v >= -_EPS_BARY)
                    & (u + v <= 1.0 + _EPS_BARY)
                    & (t > t_min)
                    & (t < best_t)
                )
                ids = lane_ids + c * MXU_CHUNK
                best_t = jnp.where(ok, t, best_t)
                best_id = jnp.where(ok, ids, best_id)
                return best_t, best_id

            return jax.lax.cond(hit_any, process, lambda x: x, (best_t, best_id))

        best_t, best_id = jax.lax.fori_loop(0, n_chunks, chunk_body, (best_t0, best_id0))

        # Lane reduction: per-ray closest over the 128 lane slots.
        m = jnp.min(best_t, axis=1, keepdims=True)  # (128, 1)
        idm = jnp.min(
            jnp.where(best_t == m, best_id, _INT_BIG), axis=1, keepdims=True
        )
        tmax_col = jnp.swapaxes(tmax_ref[pl.ds(r, 1), :], 0, 1)  # (128, 1)
        valid = (idm < _INT_BIG) & (m < tmax_col)
        t_col = jnp.where(valid, m, 0.0)
        id_col = jnp.where(valid, idm, -1)
        out_t_ref[pl.ds(r, 1), :] = jnp.swapaxes(t_col, 0, 1)
        out_prim_ref[pl.ds(r, 1), :] = jnp.swapaxes(id_col, 0, 1)
        return 0

    jax.lax.fori_loop(0, SUBLANES, rowblock, 0)


@functools.partial(jax.jit, static_argnames=("t_min", "any_hit", "interpret"))
def _intersect_mxu_packed(
    dirs: Array, tmax_tiles: Array, w: Array, op: Array, boxes: Array,
    t_min: float, any_hit: bool, interpret: bool,
):
    n_rows = dirs.shape[0]
    n_tiles = n_rows // SUBLANES
    n_chunks = boxes.shape[1]
    kernel = functools.partial(
        _kernel_mxu, t_min=t_min, n_chunks=n_chunks, any_hit=any_hit
    )
    out_t, out_prim = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((SUBLANES, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(op.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
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
    )(dirs, tmax_tiles, w, op, boxes)
    return out_t, out_prim


def intersect_mxu_shared(
    origin: Array,
    d: Array,
    vertices: Array,
    faces: Array,
    t_min: float = 1e-4,
    t_max: Array | float = 1e30,
    any_hit: bool = False,
    interpret: bool = False,
):
    """Shared-origin closest-hit via the MXU kernel; (t (N,), prim (N,))."""
    w, op, boxes = pack_mxu_shared(vertices, faces, origin)
    dirs, tmax_tiles, n = pack_dirs_k8(d, t_max)
    out_t, out_prim = _intersect_mxu_packed(
        jax.lax.stop_gradient(dirs),
        jax.lax.stop_gradient(tmax_tiles),
        jax.lax.stop_gradient(w),
        jax.lax.stop_gradient(op),
        jax.lax.stop_gradient(boxes),
        t_min,
        any_hit,
        interpret,
    )
    return out_t.reshape(-1)[:n], out_prim.reshape(-1)[:n]

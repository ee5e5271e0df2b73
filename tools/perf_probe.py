"""Honest TPU perf probe: kernel-level and step-level budgets.

Protocol (CLAUDE.md "MEASUREMENT TRUTH"):
  * ONE early device->host read at process start flips the axon tunnel into
    eager execution (without it, dispatches are lazily captured and timings
    are fiction).
  * Repeats run INSIDE a jitted lax.scan so the tunnel's per-dispatch
    overhead (tens of ms) is paid once per measurement, not per iteration.
  * Every timed region ends with a host readback that data-depends on all
    timed work.

Usage: python tools/perf_probe.py kernel|hitfrac|step|roofline|all [out.json]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fireflies_tpu.assets import scenes as ff_scenes
from fireflies_tpu.projection import laser as laser_mod
from fireflies_tpu.render import RenderConfig, SceneBridge, render_rgb
from fireflies_tpu.render.rays import camera_rays_tiled

RESULTS: dict[str, dict] = {}


def _emit(name: str, **kw):
    RESULTS[name] = kw
    print(json.dumps({"probe": name, **kw}), flush=True)


def timed_scan(op, x0, n_iter: int) -> float:
    """Seconds per op, measured as one dispatch of lax.scan(op, n_iter) ending
    in a host readback.  op: pytree -> same-structure pytree (data-dependent).
    """

    @jax.jit
    def run(x):
        def body(c, _):
            return op(c), None

        out, _ = jax.lax.scan(body, x, None, length=n_iter)
        return jax.tree.map(lambda l: jnp.sum(l.astype(jnp.float32)), out)

    warm = run(x0)  # compile + warm
    s = sum(float(v) for v in jax.tree.leaves(warm))
    assert s == s, "NaN checksum"
    best = None
    for _ in range(int(os.environ.get("PROBE_TRIALS", 2))):
        t0 = time.perf_counter()
        out = run(x0)
        s = sum(float(v) for v in jax.tree.leaves(out))  # D2H readback
        dt = time.perf_counter() - t0
        assert s == s
        best = dt if best is None else min(best, dt)
    return best / n_iter


def _scene(resolution: int):
    scene, kw = ff_scenes.vocalfold(resolution=resolution, n_anim_frames=4)
    bridge = SceneBridge(scene, **kw)
    randomize = scene.compile()
    rs = jax.jit(lambda k: bridge.assemble(dict(randomize(k, 0))))(jax.random.key(0))
    return rs, bridge, randomize


def probe_kernel(size=512, n_iter=30):
    """Kernel-level timings: resident vs streamed vs culled, per pass kind."""
    from fireflies_tpu.render.pallas.intersect_culled import (
        intersect_pallas_shared_culled,
    )
    from fireflies_tpu.render.pallas.intersect_kernel import (
        intersect_pallas,
        intersect_pallas_shared,
    )
    from fireflies_tpu.render.pallas.intersect_stream import (
        intersect_pallas_streamed,
    )

    which = os.environ.get("PROBE_KERNELS", "res,culled,culled16,stream,general")
    res_list = tuple(
        int(r) for r in os.environ.get("PROBE_RES", "24,75,160").split(",")
    )
    for resolution in res_list:
        rs, _, _ = _scene(resolution)
        n_faces = int(rs.geometry.faces.shape[0])
        o, d, _inv = camera_rays_tiled(rs.camera, size, size, key=jax.random.key(1))
        cam = rs.camera.to_world[:3, 3]
        verts, faces = rs.geometry.vertices, rs.geometry.faces
        n_rays = d.shape[0]
        resident_ok = n_faces <= 20000

        variants: list[tuple[str, object]] = []
        if "res" in which and resident_ok:
            variants.append((
                "resident",
                lambda dd: intersect_pallas_shared(cam, dd, verts, faces)[0],
            ))
        if "culled" in which and resident_ok:
            variants.append((
                "culled64",
                lambda dd: intersect_pallas_shared_culled(
                    cam, dd, verts, faces, chunk=64
                )[0],
            ))
        if "culled16" in which and resident_ok:
            variants.append((
                "culled16",
                lambda dd: intersect_pallas_shared_culled(
                    cam, dd, verts, faces, chunk=16
                )[0],
            ))
        if "stream" in which:
            variants.append((
                "streamed",
                lambda dd: intersect_pallas_streamed(cam, dd, verts, faces)[0],
            ))
        if "streamculled" in which:
            from fireflies_tpu.render.pallas.intersect_stream import (
                intersect_pallas_streamed_culled,
            )

            variants.append((
                "stream_culled",
                lambda dd: intersect_pallas_streamed_culled(
                    cam, dd, verts, faces
                )[0],
            ))
        if "general" in which and resident_ok:
            # bounce-like incoherent load: origins at primary hits (tile-
            # coherent), directions hemisphere-random
            from fireflies_tpu.render.intersect import closest_hit

            hit = jax.jit(
                lambda d: closest_hit(None, d, rs.geometry, shared_origin=cam)
            )(d)
            p = o + d * jnp.where(hit.valid, hit.t, 1.0)[:, None]
            dr = jax.random.normal(jax.random.key(2), d.shape)
            dr = dr / jnp.linalg.norm(dr, axis=-1, keepdims=True)
            variants.append((
                "general_bounce",
                lambda dd: intersect_pallas(p, dd, verts, faces)[0],
            ))
            # Bigger cluster chunks cut the serial slab-scan count (the
            # dominant general-pass cost at small scenes: ~0.35us per
            # (cluster, tile) iteration) at the price of coarser boxes —
            # irrelevant for bounce rays whose tiles can't cull anyway.
            for ch in (32, 64, 128):
                variants.append((
                    f"general_bounce_c{ch}",
                    functools.partial(
                        lambda dd, _c: intersect_pallas(
                            p, dd, verts, faces, chunk=_c
                        )[0],
                        _c=ch,
                    ),
                ))
            d_general = dr
        if "genculled" in which and resident_ok:
            from fireflies_tpu.render.intersect import closest_hit
            from fireflies_tpu.render.pallas.intersect_culled import (
                intersect_pallas_general_culled,
            )

            hit = jax.jit(
                lambda d: closest_hit(
                    None, d, rs.geometry, shared_origin=cam, backend="jax"
                )
            )(d)
            p = o + d * jnp.where(hit.valid, hit.t, 1.0)[:, None]
            dr = jax.random.normal(jax.random.key(2), d.shape)
            dr = dr / jnp.linalg.norm(dr, axis=-1, keepdims=True)
            for ch in (16, 64):
                variants.append((
                    f"general_culled{ch}",
                    functools.partial(
                        lambda dd, _c: intersect_pallas_general_culled(
                            p, dd, verts, faces, chunk=_c
                        )[0],
                        _c=ch,
                    ),
                ))
            d_general = dr
        for name, fn in variants:
            dd0 = d_general if name.startswith("general") else d

            def op(dd, _fn=fn):
                t = _fn(dd)
                return dd + 1e-24 * t[:, None]

            dt = timed_scan(op, dd0, n_iter)
            _emit(
                f"kernel_r{resolution}_{name}",
                faces=n_faces, rays=n_rays, ms=round(dt * 1e3, 3),
                mray_s=round(n_rays / dt / 1e6, 1),
            )


def probe_hitfrac(size=512):
    from fireflies_tpu.render.intersect import closest_hit

    for resolution in (24, 160):
        rs, _, _ = _scene(resolution)
        o, d, _inv = camera_rays_tiled(rs.camera, size, size, key=jax.random.key(1))
        cam = rs.camera.to_world[:3, 3]
        hit = jax.jit(
            lambda d: closest_hit(None, d, rs.geometry, shared_origin=cam).valid
        )(d)
        frac = float(jnp.mean(hit.astype(jnp.float32)))
        # per-tile stats: fraction of 2048-ray tiles fully inactive
        tiles = hit.reshape(-1, 2048)
        tile_any = jnp.any(tiles, axis=1)
        _emit(
            f"hitfrac_r{resolution}",
            hit_frac=round(frac, 4),
            tiles_active=round(float(jnp.mean(tile_any.astype(jnp.float32))), 4),
        )


def _step_fn(bridge, randomize, cfg, batch):
    """The bench.py unit of work as a rays->rays op (for timed_scan).

    FF_PROBE_ANALYTIC=1 probes the analytic beam-splat projector route
    (bench.py's headline) instead of the rasterized-texture route.
    """
    rays0 = laser_mod.generate_uniform_rays(0.0275, 12, 12)
    analytic = bool(int(os.environ.get("FF_PROBE_ANALYTIC", 0)))

    def loss(rays, key):
        if analytic:
            extra = laser_mod.rays_to_beam_params(
                rays, 30.0, sigma=10.0, texture_size=(256, 256)
            )
        else:
            extra = {"tex.data": laser_mod.rays_to_texture_rgb(
                rays, 30.0, sigma=10.0, texture_size=(256, 256), blur_kernel=0
            )}

        def one(k):
            params = dict(randomize(k, 0))
            params.update(extra)
            return jnp.mean(render_rgb(bridge.assemble(params), k, cfg))

        return jnp.mean(jax.vmap(one)(jax.random.split(key, batch)))

    return rays0, loss


def probe_step(size=512, batch=16, n_iter=8):
    """Step-level phase bisection.  Env knobs are read at TRACE time, so each
    variant re-traces a fresh function after mutating os.environ.

    FF_PROBE_RESOLUTION sets the vocalfold mesh resolution (default 24 =
    1.4k faces; 75 = 11.5k, the reference-realistic size); FF_PROBE_SPP
    sets samples per pixel (default 1); FF_PROBE_COHERENT=1 probes the
    tile-coherent bounce-sampling mode (bench BENCH_COHERENT)."""
    rs, bridge, randomize = _scene(int(os.environ.get("FF_PROBE_RESOLUTION", 24)))
    cfg = RenderConfig(
        width=size, height=size,
        spp=int(os.environ.get("FF_PROBE_SPP", 1)), max_bounces=2,
        coherent_bounce=bool(int(os.environ.get("FF_PROBE_COHERENT", 0))),
        static_geometry=bool(int(os.environ.get("FF_PROBE_STATIC_GEOM", 0))),
    )

    variants = [
        ("full", {}, True),
        ("fwd_only", {}, False),
        ("no_occl", {"FF_SKIP_OCCL": "1"}, True),
        ("no_nee", {"FF_SKIP_NEE": "1"}, True),
        ("nee_const_rad", {"FF_NEE_CONST_RAD": "1"}, True),
        ("nee_const_f", {"FF_NEE_CONST_F": "1"}, True),
        ("b1_fake_hit", {"FF_B1_FAKE_HIT": "1"}, True),
        ("fake_attrs", {"FF_FAKE_ATTRS": "1"}, True),
        ("attrs_gather_only", {"FF_ATTRS_GATHER_ONLY": "1"}, True),
        ("no_basetex", {"FF_NO_BASETEX": "1"}, True),
        ("const_sample", {"FF_CONST_SAMPLE": "1"}, True),
        ("bounces1", {"_BOUNCES": "1"}, True),
    ]
    knob_names = [
        "FF_SKIP_OCCL", "FF_SKIP_NEE", "FF_NEE_CONST_RAD",
        "FF_NEE_CONST_F", "FF_B1_FAKE_HIT", "FF_FAKE_ATTRS",
        "FF_ATTRS_GATHER_ONLY", "FF_NO_BASETEX", "FF_CONST_SAMPLE",
    ]
    # FF_PROBE_VARIANTS="full,no_occl" runs a subset (each variant is a
    # fresh trace + 60-300s tunnel compile; the full list costs ~30 min).
    only = os.environ.get("FF_PROBE_VARIANTS")
    if only:
        # "full" is always kept: frac_of_full is meaningless without its
        # baseline (it used to silently report 1.0 for every variant).
        keep = {v.strip() for v in only.split(",")} | {"full"}
        variants = [v for v in variants if v[0] in keep]
    base = None
    for name, env, with_grad in variants:
        for k in knob_names:
            os.environ.pop(k, None)
        os.environ.update({k: v for k, v in env.items() if not k.startswith("_")})
        cfg_v = cfg.replace(max_bounces=int(env.get("_BOUNCES", 2)))
        rays0, loss = _step_fn(bridge, randomize, cfg_v, batch)
        if with_grad:
            g = jax.grad(loss)

            def op(r, _g=g):
                return r + 1e-20 * _g(r, jax.random.key(0))
        else:

            def op(r, _l=loss):
                return r + 1e-20 * _l(r, jax.random.key(0))

        dt = timed_scan(op, rays0, n_iter)
        if name == "full":
            base = dt
        _emit(
            f"step_{name}",
            ms=round(dt * 1e3, 1),
            renders_s=round(batch / dt, 2),
            frac_of_full=round(dt / base, 3) if base else 1.0,
        )
    for k in knob_names:
        os.environ.pop(k, None)


def probe_roofline(size=512, n_iter=20):
    """MFU/roofline accounting (VERDICT r3 weak #3): per-pass achieved
    FLOP/s and bytes/s as a fraction of MEASURED same-session hardware
    roofs, so the headline renders/sec gets a denominator.

    Roofs are measured, not quoted: the axon tunnel's delivered throughput
    drifts up to 30x between sessions, so a published peak (v5e-1: 819 GB/s
    HBM, ~197 bf16 MXU TFLOP/s) is not what this session can reach.  Four
    microbenchmarks run first:

      * vpu_roof:    Pallas kernel, 64 unrolled product-tree rounds on a
        VMEM-resident 1 MiB block (XLA-level attempts understate: see
        inline comment);
      * hbm_roof:    elementwise add over a 256 MiB array (read + write);
      * gather_roof: rows/sec of a 4M-row packed gather (the per-row-bound
        cost that dominates attribute fetch — CLAUDE.md kernel facts);
      * kernel_roof: EXACT ray-triangle tests/sec of the intersection
        inner loop on a synthetic no-early-out workload (triangles
        parallel to all rays, every cluster slab-visible to every tile).

    Per-pass accounting is honest about what is countable: the tile-cull
    cluster lists give the number of (tile, cluster) pairs ENQUEUED, an
    UPPER BOUND on executed tests (in-kernel slab conds + best-t early
    termination also skip), so passes report
    x_kernel_roof_if_no_earlyout = listed-tests-rate / kernel_roof.
    A value <= 1.0 is the true fraction of peak inner-loop issue rate; a
    value > 1.0 quantifies how much work the in-kernel early-outs are
    eliding (it is not a physical throughput).
    """
    from jax.experimental import pallas as pl

    from fireflies_tpu.render.pallas.intersect_culled import (
        intersect_pallas_shared_culled,
        tile_cluster_lists,
        tile_cluster_lists_general,
    )
    from fireflies_tpu.render.pallas.intersect_kernel import (
        LANES,
        SUBLANES,
        intersect_pallas,
        pack_dirs,
        pack_triangles_woop,
    )

    flops_per_test = 36.0
    rays_per_tile = SUBLANES * LANES

    # --- measured roofs (same session as the passes) ----------------------
    # VPU roof microbench: a Pallas kernel holding a 1 MiB block in VMEM
    # and running 64 unrolled rounds of a width-4 product tree on it.
    # XLA-level attempts all understate the roof: a bare serial FMA chain
    # is LATENCY-bound (364 GFLOP/s), 8 small streams defeat fusion
    # (52 GFLOP/s), and a fused product tree over a 4M array still pays
    # HBM per round when XLA declines to fuse the 16-round chain
    # (587 GFLOP/s ~= the HBM bound for 16 round-trips).  VMEM-resident
    # work is the only honest issue-rate measurement.  Constants keep
    # x ~ 1 so the chain neither folds nor overflows.
    vpu_rounds, vsub, vln, vgrid = 64, 256, 1024, 8

    def _vpu_kernel(x_ref, o_ref):
        x = x_ref[...]
        for _ in range(vpu_rounds):
            t1 = x * 0.501 + 0.499
            t2 = x * 0.502 + 0.498
            t3 = x * 0.497 + 0.503
            t4 = x * 0.5 + 0.5
            x = (t1 * t2 + t3 * t4) * 0.5
        o_ref[...] = x

    vpu_call = pl.pallas_call(
        _vpu_kernel,
        grid=(vgrid,),
        in_specs=[pl.BlockSpec((vsub, vln), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((vsub, vln), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((vgrid * vsub, vln), jnp.float32),
    )
    dt = timed_scan(vpu_call, jnp.ones((vgrid * vsub, vln), jnp.float32),
                    n_iter)
    vpu_roof = vpu_rounds * 12.0 * vgrid * vsub * vln / dt  # FLOP/s
    _emit("roofline_vpu_roof", gflops=round(vpu_roof / 1e9, 1),
          ms=round(dt * 1e3, 3))

    n_hbm = 64 * 1024 * 1024  # 256 MiB f32

    def hbm_op(x):
        return x + 1.0

    dt = timed_scan(hbm_op, jnp.ones(n_hbm, jnp.float32), n_iter)
    hbm_roof = 8.0 * n_hbm / dt  # bytes/s (read + write)
    _emit("roofline_hbm_roof", gbytes_s=round(hbm_roof / 1e9, 1),
          ms=round(dt * 1e3, 3))

    n_rows_g, width_g = 4 * 1024 * 1024, 8
    table = jnp.arange(n_rows_g * width_g, dtype=jnp.float32).reshape(
        n_rows_g, width_g)
    idx0 = jax.random.randint(jax.random.key(0), (n_rows_g,), 0, n_rows_g)

    def gather_op(idx):
        g = table[idx]
        # data-dependent next index so scan iterations can't overlap
        return (idx + g[:, 0].astype(jnp.int32)) % n_rows_g

    dt = timed_scan(gather_op, idx0, max(n_iter // 4, 4))
    gather_rows_s = n_rows_g / dt
    _emit("roofline_gather_roof", mrows_s=round(gather_rows_s / 1e6, 1),
          ms=round(dt * 1e3, 3),
          eff_gbytes_s=round(n_rows_g * width_g * 4 / dt / 1e9, 2))

    # --- kernel roof: exact issue rate of the ray-triangle inner loop -----
    # The per-pass test counts below come from the tile cluster LISTS and
    # are upper bounds (the kernel also skips listed clusters via per-tile
    # slab conds and best-t early termination), so FLOP/s derived from them
    # can legitimately exceed any hardware roof.  The honest denominator is
    # the SAME inner loop on a synthetic workload where nothing can be
    # skipped: triangles parallel to every ray (zero MT determinant -> no
    # hit -> best-t never tightens) packed in a tight box on the beam axis
    # so every cluster's slab test passes for every tile.  The kernel then
    # executes exactly R x F tests.
    import numpy as _np

    f_roof = 4096
    _rng = _np.random.default_rng(0)
    _c = _rng.uniform(-0.1, 0.1, (f_roof, 3))
    _c[:, 2] = _rng.uniform(-5.5, -4.5, f_roof)
    _e2 = _rng.uniform(-0.01, 0.01, (f_roof, 3))
    _e2[:, 2] = 0.0
    v_roof = jnp.asarray(_np.concatenate(
        [_c, _c + _np.array([0.0, 0.0, 0.02]), _c + _e2]), jnp.float32)
    f_idx = jnp.arange(3 * f_roof, dtype=jnp.int32).reshape(3, f_roof).T
    n_roof = 256 * 1024
    _uv = _rng.uniform(-1e-3, 1e-3, (n_roof, 2))
    d_roof = jnp.asarray(_np.concatenate(
        [_uv, -_np.ones((n_roof, 1))], axis=1), jnp.float32)
    d_roof = d_roof / jnp.linalg.norm(d_roof, axis=-1, keepdims=True)

    def roof_op(dd):
        t = intersect_pallas(jnp.zeros((n_roof, 3), jnp.float32), dd,
                             v_roof, f_idx)[0]
        return dd + 1e-24 * t[:, None]

    dt = timed_scan(roof_op, d_roof, max(n_iter // 4, 4))
    kernel_roof_tests_s = n_roof * f_roof / dt
    _emit("roofline_kernel_roof",
          gtests_s=round(kernel_roof_tests_s / 1e9, 2),
          ms=round(dt * 1e3, 3),
          eff_gflops_s=round(kernel_roof_tests_s * flops_per_test / 1e9, 1))

    # --- per-pass accounting ----------------------------------------------
    for resolution in (24, 75):
        rs, _, _ = _scene(resolution)
        n_faces = int(rs.geometry.faces.shape[0])
        o, d, _inv = camera_rays_tiled(rs.camera, size, size,
                                       key=jax.random.key(1))
        cam = rs.camera.to_world[:3, 3]
        verts, faces = rs.geometry.vertices, rs.geometry.faces
        n_rays = d.shape[0]

        for pass_name, chunk in (("primary_culled16", 16),):
            woop, boxes = pack_triangles_woop(verts, faces, cam, chunk=chunk)
            dirs_soa, tmax_tiles, _n = pack_dirs(d, 1e30)
            _lists, counts = tile_cluster_lists(dirs_soa, boxes,
                                                tmax_tiles=tmax_tiles)
            tests = float(jnp.sum(counts)) * chunk * rays_per_tile
            slab_pairs = float(jnp.sum(counts))

            def op(dd):
                t = intersect_pallas_shared_culled(
                    cam, dd, verts, faces, chunk=16)[0]
                return dd + 1e-24 * t[:, None]

            dt = timed_scan(op, d, n_iter)
            _emit(
                f"roofline_r{resolution}_{pass_name}",
                faces=n_faces, ms=round(dt * 1e3, 3),
                mray_s=round(n_rays / dt / 1e6, 1),
                listed_tests_per_ray=round(tests / n_rays, 1),
                # listed tests are an UPPER BOUND (in-kernel slab conds +
                # best-t early-outs also skip); the ratio vs the exact
                # kernel roof quantifies how much the early-outs save:
                # <= 1.0 means the pass runs the inner loop at that
                # fraction of peak issue rate.
                x_kernel_roof_if_no_earlyout=round(
                    tests / dt / kernel_roof_tests_s, 2),
            )

        # Bounce (general) pass: hemisphere directions at primary hit points.
        from fireflies_tpu.render.intersect import closest_hit

        hit = jax.jit(
            lambda dd: closest_hit(None, dd, rs.geometry, shared_origin=cam)
        )(d)
        p = o + d * jnp.where(hit.valid, hit.t, 1.0)[:, None]
        dr = jax.random.normal(jax.random.key(2), d.shape)
        dr = dr / jnp.linalg.norm(dr, axis=-1, keepdims=True)
        chunk_g = 64
        # origin 0 => origin-shifted boxes ARE world-space (general pass).
        from fireflies_tpu.render.pallas.intersect_kernel import pack_rays
        _woop, boxes = pack_triangles_woop(
            verts, faces, jnp.zeros(3, jnp.float32), chunk=chunk_g)
        rays_soa, _tmax, _n = pack_rays(p, dr, 1e30)
        _lists, counts = tile_cluster_lists_general(rays_soa, boxes)
        tests = float(jnp.sum(counts)) * chunk_g * rays_per_tile

        def op_g(dd):
            # The renderer's actual dispatcher path (general culling gates
            # on FF_GEN_CULL_MIN_FACES, so r75 runs the culled-general
            # kernel and r24 the plain resident one — same as production).
            h = closest_hit(p, dd, rs.geometry)
            return dd + 1e-24 * h.t[:, None]

        dt = timed_scan(op_g, dr, n_iter)
        _emit(
            f"roofline_r{resolution}_bounce_general",
            faces=n_faces, ms=round(dt * 1e3, 3),
            mray_s=round(n_rays / dt / 1e6, 1),
            listed_tests_per_ray=round(tests / n_rays, 1),
            x_kernel_roof_if_no_earlyout=round(
                tests / dt / kernel_roof_tests_s, 2),
        )


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    out = sys.argv[2] if len(sys.argv) > 2 else None
    # Early D2H: flip the axon tunnel into eager execution (CLAUDE.md).
    rs, _, _ = _scene(24)
    n = int(jnp.sum(rs.geometry.faces >= 0))
    print(f"# eager-mode flip: faces-checksum {n}", flush=True)

    t_all = time.perf_counter()
    if what in ("hitfrac", "all"):
        probe_hitfrac()
    if what in ("kernel", "all"):
        probe_kernel()
    if what in ("roofline", "all"):
        probe_roofline()
    if what in ("step", "all"):
        probe_step()
    print(f"# total {time.perf_counter() - t_all:.0f}s", flush=True)
    if out:
        with open(out, "w") as f:
            json.dump(RESULTS, f, indent=1)


if __name__ == "__main__":
    main()

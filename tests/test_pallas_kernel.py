"""Pallas kernel vs pure-JAX intersector cross-checks (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

import fireflies_tpu.render.intersect as intersect
from fireflies_tpu.render.pallas import intersect_pallas, morton_order, pack_triangles
from fireflies_tpu.render.types import Geometry


def _soup(n_verts=300, n_faces=211, seed=0):
    rng = np.random.default_rng(seed)
    verts = jnp.asarray(rng.normal(size=(n_verts, 3)), jnp.float32)
    faces = jnp.asarray(rng.integers(0, n_verts, size=(n_faces, 3)), jnp.int32)
    geo = Geometry(
        vertices=verts,
        faces=faces,
        face_mat=jnp.zeros(n_faces, jnp.int32),
        face_mesh=jnp.zeros(n_faces, jnp.int32),
    )
    o = jnp.asarray(rng.normal(size=(300, 3)) * 3, jnp.float32)
    d = jnp.asarray(rng.normal(size=(300, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return geo, o, d


def test_pallas_matches_jax_closest_hit():
    geo, o, d = _soup()
    ref = intersect.intersect_brute(o, d, geo)
    t, prim = intersect_pallas(o, d, geo.vertices, geo.faces, interpret=True)
    np.testing.assert_array_equal(np.asarray(prim), np.asarray(ref.prim))
    np.testing.assert_allclose(np.asarray(t), np.asarray(ref.t), atol=1e-4)


def test_pallas_matches_jax_any_hit():
    geo, o, d = _soup(seed=1)
    blocked_ref = intersect.occluded(o, d, geo, t_max=2.0)
    _, prim = intersect_pallas(
        o, d, geo.vertices, geo.faces, t_max=2.0, any_hit=True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(prim >= 0), np.asarray(blocked_ref))


def test_pallas_per_ray_tmax():
    geo, o, d = _soup(seed=2)
    tmax = jnp.linspace(0.5, 4.0, o.shape[0])
    ref = intersect.intersect_brute(o, d, geo, t_max=tmax)
    t, prim = intersect_pallas(o, d, geo.vertices, geo.faces, t_max=tmax, interpret=True)
    np.testing.assert_array_equal(np.asarray(prim), np.asarray(ref.prim))


def test_morton_order_is_permutation():
    rng = np.random.default_rng(0)
    cents = rng.normal(size=(500, 3))
    order = morton_order(cents)
    assert sorted(order.tolist()) == list(range(500))
    # Spatial locality: mean inter-neighbor distance shrinks vs random order.
    d_sorted = np.linalg.norm(np.diff(cents[order], axis=0), axis=1).mean()
    d_rand = np.linalg.norm(np.diff(cents, axis=0), axis=1).mean()
    assert d_sorted < d_rand


def test_pack_triangles_boxes_cover_faces():
    geo, _, _ = _soup()
    tri, boxes = pack_triangles(geo.vertices, geo.faces)
    assert tri.shape[0] == 9 and boxes.shape[0] == 6
    v0, e1, e2 = geo.triangle_corners()
    # First chunk box must contain its 64 faces' vertices.
    pts = jnp.concatenate([v0[:64], (v0 + e1)[:64], (v0 + e2)[:64]])
    cmin = boxes[:3, 0]
    cmax = boxes[3:, 0]
    assert bool(jnp.all(pts >= cmin[None, :] - 1e-5))
    assert bool(jnp.all(pts <= cmax[None, :] + 1e-5))


def test_streamed_kernels_match_jax():
    """HBM-streamed kernels (large-scene path) vs the JAX reference."""
    from fireflies_tpu.render.pallas import (
        intersect_pallas_streamed,
        intersect_pallas_streamed_general,
    )

    geo, o, d = _soup(n_verts=400, n_faces=300, seed=3)
    origin = jnp.asarray([0.0, 0.5, 4.0])
    ob = jnp.broadcast_to(origin, d.shape)
    ref = intersect.intersect_brute(ob, d, geo)
    t, prim = intersect_pallas_streamed(
        origin, d, geo.vertices, geo.faces, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(prim), np.asarray(ref.prim))

    ref2 = intersect.intersect_brute(o, d, geo)
    t2, prim2 = intersect_pallas_streamed_general(
        o, d, geo.vertices, geo.faces, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(prim2), np.asarray(ref2.prim))
    hit = np.asarray(prim2) >= 0
    np.testing.assert_allclose(
        np.asarray(t2)[hit], np.asarray(ref2.t)[hit], atol=1e-4
    )


def test_culled_kernel_matches_jax():
    """Tile-culled shared-origin kernel vs the JAX reference (closest + any)."""
    from fireflies_tpu.render.pallas.intersect_culled import (
        intersect_pallas_shared_culled,
        tile_cluster_lists,
    )
    from fireflies_tpu.render.pallas.intersect_kernel import (
        pack_dirs,
        pack_triangles_woop,
    )

    geo, _, d = _soup(n_verts=400, n_faces=300, seed=4)
    origin = jnp.asarray([0.0, 0.5, 4.0])
    ob = jnp.broadcast_to(origin, d.shape)
    for chunk in (64, 16):
        ref = intersect.intersect_brute(ob, d, geo)
        t, prim = intersect_pallas_shared_culled(
            origin, d, geo.vertices, geo.faces, interpret=True, chunk=chunk
        )
        np.testing.assert_array_equal(np.asarray(prim), np.asarray(ref.prim))
        hit = np.asarray(prim) >= 0
        np.testing.assert_allclose(
            np.asarray(t)[hit], np.asarray(ref.t)[hit], atol=1e-4
        )

    # any-hit agreement on blocked mask
    blocked_ref = intersect.occluded(ob, d, geo, t_max=2.0)
    _, prim2 = intersect_pallas_shared_culled(
        origin, d, geo.vertices, geo.faces, t_max=2.0, any_hit=True,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(prim2 >= 0), np.asarray(blocked_ref))

    # per-ray tmax incl. dead rays (tmax < 0 must never hit)
    tmax = jnp.where(jnp.arange(d.shape[0]) % 3 == 0, -1.0, 3.0)
    ref3 = intersect.intersect_brute(ob, d, geo, t_max=tmax)
    _, prim3 = intersect_pallas_shared_culled(
        origin, d, geo.vertices, geo.faces, t_max=tmax, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(prim3), np.asarray(ref3.prim))

    # the conservative lists actually cull: no false negatives is covered
    # above; here check counts are a real subset on a spatially-local load
    woop, boxes = pack_triangles_woop(geo.vertices, geo.faces, origin, chunk=16)
    dn = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    dirs_soa, _, _ = pack_dirs(dn * 0.05 + jnp.asarray([0.0, 0.0, -1.0]), 1e30)
    lists, counts = tile_cluster_lists(dirs_soa, boxes)
    assert lists.shape[1] == boxes.shape[1]
    assert int(counts.max()) <= boxes.shape[1]


def test_culled_streamed_matches_jax():
    """Tile-culled HBM-streamed shared-origin kernel vs the JAX reference,
    incl. the vmapped (batched-geometry) route bench variants use."""
    from fireflies_tpu.render.pallas.intersect_stream import (
        intersect_pallas_streamed_culled,
    )

    geo, _, d = _soup(n_verts=400, n_faces=300, seed=5)
    origin = jnp.asarray([0.0, 0.5, 4.0])
    ob = jnp.broadcast_to(origin, d.shape)
    ref = intersect.intersect_brute(ob, d, geo)
    t, prim = intersect_pallas_streamed_culled(
        origin, d, geo.vertices, geo.faces, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(prim), np.asarray(ref.prim))
    hit = np.asarray(prim) >= 0
    np.testing.assert_allclose(np.asarray(t)[hit], np.asarray(ref.t)[hit], atol=1e-4)

    blocked_ref = intersect.occluded(ob, d, geo, t_max=2.0)
    _, prim2 = intersect_pallas_streamed_culled(
        origin, d, geo.vertices, geo.faces, t_max=2.0, any_hit=True,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(prim2 >= 0), np.asarray(blocked_ref))

    # vmap over batched vertices (randomized variants)
    verts_b = jnp.stack([geo.vertices, geo.vertices * 1.1 + 0.02])

    def one(v):
        return intersect_pallas_streamed_culled(
            origin, d, v, geo.faces, interpret=True
        )[1]

    prim_b = jax.vmap(one)(verts_b)
    for i in range(2):
        geo_i = Geometry(
            vertices=verts_b[i], faces=geo.faces,
            face_mat=geo.face_mat, face_mesh=geo.face_mesh,
        )
        ref_i = intersect.intersect_brute(ob, d, geo_i)
        np.testing.assert_array_equal(np.asarray(prim_b[i]), np.asarray(ref_i.prim))


def test_general_culled_matches_jax():
    """Tile-culled general (per-ray origin) kernel vs the JAX reference."""
    from fireflies_tpu.render.pallas.intersect_culled import (
        intersect_pallas_general_culled,
    )

    geo, o, d = _soup(seed=6)
    for chunk in (64, 16):
        ref = intersect.intersect_brute(o, d, geo)
        t, prim = intersect_pallas_general_culled(
            o, d, geo.vertices, geo.faces, interpret=True, chunk=chunk
        )
        np.testing.assert_array_equal(np.asarray(prim), np.asarray(ref.prim))
        hit = np.asarray(prim) >= 0
        np.testing.assert_allclose(
            np.asarray(t)[hit], np.asarray(ref.t)[hit], atol=1e-4
        )

    blocked_ref = intersect.occluded(o, d, geo, t_max=2.0)
    _, prim2 = intersect_pallas_general_culled(
        o, d, geo.vertices, geo.faces, t_max=2.0, any_hit=True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(prim2 >= 0), np.asarray(blocked_ref))


def test_culled_kernel_vmap_batched_vertices():
    """Resident culled kernel under vmap (the bench's batch-of-variants
    route): auto-batching must block the SMEM list/count tables per grid
    step."""
    from fireflies_tpu.render.pallas.intersect_culled import (
        intersect_pallas_shared_culled,
    )

    geo, _, d = _soup(n_verts=400, n_faces=300, seed=7)
    origin = jnp.asarray([0.0, 0.5, 4.0])
    ob = jnp.broadcast_to(origin, d.shape)
    verts_b = jnp.stack([geo.vertices, geo.vertices * 0.9 - 0.05])

    def one(v):
        return intersect_pallas_shared_culled(
            origin, d, v, geo.faces, interpret=True
        )[1]

    prim_b = jax.vmap(one)(verts_b)
    for i in range(2):
        geo_i = Geometry(
            vertices=verts_b[i], faces=geo.faces,
            face_mat=geo.face_mat, face_mesh=geo.face_mesh,
        )
        ref_i = intersect.intersect_brute(ob, d, geo_i)
        np.testing.assert_array_equal(np.asarray(prim_b[i]), np.asarray(ref_i.prim))


def test_dead_ray_gating_multi_tile():
    """Dead rays (tmax < 0) across WHOLE tiles: the bounce-pass gating path.

    Builds > 1 ray tile (4096 rays) with tile 0 entirely dead and tile 1
    mixed, so the all-dead skip / dead-aware early exits and the
    tmax-masked cull passes actually execute, and cross-checks every kernel
    entry point against the brute reference (which honors per-ray t_max).
    """
    from fireflies_tpu.render.pallas.intersect_culled import (
        intersect_pallas_general_culled,
        intersect_pallas_shared_culled,
    )
    from fireflies_tpu.render.pallas.intersect_stream import (
        intersect_pallas_streamed,
        intersect_pallas_streamed_culled,
        intersect_pallas_streamed_general,
    )

    rng = np.random.default_rng(42)
    geo, _, _ = _soup(n_verts=400, n_faces=300, seed=8)
    n = 4096  # two RAY_TILE tiles exactly
    o = jnp.asarray(rng.normal(size=(n, 3)) * 3, jnp.float32)
    d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    # Tile 0 (rays 0..2047) all dead; tile 1 mixed (every 5th dead).
    alive = (jnp.arange(n) >= 2048) & (jnp.arange(n) % 5 != 0)
    tmax = jnp.where(alive, 30.0, -1.0)

    ref = intersect.intersect_brute(o, d, geo, t_max=tmax)

    t, prim = intersect_pallas(
        o, d, geo.vertices, geo.faces, t_max=tmax, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(prim), np.asarray(ref.prim))

    _, prim_gc = intersect_pallas_general_culled(
        o, d, geo.vertices, geo.faces, t_max=tmax, interpret=True, chunk=16
    )
    np.testing.assert_array_equal(np.asarray(prim_gc), np.asarray(ref.prim))

    _, prim_sg = intersect_pallas_streamed_general(
        o, d, geo.vertices, geo.faces, t_max=tmax, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(prim_sg), np.asarray(ref.prim))

    # Shared-origin paths (reversed-shadow-style batch).
    origin = jnp.asarray([0.0, 0.5, 4.0])
    ob = jnp.broadcast_to(origin, d.shape)
    ref_s = intersect.intersect_brute(ob, d, geo, t_max=tmax)

    _, prim_sc = intersect_pallas_shared_culled(
        origin, d, geo.vertices, geo.faces, t_max=tmax, interpret=True, chunk=16
    )
    np.testing.assert_array_equal(np.asarray(prim_sc), np.asarray(ref_s.prim))

    _, prim_st = intersect_pallas_streamed(
        origin, d, geo.vertices, geo.faces, t_max=tmax, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(prim_st), np.asarray(ref_s.prim))

    _, prim_stc = intersect_pallas_streamed_culled(
        origin, d, geo.vertices, geo.faces, t_max=tmax, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(prim_stc), np.asarray(ref_s.prim))

    # Any-hit agreement under the same dead pattern.
    blocked_ref = np.asarray(
        intersect.occluded(ob, d, geo, t_max=tmax)
    ) & np.asarray(alive)
    for fn in (
        lambda: intersect_pallas_shared_culled(
            origin, d, geo.vertices, geo.faces, t_max=tmax, any_hit=True,
            interpret=True, chunk=16,
        ),
        lambda: intersect_pallas_streamed_culled(
            origin, d, geo.vertices, geo.faces, t_max=tmax, any_hit=True,
            interpret=True,
        ),
    ):
        _, prim_ah = fn()
        np.testing.assert_array_equal(np.asarray(prim_ah >= 0), blocked_ref)


def test_dead_ray_gating_all_dead():
    """Every ray dead: counts must be zero everywhere and no hits returned."""
    from fireflies_tpu.render.pallas.intersect_culled import (
        intersect_pallas_general_culled,
        tile_cluster_lists_general,
    )
    from fireflies_tpu.render.pallas.intersect_kernel import pack_rays

    geo, o, d = _soup(seed=9)
    tmax = jnp.full((o.shape[0],), -1.0)
    _, prim = intersect_pallas(
        o, d, geo.vertices, geo.faces, t_max=tmax, interpret=True
    )
    assert int((prim >= 0).sum()) == 0
    _, prim2 = intersect_pallas_general_culled(
        o, d, geo.vertices, geo.faces, t_max=tmax, interpret=True, chunk=16
    )
    assert int((prim2 >= 0).sum()) == 0

    rays_soa, tmax_tiles, _ = pack_rays(o, d, tmax)
    tri, boxes = pack_triangles(geo.vertices, geo.faces, chunk=16)
    _, counts = tile_cluster_lists_general(
        rays_soa, boxes, tmax_tiles=tmax_tiles
    )
    assert int(counts.max()) == 0


def test_streamed_general_culled_matches_jax():
    """Tile-culled general-ray streamed kernel (big-scene bounce pass) vs the
    JAX reference: closest, any-hit, dead rays, and the vmapped route."""
    from fireflies_tpu.render.pallas.intersect_stream import (
        intersect_pallas_streamed_general_culled,
    )

    geo, o, d = _soup(n_verts=400, n_faces=300, seed=10)
    ref = intersect.intersect_brute(o, d, geo)
    t, prim = intersect_pallas_streamed_general_culled(
        o, d, geo.vertices, geo.faces, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(prim), np.asarray(ref.prim))
    hit = np.asarray(prim) >= 0
    np.testing.assert_allclose(np.asarray(t)[hit], np.asarray(ref.t)[hit], atol=1e-4)

    blocked_ref = intersect.occluded(o, d, geo, t_max=2.0)
    _, prim2 = intersect_pallas_streamed_general_culled(
        o, d, geo.vertices, geo.faces, t_max=2.0, any_hit=True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(prim2 >= 0), np.asarray(blocked_ref))

    # dead rays
    tmax = jnp.where(jnp.arange(o.shape[0]) % 4 == 0, -1.0, 20.0)
    ref3 = intersect.intersect_brute(o, d, geo, t_max=tmax)
    _, prim3 = intersect_pallas_streamed_general_culled(
        o, d, geo.vertices, geo.faces, t_max=tmax, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(prim3), np.asarray(ref3.prim))

    # vmap over batched vertices + batched rays (the bounce-pass shape)
    verts_b = jnp.stack([geo.vertices, geo.vertices * 1.05 + 0.01])
    o_b = jnp.stack([o, o + 0.1])
    d_b = jnp.stack([d, jnp.roll(d, 7, axis=0)])

    def one(v, oo, dd):
        return intersect_pallas_streamed_general_culled(
            oo, dd, v, geo.faces, interpret=True
        )[1]

    prim_b = jax.vmap(one)(verts_b, o_b, d_b)
    for i in range(2):
        geo_i = Geometry(
            vertices=verts_b[i], faces=geo.faces,
            face_mat=geo.face_mat, face_mesh=geo.face_mesh,
        )
        ref_i = intersect.intersect_brute(o_b[i], d_b[i], geo_i)
        np.testing.assert_array_equal(np.asarray(prim_b[i]), np.asarray(ref_i.prim))


def test_subtile_culling_tightens_lists(monkeypatch):
    """Sub-tile split lists are subsets of the whole-tile lists (strictly
    tighter on a coherent direction-correlated-with-position load) and the
    kernels stay exact vs brute force at every split."""
    from fireflies_tpu.render.pallas import intersect_culled as ic
    from fireflies_tpu.render.pallas.intersect_kernel import (
        pack_dirs,
        pack_rays,
        pack_triangles,
        pack_triangles_woop,
    )

    # Structured plane-grid mesh: Morton clusters are spatially compact, so
    # sub-fans can actually exclude clusters (random soup clusters span the
    # scene and nothing culls).
    n_grid = 24
    xs = np.linspace(-4, 4, n_grid + 1)
    vv = [[xs[j], xs[i], 0.0] for i in range(n_grid + 1) for j in range(n_grid + 1)]

    def vid(i, j):
        return i * (n_grid + 1) + j

    ff = []
    for i in range(n_grid):
        for j in range(n_grid):
            ff.append([vid(i, j), vid(i, j + 1), vid(i + 1, j)])
            ff.append([vid(i + 1, j), vid(i, j + 1), vid(i + 1, j + 1)])
    verts = jnp.asarray(vv, jnp.float32)
    faces = jnp.asarray(ff, jnp.int32)
    geo = Geometry(
        vertices=verts, faces=faces,
        face_mat=jnp.zeros(faces.shape[0], jnp.int32),
        face_mesh=jnp.zeros(faces.shape[0], jnp.int32),
    )
    origin = jnp.asarray([0.0, 0.0, 6.0])
    # Direction correlated with ray index (a coherent "bounce tile"): the
    # fan sweeps across the plane, so each sub-group sees a narrow window.
    n = 4096
    u = jnp.linspace(-0.6, 0.6, n)
    d = jnp.stack([u, 0.05 * jnp.sin(7 * u), -jnp.ones(n)], axis=-1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    _, boxes_w = pack_triangles_woop(geo.vertices, geo.faces, origin, chunk=16)
    dirs_soa, _, _ = pack_dirs(d, 1e30)

    def listed_sets(spec):
        monkeypatch.setenv("FF_CULL_SUBTILES", spec)
        lists, counts = ic.tile_cluster_lists(dirs_soa, boxes_w)
        lists, counts = np.asarray(lists), np.asarray(counts)
        return [set(lists[i, : counts[i, 0]]) for i in range(lists.shape[0])]

    base = listed_sets("1x1")
    split = listed_sets("2x1")
    assert all(s <= b for s, b in zip(split, base))  # conservative subset
    assert sum(len(s) for s in split) < sum(len(b) for b in base)  # tighter

    # General (per-ray origin) variant: same subset property.
    o = jnp.broadcast_to(origin, d.shape) + 0.5 * d
    tri, boxes_g = pack_triangles(geo.vertices, geo.faces, chunk=16)
    rays_soa, tmax_tiles, _ = pack_rays(o, d, 1e30)

    def listed_sets_g(spec):
        monkeypatch.setenv("FF_CULL_SUBTILES", spec)
        lists, counts = ic.tile_cluster_lists_general(
            rays_soa, boxes_g, tmax_tiles=tmax_tiles
        )
        lists, counts = np.asarray(lists), np.asarray(counts)
        return [set(lists[i, : counts[i, 0]]) for i in range(lists.shape[0])]

    base_g = listed_sets_g("1x1")
    split_g = listed_sets_g("2x1")
    assert all(s <= b for s, b in zip(split_g, base_g))
    assert sum(len(s) for s in split_g) < sum(len(b) for b in base_g)

    # Exactness vs brute force under an aggressive split, both kernels.
    # (Compare hit masks + t: on a structured grid a ray can hit a shared
    # diagonal edge exactly, where prim tie-breaking order is unspecified.)
    monkeypatch.setenv("FF_CULL_SUBTILES", "4x8")
    ref = intersect.intersect_brute(jnp.broadcast_to(origin, d.shape), d, geo)
    t, prim = ic.intersect_pallas_shared_culled(
        origin, d, geo.vertices, geo.faces, interpret=True, chunk=16
    )
    np.testing.assert_array_equal(np.asarray(prim >= 0), np.asarray(ref.prim >= 0))
    hit = np.asarray(prim) >= 0
    np.testing.assert_allclose(np.asarray(t)[hit], np.asarray(ref.t)[hit], atol=1e-4)
    ref_g = intersect.intersect_brute(o, d, geo)
    t_g, prim_g = ic.intersect_pallas_general_culled(
        o, d, geo.vertices, geo.faces, interpret=True, chunk=16
    )
    np.testing.assert_array_equal(
        np.asarray(prim_g >= 0), np.asarray(ref_g.prim >= 0)
    )
    hit_g = np.asarray(prim_g) >= 0
    np.testing.assert_allclose(
        np.asarray(t_g)[hit_g], np.asarray(ref_g.t)[hit_g], atol=1e-4
    )


def test_cull_subtiles_env_validation(monkeypatch):
    from fireflies_tpu.render.pallas.intersect_culled import _cull_subtiles

    for bad in ("", "2", "axb", "0x2", "3x5", "2x2x2"):
        monkeypatch.setenv("FF_CULL_SUBTILES", bad)
        try:
            _cull_subtiles()
            raise AssertionError(f"accepted {bad!r}")
        except ValueError:
            pass
    monkeypatch.setenv("FF_CULL_SUBTILES", "4x16")
    assert _cull_subtiles() == (4, 16)

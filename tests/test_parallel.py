import numpy as np
import jax
import jax.numpy as jnp
import pytest

import fireflies_tpu as ff
from fireflies_tpu import parallel
from fireflies_tpu.assets import scenes as ff_scenes
from fireflies_tpu.render import RenderConfig, SceneBridge, render_depth, render_rgb


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest should provide 8 virtual devices"
    return parallel.make_mesh(8)


def test_variant_parallel_render(mesh):
    scene, kw = ff_scenes.hello_world()
    bridge = SceneBridge(scene, **kw)
    randomize = scene.compile()
    cfg = RenderConfig(width=8, height=8, spp=1, max_bounces=1, tri_chunk=16)

    def render_one(key, step):
        rs = bridge.assemble(randomize(key, step))
        return render_rgb(rs, key, cfg)

    run = parallel.variant_parallel(render_one, mesh)
    per_device = 2
    keys = parallel.shard_keys(mesh, jax.random.key(0), per_device)
    steps = jnp.zeros(keys.shape[0], jnp.int32)
    out = jax.jit(run)(keys, steps)
    assert out.shape == (16, 8, 8, 3)
    assert bool(jnp.all(jnp.isfinite(out)))
    # Different variants produce different images (rotation randomized).
    flat = out.reshape(16, -1)
    assert float(jnp.std(jnp.mean(flat, axis=1))) > 0


def test_variant_parallel_matches_serial(mesh):
    scene, kw = ff_scenes.hello_world()
    bridge = SceneBridge(scene, **kw)
    randomize = scene.compile()
    cfg = RenderConfig(width=8, height=8, spp=1, max_bounces=1, tri_chunk=16)

    def depth_one(key, step):
        return render_depth(bridge.assemble(randomize(key, step)), cfg)

    run = parallel.variant_parallel(depth_one, mesh)
    keys = parallel.shard_keys(mesh, jax.random.key(1), 1)
    steps = jnp.zeros(8, jnp.int32)
    sharded = jax.jit(run)(keys, steps)
    serial = jnp.stack([depth_one(k, 0) for k in keys])
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(serial), atol=1e-5)


def test_psum_grad_step(mesh):
    # Quadratic toy loss: check the psum-averaged gradient is exact.
    def loss_fn(params, key):
        noise = jax.random.normal(key, ())
        return jnp.sum((params["w"] - 3.0) ** 2) + 0.0 * noise

    step = parallel.psum_grad_step(loss_fn, mesh)
    params = {"w": jnp.asarray(1.0)}
    keys = parallel.shard_keys(mesh, jax.random.key(0), 4)
    loss, grad = jax.jit(step)(params, keys)
    assert float(loss) == pytest.approx(4.0, abs=1e-5)
    assert float(grad["w"]) == pytest.approx(-4.0, abs=1e-5)


def test_band_rays_match_full_film():
    """camera_rays_tiled band mode == the matching slice of the full film.

    Tile-major order enumerates 16-row bands first, so a (W, bh) call with
    y_offset = k*bh / full_height = H must reproduce rows [k*bh*W,
    (k+1)*bh*W) of the full-film ray stream exactly (key=None: no jitter).
    """
    from fireflies_tpu.render.rays import camera_rays_tiled
    from fireflies_tpu.render.types import Camera

    cam = Camera.create(jnp.eye(4), fov=45.0)
    w, h, bh = 128, 64, 16
    o_full, d_full, inv = camera_rays_tiled(cam, w, h, key=None)
    assert inv is None
    for k in range(h // bh):
        o_b, d_b, inv_b = camera_rays_tiled(
            cam, w, bh, key=None, y_offset=k * bh, full_height=h
        )
        assert inv_b is None
        sl = slice(k * bh * w, (k + 1) * bh * w)
        np.testing.assert_allclose(np.asarray(d_b), np.asarray(d_full[sl]), atol=1e-7)
        np.testing.assert_allclose(np.asarray(o_b), np.asarray(o_full[sl]), atol=1e-7)


def test_render_tile_parallel_matches_serial_bands(mesh):
    """Sharded band render == serial loop over the same banded renders."""
    scene, kw = ff_scenes.hello_world()
    bridge = SceneBridge(scene, **kw)
    randomize = scene.compile()
    cfg = RenderConfig(width=16, height=16, spp=1, max_bounces=1, tri_chunk=16)

    rs = bridge.assemble(randomize(jax.random.key(3), 0))
    key = jax.random.key(7)
    tiles_mesh = parallel.make_mesh(8, axis_name=parallel.TILE_AXIS)
    img = jax.jit(
        lambda s, k: parallel.render_tile_parallel(s, k, cfg, tiles_mesh)
    )(rs, key)
    assert img.shape == (16, 16, 3)

    bh = 16 // 8
    band_cfg = cfg.replace(height=bh)
    from fireflies_tpu.render.pathtracer import render_rgb as rr

    serial = jnp.concatenate(
        [
            rr(rs, jax.random.fold_in(key, t), band_cfg,
               film_y0=t * bh, film_full_height=16)
            for t in range(8)
        ],
        axis=0,
    )
    np.testing.assert_allclose(np.asarray(img), np.asarray(serial), atol=1e-5)


def test_dp_tile_grad_step_matches_serial(mesh):
    """2-D (variants x tiles) training step == the serial band-stitched ref."""
    scene, kw = ff_scenes.hello_world()
    bridge = SceneBridge(scene, **kw)
    randomize = scene.compile()
    cfg = RenderConfig(width=16, height=16, spp=1, max_bounces=1, tri_chunk=16)
    mesh2d = parallel.make_mesh_2d(2, 4)
    nt, bh = 4, 4

    def scene_fn(params, key):
        p = dict(randomize(key, 0))
        rs = bridge.assemble(p)
        # Inject a differentiable parameter: scale all material base colors.
        return rs.replace(
            materials=rs.materials.replace(
                base_color=rs.materials.base_color * params["gain"]
            )
        )

    def image_loss(img):
        return jnp.mean((img - 0.1) ** 2)

    step = parallel.dp_tile_grad_step(scene_fn, image_loss, cfg, mesh2d)
    params = {"gain": jnp.asarray(1.0)}
    keys = jax.random.split(jax.random.key(5), 2)
    loss, grad = jax.jit(step)(params, keys)

    # Serial reference with the identical RNG arrangement.
    from fireflies_tpu.render.pathtracer import render_rgb as rr
    band_cfg = cfg.replace(height=bh)

    def serial_loss(params):
        losses = []
        for k in keys:
            img = jnp.concatenate(
                [
                    rr(scene_fn(params, k), jax.random.fold_in(k, t), band_cfg,
                       film_y0=t * bh, film_full_height=16)
                    for t in range(nt)
                ],
                axis=0,
            )
            losses.append(image_loss(img))
        return jnp.mean(jnp.stack(losses))

    ref_loss, ref_grad = jax.value_and_grad(serial_loss)(params)
    assert float(loss) == pytest.approx(float(ref_loss), abs=1e-6)
    assert float(grad["gain"]) == pytest.approx(float(ref_grad["gain"]), rel=1e-4)


def test_all_gather_frames(mesh):
    frames = jnp.arange(16.0).reshape(16, 1)
    frames = jax.device_put(
        frames,
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(parallel.DATA_AXIS)),
    )
    gathered = parallel.all_gather_frames(mesh, frames)
    assert gathered.shape == (16, 1)
    np.testing.assert_allclose(np.asarray(gathered).ravel(), np.arange(16.0))


def test_generate_dataset_parallel(mesh, tmp_path):
    """Dataset farm over the mesh: one SPMD dispatch renders a variant
    batch per device; host rejection + PNG writing consume the gathered
    batch (VERDICT r4 #6)."""
    from fireflies_tpu import datagen
    from fireflies_tpu.render import integrators

    scene, kw = ff_scenes.hello_world()
    bridge = SceneBridge(scene, **kw)
    randomize = scene.compile()
    cfg = RenderConfig(width=8, height=8, spp=1, max_bounces=1, tri_chunk=16)

    def render_one(key, step):
        rs = bridge.assemble(randomize(key, step))
        img = jnp.clip(render_rgb(rs, key, cfg), 0.0, 1.0)
        seg = integrators.render_segmentation(rs, cfg)
        return img, seg

    got = datagen.generate_dataset_parallel(
        render_one, n_frames=10, out_dir=tmp_path, key=jax.random.key(3),
        mesh=mesh, per_device=2,
        rejection=datagen.RejectionConfig(min_coverage=0.0, max_components=99),
    )
    assert got == 10
    imgs = sorted((tmp_path / "images").glob("*.png"))
    segs = sorted((tmp_path / "segmentations").glob("*.png"))
    assert len(imgs) == 10 and len(segs) == 10

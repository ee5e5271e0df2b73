import numpy as np
import jax
import jax.numpy as jnp
import pytest

import fireflies_tpu as ff
from fireflies_tpu import datagen, optim
from fireflies_tpu.assets import scenes as ff_scenes
from fireflies_tpu.projection import laser as laser_mod
from fireflies_tpu.render import RenderConfig, SceneBridge, render_rgb, render_segmentation
from fireflies_tpu.utils.png import read_png, write_png


def test_overlap_loss_zero_when_separated():
    far = jnp.array([[0.1, 0.1], [0.9, 0.9]])
    near = jnp.array([[0.5, 0.5], [0.5, 0.52]])
    l_far = float(optim.overlap_loss(far, 20.0, (64, 64)))
    l_near = float(optim.overlap_loss(near, 20.0, (64, 64)))
    assert l_near > 10 * max(l_far, 1e-8)


def test_point_pattern_optimization_reduces_overlap():
    key = jax.random.key(0)
    # Start clustered; optimization should spread points apart.
    init = 0.5 + 0.02 * jax.random.normal(key, (12, 2))
    res = optim.optimize_point_pattern(
        key, n_points=12, sigma=40.0, texture_size=(64, 64), steps=60,
        learning_rate=5e-3, init_points=init, chunk=12,
    )
    assert float(res.losses[-1]) < 0.5 * float(res.losses[0])
    assert float(res.points.min()) >= 0.0 and float(res.points.max()) <= 1.0


def test_pattern_optimization_through_renderer():
    scene, kw = ff_scenes.vocalfold(resolution=8, n_anim_frames=2)
    bridge = SceneBridge(scene, **kw)
    randomize = scene.compile()
    cfg = RenderConfig(width=16, height=16, spp=1, max_bounces=1, tri_chunk=128)

    def texture_fn(rays):
        tex = laser_mod.rays_to_texture_summed(rays, 30.0, 4.0, (32, 32), chunk=8)
        return jnp.stack([jnp.zeros_like(tex), tex, jnp.zeros_like(tex)], -1)

    loss_fn = optim.make_variant_loss(
        randomize_fn=randomize,
        assemble_fn=bridge.assemble,
        render_fn=lambda s, k: render_rgb(s, k, cfg),
        objective=lambda img, aux: -jnp.sum(img[..., 1]),  # maximize green energy
        texture_fn=texture_fn,
    )
    rays0 = laser_mod.generate_uniform_rays_by_count(2, 2, 30.0)
    res = optim.optimize_pattern_through_render(
        loss_fn, rays0, jax.random.key(0), steps=3, batch=2, learning_rate=1e-3
    )
    assert res.rays.shape == rays0.shape
    assert bool(jnp.all(jnp.isfinite(res.losses)))
    np.testing.assert_allclose(jnp.linalg.norm(res.rays, axis=-1), 1.0, atol=1e-4)


def test_inverse_rendering_recovers_translation():
    # Optimize a quad's z-offset to match a target depth map.
    from fireflies_tpu.render import render_depth_differentiable
    from fireflies_tpu.render.types import Camera, Geometry, Lights, Materials, RenderScene

    faces = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
    base_verts = jnp.array(
        [[-5, -5, 0], [5, -5, 0], [5, 5, 0], [-5, 5, 0]], jnp.float32
    )
    cam = Camera.create(jnp.eye(4), fov=45.0)
    cfg = RenderConfig(width=8, height=8, spp=1, max_bounces=1, tri_chunk=16)

    def scene_at(z):
        geo = Geometry(
            vertices=base_verts + jnp.array([0.0, 0.0, 1.0]) * z,
            faces=faces,
            face_mat=jnp.zeros(2, jnp.int32),
            face_mesh=jnp.zeros(2, jnp.int32),
        )
        return RenderScene(
            geometry=geo, materials=Materials.default(1),
            lights=Lights.empty(), camera=cam,
        )

    target = render_depth_differentiable(scene_at(jnp.asarray(-3.0)), cfg)

    def loss_fn(trainable, key):
        d = render_depth_differentiable(scene_at(trainable["z"]), cfg)
        return optim.image_l2(d, target)

    res = optim.optimize_params(
        {"z": jnp.asarray(-1.5)}, loss_fn, jax.random.key(0), steps=300,
        learning_rate=3e-2,
    )
    assert float(res.params["z"]) == pytest.approx(-3.0, abs=0.05)


def test_png_roundtrip(tmp_path):
    rgb = (np.random.default_rng(0).uniform(size=(16, 20, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "x.png")
    write_png(p, rgb)
    back = read_png(p)
    np.testing.assert_array_equal(back, rgb)
    gray = np.random.default_rng(1).uniform(size=(8, 8)).astype(np.float32)
    p2 = str(tmp_path / "g.png")
    write_png(p2, gray)
    back2 = read_png(p2)
    assert back2.shape == (8, 8)


def test_connected_components():
    mask = np.zeros((10, 10), bool)
    mask[1:3, 1:3] = True
    mask[6:9, 6:9] = True
    assert datagen.connected_components(mask) == 2
    assert datagen.connected_components(np.zeros((5, 5), bool)) == 0


def test_generate_dataset_with_rejection(tmp_path):
    scene, kw = ff_scenes.hello_world(randomize_rotation=True)
    bridge = SceneBridge(scene, **kw)
    randomize = scene.compile()
    cfg = RenderConfig(width=16, height=16, spp=1, max_bounces=1, tri_chunk=64)

    @jax.jit
    def render_batch(keys, steps):
        def one(k, s):
            rs = bridge.assemble(randomize(k, s))
            img = datagen.tonemap(render_rgb(rs, k, cfg))
            seg = render_segmentation(rs, cfg)
            return img, seg

        return jax.vmap(one)(keys, steps)

    n = datagen.generate_dataset(
        render_batch, n_frames=5, out_dir=tmp_path / "ds", key=jax.random.key(0),
        batch=4, max_dispatches=5,
    )
    assert n == 5
    assert len(list((tmp_path / "ds" / "images").iterdir())) == 5
    # Resume: asking for 6 adds exactly one more.
    n2 = datagen.generate_dataset(
        render_batch, n_frames=6, out_dir=tmp_path / "ds", key=jax.random.key(1),
        batch=4, max_dispatches=5,
    )
    assert n2 == 6

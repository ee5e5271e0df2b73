import numpy as np
import jax
import jax.numpy as jnp
import pytest

import fireflies_tpu as ff
from fireflies_tpu import postprocessing as pp
from fireflies_tpu.assets import scenes as ff_scenes
from fireflies_tpu.estimation import laser_estimation as le
from fireflies_tpu.render import RenderConfig, SceneBridge


def test_variance_map():
    maps = jnp.stack([jnp.full((8, 8), 1.0), jnp.full((8, 8), 3.0)])
    var = le.probability_distribution_from_depth_maps(maps, uniform_weight=0.1)
    np.testing.assert_allclose(var, 1.1, atol=1e-5)


def test_multinomial_without_replacement():
    prob = jnp.zeros((4, 4)).at[0, 0].set(5.0).at[3, 3].set(5.0) + 1e-6
    idx = le.points_from_probability_distribution(prob, 2, jax.random.key(0))
    assert len(set(np.asarray(idx).tolist())) == 2  # no replacement
    assert set(np.asarray(idx).tolist()) == {0, 15}  # the two heavy pixels


def test_convex_hull_and_fill():
    pts = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [5, 5]], np.float64)
    hull = le._convex_hull_2d(pts)
    assert len(hull) == 4  # interior point dropped
    mask = le.fill_convex_polygon(hull, (12, 12))
    assert mask[5, 5] == 1.0 and mask[11, 11] == 0.0


def test_laser_from_ndc_points_geometry():
    from fireflies_tpu.render.types import Camera as RC

    cam = RC.create(jnp.eye(4), fov=60.0)  # at origin looking down -Z
    laser_origin = jnp.array([0.5, 0.0, 0.0])
    # Center pixel of an 8x8 image, mean depth 2 -> scene point (0, 0, -2).
    chosen = jnp.array([8 * 4 + 4])
    dirs = le.laser_from_ndc_points(cam, laser_origin, jnp.asarray(2.0), chosen, (8, 8))
    target = jnp.array([0.0, 0.0, -2.0]) - laser_origin
    target = target / jnp.linalg.norm(target)
    # Half-pixel offset from exact center is expected; direction close.
    assert float(jnp.dot(dirs[0], target)) > 0.99


@pytest.mark.parametrize("mode", ["RANDOM", "POISSON", "GRID", "SMARTY"])
def test_initialize_laser_modes(mode):
    scene, kwargs = ff_scenes.vocalfold(resolution=8, n_anim_frames=2)
    bridge = SceneBridge(scene, **kwargs)
    cfg = le.LaserConfig(
        n_beams=16,
        n_depthmaps=3,
        image_size=(24, 24),
        smarty_min_radius=2.0,
        smarty_max_radius=8.0,
    )
    laser = le.initialize_laser(
        scene, bridge, cfg, mode=mode, key=jax.random.key(0),
        render_config=RenderConfig(width=24, height=24, spp=1, max_bounces=1, tri_chunk=128),
    )
    rays = laser.local_rays()
    assert rays.shape[0] >= 4
    np.testing.assert_allclose(np.linalg.norm(np.asarray(rays), axis=-1), 1.0, atol=1e-4)
    # All beams point forward (-Z half-space).
    assert float(rays[:, 2].max()) < 0.0


def test_white_noise_and_gate():
    img = jnp.full((16, 16), 0.5)
    wn = pp.WhiteNoise(0.0, 0.1, probability=1.0)
    out = wn.apply(jax.random.key(0), img)
    assert float(jnp.abs(out - img).max()) > 0.0
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    never = pp.WhiteNoise(0.0, 0.1, probability=0.0)
    out2 = never.apply(jax.random.key(0), img)
    np.testing.assert_allclose(out2, img)


def test_gaussian_blur_preserves_mean():
    key = jax.random.key(0)
    img = jax.random.uniform(key, (32, 32))
    blurred = pp.gaussian_blur2d(img, (5, 5), (2.0, 2.0))
    assert float(jnp.std(blurred)) < float(jnp.std(img))
    assert float(jnp.mean(blurred)) == pytest.approx(float(jnp.mean(img)), abs=0.01)
    # Color images too.
    rgb = jax.random.uniform(key, (16, 16, 3))
    assert pp.gaussian_blur2d(rgb, (3, 3), (1.0, 1.0)).shape == (16, 16, 3)


def test_silhouette_darkens_borders():
    img = jnp.ones((64, 64))
    sil = pp.ApplySilhouette(probability=1.0)
    out = sil.apply(jax.random.key(1), img)
    assert float(out[0, 63]) < 0.2  # far corner outside the circle
    assert float(out.max()) > 0.8  # inside stays bright


def test_postprocessor_pipeline_jits():
    pipeline = pp.PostProcessor(
        [pp.GaussianBlur((3, 3), (5.0, 5.0), 0.5), pp.ApplySilhouette(), pp.WhiteNoise(0.0, 0.05, 0.5)]
    )
    img = jnp.full((32, 32), 0.5)
    fn = jax.jit(pipeline.post_process)
    out = fn(jax.random.key(0), img)
    assert out.shape == img.shape and bool(jnp.all(jnp.isfinite(out)))
    # vmapped over a batch of keys (dataset-scale augmentation).
    keys = jax.random.split(jax.random.key(0), 8)
    batch = jax.vmap(lambda k: pipeline.post_process(k, img))(keys)
    assert batch.shape == (8, 32, 32)

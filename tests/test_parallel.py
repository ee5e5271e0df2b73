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


def test_all_gather_frames(mesh):
    frames = jnp.arange(16.0).reshape(16, 1)
    frames = jax.device_put(
        frames,
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(parallel.DATA_AXIS)),
    )
    gathered = parallel.all_gather_frames(mesh, frames)
    assert gathered.shape == (16, 1)
    np.testing.assert_allclose(np.asarray(gathered).ravel(), np.arange(16.0))

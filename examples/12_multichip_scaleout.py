"""Multi-chip scale-out: variant-parallel rendering + psum pattern optimization.

NEW capability beyond the reference (which renders serially on one GPU,
SURVEY.md §2): shard randomized scene variants across a jax.sharding.Mesh —
each device renders its share — and run distributed pattern-optimization
steps with psum-averaged gradients.

Runs on whatever devices exist; to simulate a slice on CPU:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  FIREFLIES_PLATFORM=cpu python examples/12_multichip_scaleout.py
"""

import os

import jax
import jax.numpy as jnp

from _common import out_dir, save_variants

from fireflies_tpu import parallel
from fireflies_tpu.assets import scenes
from fireflies_tpu.datagen import tonemap
from fireflies_tpu.projection import laser as laser_mod
from fireflies_tpu.render import RenderConfig, SceneBridge, render_rgb

SIZE = int(os.environ.get("EXAMPLE_SIZE", 48))
PER_DEVICE = int(os.environ.get("EXAMPLE_PER_DEVICE", 2))

if __name__ == "__main__":
    mesh = parallel.make_mesh()
    n_dev = mesh.shape[parallel.DATA_AXIS]
    print(f"device mesh: {n_dev} x {parallel.DATA_AXIS}")

    scene, kwargs = scenes.vocalfold(resolution=12, n_anim_frames=4)
    bridge = SceneBridge(scene, **kwargs)
    randomize = scene.compile()
    cfg = RenderConfig(width=SIZE, height=SIZE, spp=1, max_bounces=2, tri_chunk=256)

    rays0 = laser_mod.generate_uniform_rays(0.0275, 8, 8)

    def texture(r):
        t = laser_mod.rays_to_texture_summed(r, 30.0, 6.0, (96, 96), chunk=32)
        return jnp.stack([jnp.zeros_like(t), t, jnp.zeros_like(t)], -1)

    # ---- 1. Variant-parallel rendering (dataset farming across the mesh) --
    def render_one(key, step):
        params = dict(randomize(key, step))
        params["tex.data"] = texture(rays0)
        return tonemap(render_rgb(bridge.assemble(params), key, cfg), exposure=2.0)

    run = parallel.variant_parallel(render_one, mesh)
    keys = parallel.shard_keys(mesh, jax.random.key(0), PER_DEVICE)
    steps = jnp.arange(keys.shape[0])
    frames = jax.jit(run)(keys, steps)
    print(f"rendered {frames.shape[0]} variants across {n_dev} devices:",
          frames.shape)
    save_variants("12_multichip_scaleout", frames[: min(4, len(frames))])

    # ---- 2. Distributed pattern-optimization step (psum gradients) --------
    def loss_fn(params, key):
        p = dict(randomize(key, 0))
        p["tex.data"] = texture(params["rays"])
        img = render_rgb(bridge.assemble(p), key, cfg)
        return -jnp.mean(img[..., 1])

    step = parallel.psum_grad_step(loss_fn, mesh)
    params = {"rays": rays0}
    loss, grad = jax.jit(step)(params, parallel.shard_keys(mesh, jax.random.key(1), PER_DEVICE))
    gnorm = float(jnp.linalg.norm(grad["rays"]))
    print(f"psum step: loss={float(loss):.5f} grad_norm={gnorm:.3e} "
          f"(gradients averaged over {n_dev * PER_DEVICE} variants on {n_dev} devices)")

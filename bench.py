"""Benchmark: 512x512 differentiable renders/sec/chip on the vocalfold scene.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

"Differentiable render" = forward render + reverse-mode gradient of an image
loss w.r.t. the projector texture (the pattern-optimization inner loop) —
i.e. the unit of work the BASELINE north star counts.  Baseline target is
>= 100 such renders/sec on a v5e-8, i.e. 12.5 per chip; vs_baseline is
value / 12.5.

Env overrides: BENCH_SIZE (default 512), BENCH_SPP, BENCH_BOUNCES,
BENCH_REPEATS, BENCH_RESOLUTION (mesh res).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

from fireflies_tpu.assets import scenes as ff_scenes
from fireflies_tpu.projection import laser as laser_mod
from fireflies_tpu.render import RenderConfig, SceneBridge, render_rgb


def main() -> None:
    size = int(os.environ.get("BENCH_SIZE", 512))
    spp = int(os.environ.get("BENCH_SPP", 1))
    bounces = int(os.environ.get("BENCH_BOUNCES", 2))
    repeats = int(os.environ.get("BENCH_REPEATS", 20))
    resolution = int(os.environ.get("BENCH_RESOLUTION", 24))
    batch = int(os.environ.get("BENCH_BATCH", 16))

    scene, kw = ff_scenes.vocalfold(resolution=resolution, n_anim_frames=4)
    bridge = SceneBridge(scene, **kw)
    randomize = scene.compile()
    cfg = RenderConfig(
        width=size, height=size, spp=spp, max_bounces=bounces, tri_chunk=512,
        ray_chunk=int(os.environ.get("BENCH_RAY_CHUNK", 0)) or 0,
    )

    rays0 = laser_mod.generate_uniform_rays(0.0275, 12, 12)  # ~150-beam pattern

    def loss(rays, key):
        # The north-star pattern-optimization step: differentiate the
        # rendered structured-light images w.r.t. the laser beam directions
        # THROUGH texture generation, averaged over a vmapped batch of
        # randomized variants (gradient accumulation, the framework's
        # production mode).
        tex = laser_mod.rays_to_texture_rgb(
            rays, 30.0, sigma=10.0, texture_size=(256, 256), blur_kernel=0
        )

        def one(k):
            params = dict(randomize(k, 0))
            params["tex.data"] = tex
            return jnp.mean(render_rgb(bridge.assemble(params), k, cfg))

        return jnp.mean(jax.vmap(one)(jax.random.split(key, batch)))

    step = jax.jit(jax.value_and_grad(loss))

    key = jax.random.key(0)
    # Warmup / compile.
    val, grad = step(rays0, key)
    jax.block_until_ready((val, grad))

    # Chained data dependency: each step consumes the previous gradient, so
    # steps cannot be elided or dishonestly overlapped; a single
    # block_until_ready at the end measures true sustained throughput.
    t0 = time.perf_counter()
    rays = rays0
    for i in range(repeats):
        val, grad = step(rays, jax.random.fold_in(key, i))
        rays = rays + 0.0 * grad
    jax.block_until_ready(rays)
    dt = time.perf_counter() - t0

    renders_per_sec = repeats * batch / dt
    baseline_per_chip = 12.5  # >=100 on v5e-8 (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": f"{size}x{size} diff-renders/sec/chip (vocalfold, spp={spp}, bounces={bounces})",
                "value": round(renders_per_sec, 3),
                "unit": "renders/sec/chip",
                "vs_baseline": round(renders_per_sec / baseline_per_chip, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

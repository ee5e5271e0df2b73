"""Component-level TPU timing: where do the milliseconds go?

Usage: python tools/profile_render.py [SIZE]
Times (median of repeats, compile excluded):
  closest-hit intersect, occlusion pass, depth AOV, full forward render,
  forward+backward (the bench unit), and the randomize+assemble overhead.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from fireflies_tpu.assets import scenes as ff_scenes
from fireflies_tpu.projection import laser as laser_mod
from fireflies_tpu.render import (
    RenderConfig,
    SceneBridge,
    intersect_brute,
    occluded,
    render_depth,
    render_rgb,
)
from fireflies_tpu.render.rays import camera_rays


def timeit(fn, *args, repeats=10):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    scene, kw = ff_scenes.vocalfold(resolution=24, n_anim_frames=4)
    bridge = SceneBridge(scene, **kw)
    randomize = scene.compile()
    cfg = RenderConfig(width=size, height=size, spp=1, max_bounces=2, tri_chunk=512)

    params = randomize(jax.random.key(0), 0)
    rs = bridge.assemble(params)
    n_tris = rs.geometry.faces.shape[0]
    print(f"scene: {n_tris} triangles, {size}x{size} = {size * size} rays")

    o, d = camera_rays(rs.camera, size, size)

    t = timeit(jax.jit(lambda o, d, v: intersect_brute(o, d, rs.geometry.replace(vertices=v), tri_chunk=512)), o, d, rs.geometry.vertices)
    print(f"closest-hit:        {t * 1e3:8.2f} ms  ({size * size * n_tris / t / 1e9:.1f} Gtests/s)")

    t = timeit(jax.jit(lambda o, d, v: occluded(o, d, rs.geometry.replace(vertices=v), t_max=10.0, tri_chunk=512)), o, d, rs.geometry.vertices)
    print(f"occlusion:          {t * 1e3:8.2f} ms")

    t = timeit(jax.jit(lambda rs: render_depth(rs, cfg)), rs)
    print(f"depth AOV:          {t * 1e3:8.2f} ms")

    t = timeit(jax.jit(lambda rs, k: render_rgb(rs, k, cfg)), rs, jax.random.key(0))
    print(f"forward render:     {t * 1e3:8.2f} ms")

    rays = laser_mod.generate_uniform_rays(0.0275, 12, 12)
    tex0 = laser_mod.rays_to_texture_summed(rays, 30.0, 10.0, (256, 256))
    tex0 = jnp.stack([jnp.zeros_like(tex0), tex0, jnp.zeros_like(tex0)], -1)

    def loss(tex, key):
        p = dict(randomize(key, 0))
        p["tex.data"] = tex
        return jnp.mean(render_rgb(bridge.assemble(p), key, cfg))

    t = timeit(jax.jit(jax.value_and_grad(loss)), tex0, jax.random.key(0))
    print(f"fwd+bwd (bench op): {t * 1e3:8.2f} ms  -> {1 / t:.2f} diff-renders/s")

    t = timeit(jax.jit(lambda k: bridge.assemble(randomize(k, 0)).geometry.vertices), jax.random.key(0))
    print(f"randomize+assemble: {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()

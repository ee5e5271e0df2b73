"""Component-level TPU timing: where do the milliseconds go?

Usage: python tools/profile_render.py [SIZE]

IMPORTANT (axon tunnel): device arrays must be passed as jit ARGUMENTS —
closure-capturing them permanently degrades dispatch (~30 ms floor); see
CLAUDE.md.  Timings use chained data dependencies with a single final block.

Interpretation caveat: single-dispatch numbers here include a large
per-dispatch overhead through the tunnel (tens of ms); the batched bench
(bench.py, vmap over 16 variants) is the trustworthy throughput figure —
it amortizes dispatch to ~3 ms per full fwd+bwd render.
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
    render_depth,
    render_rgb,
)
from fireflies_tpu.render.intersect import closest_hit, occluded_any
from fireflies_tpu.render.rays import camera_rays


def timeit_chained(fn, *args, repeats=15):
    """Chained wall time: out_{i+1} depends on out_i; one final block."""
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    acc = out
    for _ in range(repeats):
        nxt = fn(*args)
        acc = jax.tree.map(lambda a, b: a + 0.0 * b, acc, nxt)
    jax.block_until_ready(acc)
    return (time.perf_counter() - t0) / repeats


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    scene, kw = ff_scenes.vocalfold(resolution=24, n_anim_frames=4)
    bridge = SceneBridge(scene, **kw)
    randomize = scene.compile()
    cfg = RenderConfig(width=size, height=size, spp=1, max_bounces=2, tri_chunk=512)

    assemble = jax.jit(lambda k: bridge.assemble(randomize(k, 0)))
    rs = assemble(jax.random.key(0))
    n_tris = rs.geometry.faces.shape[0]
    print(f"scene: {n_tris} triangles, {size}x{size} = {size * size} rays")

    o, d = camera_rays(rs.camera, size, size)
    cam_pos = rs.camera.to_world[:3, 3]

    f_closest = jax.jit(
        lambda rs, d, org: closest_hit(None, d, rs.geometry, shared_origin=org).t
    )
    t = timeit_chained(f_closest, rs, d, cam_pos)
    print(f"closest (shared):   {t * 1e3:8.2f} ms  ({size * size * n_tris / t / 1e9:.1f} Gtests/s bound)")

    f_any = jax.jit(
        lambda rs, d, org: occluded_any(
            None, d, rs.geometry, t_max=1.0 - 1e-4, shared_origin=org
        ).astype(jnp.float32)
    )
    seg = (o + d * 2.0) - cam_pos
    t = timeit_chained(f_any, rs, seg, cam_pos)
    print(f"anyhit (shared):    {t * 1e3:8.2f} ms")

    f_depth = jax.jit(lambda rs: render_depth(rs, cfg))
    t = timeit_chained(f_depth, rs)
    print(f"depth AOV:          {t * 1e3:8.2f} ms")

    f_fwd = jax.jit(lambda rs, k: render_rgb(rs, k, cfg))
    t = timeit_chained(f_fwd, rs, jax.random.key(0))
    print(f"forward render:     {t * 1e3:8.2f} ms")

    rays0 = laser_mod.generate_uniform_rays(0.0275, 12, 12)

    def loss(rays, key):
        tex = laser_mod.rays_to_texture_rgb(
            rays, 30.0, sigma=10.0, texture_size=(256, 256), blur_kernel=0
        )
        params = dict(randomize(key, 0))
        params["tex.data"] = tex
        return jnp.mean(render_rgb(bridge.assemble(params), key, cfg))

    f_step = jax.jit(jax.value_and_grad(loss))

    def one_step(rays, key):
        v, g = f_step(rays, key)
        return rays + 0.0 * g

    t = timeit_chained(jax.jit(one_step), rays0, jax.random.key(0))
    print(f"fwd+bwd (bench op): {t * 1e3:8.2f} ms  -> {1 / t:.2f} diff-renders/s (batch 1)")

    t = timeit_chained(assemble, jax.random.key(1))
    print(f"randomize+assemble: {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()

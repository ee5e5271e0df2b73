"""Analytic beam-splat projector: the fast path for pattern optimization.

The texture route (example 11) rasterizes the beam pattern to a projector
texture each step and the renderer gathers from it at every NEE vertex —
two per-bounce multi-million-row gathers plus a scatter in the backward
pass.  Beam mode instead evaluates the SAME continuous Gaussian splat
field analytically at each shading point's projector-NDC coordinates
(render/lights.py), so the pattern is differentiable directly w.r.t. the
beam directions with no texture in the loop.  Measured on a v5e chip this
is ~1.5x the texture route (bench.py headline; BENCH_VARIANTS.json).

Reference twin: the rasterized-pattern optimization intent of
examples/09-11 + rasterization.py:575-583 (the reference has no analytic
emitter; this is a TPU-first reformulation of the same workload).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from _common import out_dir

from fireflies_tpu import optim
from fireflies_tpu.assets import scenes
from fireflies_tpu.projection import laser as laser_mod
from fireflies_tpu.render import RenderConfig, SceneBridge, render_rgb
from fireflies_tpu.utils.png import write_png

SIZE = int(os.environ.get("EXAMPLE_SIZE", 64))
STEPS = int(os.environ.get("EXAMPLE_STEPS", 10))

if __name__ == "__main__":
    scene, kwargs = scenes.vocalfold(resolution=12, n_anim_frames=4)
    bridge = SceneBridge(scene, **kwargs)
    randomize = scene.compile()
    cfg = RenderConfig(width=SIZE, height=SIZE, spp=1, max_bounces=1, tri_chunk=256)

    def beam_params_fn(rays):
        # Same sigma/extent as the texture route would rasterize; the
        # emitter evaluates the splat field analytically instead.
        return laser_mod.rays_to_beam_params(
            rays, 30.0, sigma=6.0, texture_size=(128, 128)
        )

    loss_fn = optim.make_variant_loss(
        randomize_fn=randomize,
        assemble_fn=bridge.assemble,
        render_fn=lambda s, k: render_rgb(s, k, cfg),
        objective=optim.dot_coverage_objective(channel=1),
        pattern_params_fn=beam_params_fn,
    )

    rays0 = laser_mod.generate_uniform_rays(0.0275, 12, 12)  # 144 beams
    res = optim.optimize_pattern_through_render(
        loss_fn, rays0, jax.random.key(0), steps=STEPS, batch=2,
        learning_rate=2e-3, fov_deg=30.0,
    )
    print(f"objective {float(res.losses[0]):.4f} -> {float(res.losses[-1]):.4f}")

    d = out_dir("14_analytic_projector")

    def splat_image(rays):
        tex = laser_mod.rays_to_texture_summed(rays, 30.0, 6.0, (128, 128), chunk=32)
        return jnp.stack([jnp.zeros_like(tex), tex, jnp.zeros_like(tex)], -1)

    write_png(str(d / "pattern_before.png"), np.asarray(splat_image(rays0)))
    write_png(str(d / "pattern_after.png"), np.asarray(splat_image(res.rays)))
    params = dict(randomize(jax.random.key(5), 0))
    params.update(beam_params_fn(res.rays))
    img = render_rgb(bridge.assemble(params), jax.random.key(5), cfg)
    write_png(str(d / "render_with_pattern.png"), np.asarray(jnp.clip(img, 0, 1)))
    print("wrote results to", d)

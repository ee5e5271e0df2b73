"""Domain-specific pattern optimization: vocalfold structured light.

Restores the reference's empty examples/11_domain_specific_pattern_optim.py —
the paper's north-star workload: optimize a ~150-beam laser pattern through
the differentiable renderer on randomized vocalfold variants.
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

    def texture_fn(rays):
        tex = laser_mod.rays_to_texture_summed(rays, 30.0, 6.0, (128, 128), chunk=32)
        return jnp.stack([jnp.zeros_like(tex), tex, jnp.zeros_like(tex)], -1)

    loss_fn = optim.make_variant_loss(
        randomize_fn=randomize,
        assemble_fn=bridge.assemble,
        render_fn=lambda s, k: render_rgb(s, k, cfg),
        objective=optim.dot_coverage_objective(channel=1),
        texture_fn=texture_fn,
    )

    rays0 = laser_mod.generate_uniform_rays(0.0275, 12, 12)  # 144 beams
    res = optim.optimize_pattern_through_render(
        loss_fn, rays0, jax.random.key(0), steps=STEPS, batch=2,
        learning_rate=2e-3, fov_deg=30.0,
    )
    print(f"objective {float(res.losses[0]):.4f} -> {float(res.losses[-1]):.4f}")

    d = out_dir("11_domain_specific_pattern_optim")
    write_png(str(d / "pattern_before.png"), np.asarray(texture_fn(rays0)))
    write_png(str(d / "pattern_after.png"), np.asarray(texture_fn(res.rays)))
    params = dict(randomize(jax.random.key(5), 0))
    params["tex.data"] = texture_fn(res.rays)
    img = render_rgb(bridge.assemble(params), jax.random.key(5), cfg)
    write_png(str(d / "render_with_pattern.png"), np.asarray(jnp.clip(img, 0, 1)))
    print("wrote results to", d)

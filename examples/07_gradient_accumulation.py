"""Gradient accumulation across randomized variants.

Restores the reference's empty examples/07_gradient_accumulation.py
(SURVEY.md §2): average gradients of a render loss over a batch of randomized
scene variants — on one chip via vmap, across chips via psum
(fireflies_tpu.parallel.psum_grad_step).
"""

import jax
import jax.numpy as jnp

from _common import out_dir

from fireflies_tpu import optim
from fireflies_tpu.assets import scenes
from fireflies_tpu.render import RenderConfig, SceneBridge, render_rgb

if __name__ == "__main__":
    scene, kwargs = scenes.hello_world()
    bridge = SceneBridge(scene, **kwargs)
    randomize = scene.compile()
    cfg = RenderConfig(width=32, height=32, spp=1, max_bounces=2, tri_chunk=128)

    # Optimize the light intensity so the mean image brightness hits 0.25,
    # with gradients accumulated over 8 randomized variants per step.
    def loss_fn(trainable, key):
        params = dict(randomize(key, 0))
        params["light-Point.intensity"] = trainable["intensity"]
        img = render_rgb(bridge.assemble(params), key, cfg)
        return (jnp.mean(img) - 0.25) ** 2

    res = optim.optimize_params(
        {"intensity": jnp.full((3,), 5.0)},
        loss_fn,
        jax.random.key(0),
        steps=30,
        learning_rate=0.5,
        grad_batch=8,
    )
    print("final loss:", float(res.losses[-1]))
    print("optimized intensity:", res.params["intensity"])
    (out_dir("07_gradient_accumulation") / "result.txt").write_text(
        f"loss={float(res.losses[-1])}\nintensity={res.params['intensity']}\n"
    )

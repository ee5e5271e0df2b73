"""Inverse rendering: recover a mesh pose from target depth images.

Restores the reference's empty examples/08_optimization.py: differentiate
depth renders w.r.t. vertex positions (detached traversal + re-derived hit)
and descend to match a target.

Note: detached-traversal gradients cover *interior* shading/depth but not
silhouettes — lateral (x/y) translation of an object against empty space has
zero gradient until reparameterized visibility lands (ARCHITECTURE.md
roadmap; Mitsuba gets this from its reparameterized integrators).  This
example therefore optimizes the depth-axis offset, where gradients are exact.
"""

import jax
import jax.numpy as jnp

from _common import out_dir

from fireflies_tpu import optim
from fireflies_tpu.assets import scenes
from fireflies_tpu.render import RenderConfig, SceneBridge, render_depth_differentiable

if __name__ == "__main__":
    scene, kwargs = scenes.hello_world(randomize_rotation=False)
    bridge = SceneBridge(scene, **kwargs)
    randomize = scene.compile()
    cfg = RenderConfig(width=32, height=32, spp=1, max_bounces=1, tri_chunk=128)

    base_params = dict(randomize(jax.random.key(0), 0))
    depth_axis = jnp.array([0.0, 0.3, -1.0])  # toward/away from the camera
    depth_axis = depth_axis / jnp.linalg.norm(depth_axis)

    def depth_with_offset(offset):
        params = dict(base_params)
        params["mesh-Cube.vertex_positions"] = (
            params["mesh-Cube.vertex_positions"] + depth_axis[None, :] * offset
        )
        return render_depth_differentiable(bridge.assemble(params), cfg)

    true_offset = jnp.asarray(0.35)
    target = depth_with_offset(true_offset)

    def loss_fn(trainable, key):
        d = depth_with_offset(trainable["offset"])
        # Mask to pixels where BOTH maps hit geometry: background(0)-vs-depth
        # mismatches at the silhouette carry no usable interior gradient and
        # would otherwise dominate the L2 with the wrong direction.
        both = jax.lax.stop_gradient((d > 0) & (target > 0))
        n = jnp.maximum(jnp.sum(both), 1)
        return jnp.sum(jnp.where(both, (d - target) ** 2, 0.0)) / n

    res = optim.optimize_params(
        {"offset": jnp.asarray(0.0)}, loss_fn, jax.random.key(0), steps=200,
        learning_rate=1e-2,
    )
    print("recovered offset:", float(res.params["offset"]), "target:", float(true_offset))
    (out_dir("08_optimization") / "result.txt").write_text(
        f"recovered={float(res.params['offset'])}\ntarget={float(true_offset)}\n"
        f"final_loss={float(res.losses[-1])}\n"
    )

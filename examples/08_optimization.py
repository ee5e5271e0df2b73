"""Inverse rendering: recover a mesh pose from target depth images.

Restores the reference's empty examples/08_optimization.py: differentiate
depth renders w.r.t. vertex positions (detached traversal + re-derived hit)
and descend to match a target.

Two gradient regimes are demonstrated:
  1. detached-traversal depth gradients (exact in lobe interiors) recover a
     depth-axis offset;
  2. SoftRas-style soft-silhouette gradients (render_soft_silhouette) recover
     a LATERAL offset — the direction detached traversal cannot see
     (Mitsuba gets this from reparameterized integrators; we get it from the
     soft rasterizer).
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
    print("depth-axis recovered:", float(res.params["offset"]), "target:", float(true_offset))

    # --- Part 2: lateral offset via soft silhouettes -----------------------
    from fireflies_tpu.render import render_soft_silhouette

    lateral_axis = jnp.array([1.0, 0.0, 0.0])

    def sil_with_offset(offset):
        params = dict(base_params)
        params["mesh-Cube.vertex_positions"] = (
            params["mesh-Cube.vertex_positions"] + lateral_axis[None, :] * offset
        )
        return render_soft_silhouette(bridge.assemble(params), cfg, sigma=2e-4)

    true_lateral = jnp.asarray(0.3)
    target_sil = sil_with_offset(true_lateral)

    def sil_loss(trainable, key):
        return jnp.mean((sil_with_offset(trainable["dx"]) - target_sil) ** 2)

    res2 = optim.optimize_params(
        {"dx": jnp.asarray(0.0)}, sil_loss, jax.random.key(0), steps=150,
        learning_rate=2e-2,
    )
    print("lateral recovered:", float(res2.params["dx"]), "target:", float(true_lateral))
    (out_dir("08_optimization") / "result.txt").write_text(
        f"depth recovered={float(res.params['offset'])} target={float(true_offset)}\n"
        f"lateral recovered={float(res2.params['dx'])} target={float(true_lateral)}\n"
    )

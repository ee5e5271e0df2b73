"""Procedural + keyframe vertex animation.

Reference twin: examples/06_animation.py:19-46 (animation function) and the
OBJ-sequence path of main.py:84-86.
"""

import jax.numpy as jnp

from _common import render_randomized_variants, save_variants

from fireflies_tpu.assets import scenes

if __name__ == "__main__":
    scene, kwargs = scenes.hello_world(randomize_rotation=False)
    mesh = scene.mesh_at(0)

    # Procedural wobble: f(vertices, t) must be jax-traceable.
    def wobble(vertices, t):
        bend = 0.4 * jnp.sin(4.0 * vertices[:, 0] + 6.28 * t)
        return vertices.at[:, 1].add(bend)

    mesh.add_animation_func(wobble, 0.0, 1.0)

    images = render_randomized_variants(scene, kwargs)
    save_variants("06_animation", images)

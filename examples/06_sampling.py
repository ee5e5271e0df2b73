"""Custom samplers: gaussian scale sampler on a mesh.

Reference twin: examples/06_sampling.py:100-107.
"""

import jax.numpy as jnp

from _common import render_randomized_variants, save_variants

from fireflies_tpu import sampling
from fireflies_tpu.assets import scenes

if __name__ == "__main__":
    scene, kwargs = scenes.hello_world()
    mesh = scene.mesh_at(0)
    mesh.set_scale_sampler(
        sampling.GaussianSampler.create(jnp.ones(3), jnp.full(3, 0.25))
    )

    images = render_randomized_variants(scene, kwargs)
    save_variants("06_sampling", images)

"""Material randomization: principled-BSDF float/vec3 keys.

Reference twin: examples/04_material_randomization.py:163-168.
"""

import jax.numpy as jnp

from _common import render_randomized_variants, save_variants

from fireflies_tpu.assets import scenes

if __name__ == "__main__":
    scene, kwargs = scenes.hello_world()
    mat = scene.material("mat-Cube")
    mat.add_vec3_key("base_color", jnp.array([0.1, 0.1, 0.1]), jnp.array([0.9, 0.9, 0.9]))
    mat.add_float_key("roughness", 0.05, 1.0)
    mat.add_float_key("metallic", 0.0, 1.0)
    mat.add_float_key("specular", 0.0, 1.0)
    mat.add_float_key("clearcoat", 0.0, 1.0)

    images = render_randomized_variants(scene, kwargs, spp=4)
    save_variants("04_material_randomization", images)

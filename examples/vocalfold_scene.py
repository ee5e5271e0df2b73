"""The full vocalfold structured-light scene + dataset mini-run.

Reference twin: examples/vocalfold_scene.py + the main.py dataset loop
(randomize -> render -> segment -> post-process -> reject -> save), batched.
"""

import os

import jax
import jax.numpy as jnp

from _common import out_dir

from fireflies_tpu import datagen, postprocessing as pp, sampling
from fireflies_tpu.projection import laser as laser_mod
from fireflies_tpu.assets import scenes
from fireflies_tpu.render import RenderConfig, SceneBridge, render_rgb, render_segmentation

SIZE = int(os.environ.get("EXAMPLE_SIZE", 64))
N_FRAMES = int(os.environ.get("EXAMPLE_FRAMES", 8))

if __name__ == "__main__":
    scene, kwargs = scenes.vocalfold(resolution=16, n_anim_frames=4)

    # Randomization spec (reference main.py:79-123).
    vf = scene.mesh("mesh-Vocalfold")
    vf.scale_x(1.0, 1.5)
    vf.scale_z(1.0, 1.5)
    vf.rotate_y(-0.2, 0.2)
    mat = scene.material("mat-Mucosa")
    for k in ("clearcoat", "roughness", "sheen"):
        mat.add_float_key(k, 0.0, 1.0)
    light = scene.light("emit-Spot")
    light.add_vec3_sampler(
        "intensity.value", sampling.UniformScalarToVec3Sampler.create(5.0, 25.0)
    )

    bridge = SceneBridge(scene, **kwargs)
    randomize = scene.compile()
    cfg = RenderConfig(width=SIZE, height=SIZE, spp=2, max_bounces=2, tri_chunk=256)

    rays = laser_mod.generate_uniform_rays(0.0275, 12, 12)
    tex = laser_mod.rays_to_texture_summed(rays, 30.0, 6.0, (128, 128))
    tex_rgb = jnp.stack([jnp.zeros_like(tex), tex, jnp.zeros_like(tex)], -1)

    pipeline = pp.PostProcessor(
        [pp.GaussianBlur((3, 3), (5.0, 5.0), 0.5), pp.ApplySilhouette(), pp.WhiteNoise(0.0, 0.05, 0.5)]
    )

    @jax.jit
    def render_batch(keys, steps):
        def one(k, s):
            params = dict(randomize(k, s))
            params["tex.data"] = tex_rgb
            rs = bridge.assemble(params)
            img = datagen.to_grayscale(datagen.tonemap(render_rgb(rs, k, cfg), exposure=2.0))
            img = pipeline.post_process(jax.random.fold_in(k, 99), img)
            seg = render_segmentation(rs, cfg)
            return img, seg

        return jax.vmap(one)(keys, steps)

    n = datagen.generate_dataset(
        render_batch,
        n_frames=N_FRAMES,
        out_dir=out_dir("vocalfold_dataset"),
        key=jax.random.key(0),
        batch=4,
        rejection=datagen.RejectionConfig(min_coverage=0.01, max_components=3, target_mesh_id=1),
    )
    print(f"dataset frames written: {n}")

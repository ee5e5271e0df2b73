"""Warped-area visibility gradients: pose recovery from a DEPTH-ONLY loss.

The discriminating demo for render/reparam.py: recover a lateral offset of
an object whose interior depth never changes — the entire learning signal is
the silhouette boundary flux, which the detached path tracer reports as
exactly zero (the quantity examples/08 needed a soft-silhouette mask for).
Here no mask is used: `render_depth_reparam` alone carries the gradient.

Reference parity: Fireflies leans on Mitsuba's reparameterized/PRB
integrators for such gradients (reference scene.py:384 mi.render); this is
the TPU-native equivalent for primary visibility.

Outputs: target depth, initial depth, recovered depth + convergence log.
"""

import numpy as np
import jax
import jax.numpy as jnp

from _common import SIZE, out_dir  # noqa: F401  (sets platform, sys.path)

import optax  # noqa: E402

from fireflies_tpu.render import RenderConfig, render_depth_reparam  # noqa: E402
from fireflies_tpu.render.types import (  # noqa: E402
    Camera,
    Geometry,
    Lights,
    Materials,
    RenderScene,
)
from fireflies_tpu.utils.png import write_png  # noqa: E402

RES = min(SIZE, 96)


def make_scene(dx):
    half, z = 0.5, -2.0
    verts = jnp.array(
        [[-half, -half, z], [half, -half, z], [half, half, z], [-half, half, z]],
        jnp.float32,
    ) + jnp.stack([dx, jnp.zeros_like(dx), jnp.zeros_like(dx)])[None, :]
    faces = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
    geo = Geometry(
        vertices=verts,
        faces=faces,
        face_mat=jnp.zeros(2, jnp.int32),
        face_mesh=jnp.zeros(2, jnp.int32),
    )
    return RenderScene(
        geometry=geo,
        materials=Materials.default(1),
        lights=Lights.empty(),
        camera=Camera.create(jnp.eye(4), fov=60.0),
    )


def main():
    cfg = RenderConfig(width=RES, height=RES, tri_chunk=16)
    target_dx = 0.3
    target = render_depth_reparam(make_scene(jnp.asarray(target_dx)), cfg,
                                  jax.random.key(99))

    def loss_fn(dx, key):
        depth = render_depth_reparam(make_scene(dx), cfg, key, k_aux=8,
                                     radius=0.08)
        return jnp.mean((depth - target) ** 2)

    opt = optax.adam(3e-2)
    dx = jnp.asarray(0.0)
    state = opt.init(dx)

    @jax.jit
    def step(dx, state, key):
        loss, g = jax.value_and_grad(loss_fn)(dx, key)
        updates, state = opt.update(g, state)
        return optax.apply_updates(dx, updates), state, loss, g

    d = out_dir("13_warped_area_gradients")
    init_depth = render_depth_reparam(make_scene(dx), cfg, jax.random.key(0))

    key = jax.random.key(0)
    for i in range(120):
        key, sub = jax.random.split(key)
        dx, state, loss, g = step(dx, state, sub)
        if i % 20 == 0 or i == 119:
            print(f"step {i:3d}  dx={float(dx):+.4f}  loss={float(loss):.3e}  "
                  f"grad={float(g):+.3e}")

    final_depth = render_depth_reparam(make_scene(dx), cfg, jax.random.key(1))

    def to_img(depth):
        depth = np.asarray(depth)
        lo, hi = depth[depth > 0].min() if (depth > 0).any() else 0.0, depth.max()
        norm = np.where(depth > 0, (depth - lo) / max(hi - lo, 1e-6) * 0.7 + 0.3, 0.0)
        return np.repeat(norm[..., None], 3, axis=-1).astype(np.float32)

    write_png(str(d / "target.png"), to_img(target))
    write_png(str(d / "initial.png"), to_img(init_depth))
    write_png(str(d / "recovered.png"), to_img(final_depth))

    err = abs(float(dx) - target_dx)
    print(f"[13] recovered dx={float(dx):+.4f} (target {target_dx:+.4f}, "
          f"err {err:.4f}); depth-only loss, no silhouette mask")
    assert err < 0.03, "warped-area gradients failed to recover the offset"
    print(f"[13] wrote target/initial/recovered depth to {d}")


if __name__ == "__main__":
    main()

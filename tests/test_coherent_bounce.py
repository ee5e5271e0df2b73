"""Tile-coherent bounce sampling (RenderConfig.coherent_bounce).

Every 2048-ray kernel tile shares one BSDF sample draw per bounce; each
pixel's draw is still marginally U(0, 1), so per-pixel estimates must be
unbiased — the image EXPECTATION must match the iid sampler.  Only the
cross-pixel noise correlation may differ.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fireflies_tpu.render import RenderConfig, render_rgb
from fireflies_tpu.render.types import (
    Camera,
    Geometry,
    Lights,
    Materials,
    RenderScene,
)


def _box_scene():
    """Camera inside an open box (floor + back wall + side), spot light:
    indirect light from the walls makes the second bounce matter."""
    quads = [
        # floor y = -1
        ([-3, -1, -6], [3, -1, -6], [3, -1, 0], [-3, -1, 0]),
        # back wall z = -6
        ([-3, -1, -6], [3, -1, -6], [3, 3, -6], [-3, 3, -6]),
        # left wall x = -3
        ([-3, -1, -6], [-3, -1, 0], [-3, 3, 0], [-3, 3, -6]),
    ]
    verts, faces = [], []
    for q in quads:
        b = len(verts)
        verts.extend(q)
        faces.append([b, b + 1, b + 2])
        faces.append([b, b + 2, b + 3])
    verts = jnp.asarray(np.array(verts, np.float32))
    faces = jnp.asarray(np.array(faces, np.int32))
    geo = Geometry(
        vertices=verts,
        faces=faces,
        face_mat=jnp.zeros(faces.shape[0], jnp.int32),
        face_mesh=jnp.zeros(faces.shape[0], jnp.int32),
    )
    mats = Materials.default(1).replace(
        base_color=jnp.full((1, 3), 0.7, jnp.float32),
        specular=jnp.full((1,), 0.3),
        roughness=jnp.full((1,), 0.4),
    )
    lw = np.eye(4, dtype=np.float32)
    lw[:3, 3] = (1.0, 2.0, -2.0)
    lights = Lights(
        kinds=jnp.zeros(1, jnp.int32),
        to_world=jnp.asarray(lw)[None],
        intensity=jnp.full((1, 3), 8.0, jnp.float32),
        cutoff_cos=jnp.zeros(1),
        beam_cos=jnp.ones(1),
        active=jnp.ones(1, bool),
    )
    cam = Camera.create(jnp.eye(4), fov=60.0)
    return RenderScene(geometry=geo, materials=mats, lights=lights, camera=cam)


def test_coherent_bounce_unbiased():
    scene = _box_scene()
    cfg = RenderConfig(width=16, height=16, spp=8, max_bounces=3, tri_chunk=64)

    import functools

    @functools.partial(jax.jit, static_argnames=("coherent",))
    def mean_img(k, coherent):
        c = cfg.replace(coherent_bounce=coherent)
        return jnp.mean(render_rgb(scene, k, c))

    keys = jax.random.split(jax.random.key(0), 24)
    iid = np.array([float(mean_img(k, coherent=False)) for k in keys])
    coh = np.array([float(mean_img(k, coherent=True)) for k in keys])
    # Same expectation: grand means within each other's standard errors.
    se = float(np.hypot(iid.std() / np.sqrt(len(iid)), coh.std() / np.sqrt(len(coh))))
    assert abs(iid.mean() - coh.mean()) < max(4.0 * se, 0.02 * iid.mean())


def test_coherent_bounce_per_pixel_variance_parity():
    """Per-PIXEL noise must not degrade: a pixel's estimate is the same
    function of one marginally-U(0,1) draw in both modes, so its variance
    is identical in expectation — sharing changes only the cross-pixel
    correlation.  This is the quality claim that lets the reference-workload
    bench run coherent_bounce: equal noise per sample per pixel."""
    scene = _box_scene()
    cfg = RenderConfig(width=16, height=16, spp=2, max_bounces=3, tri_chunk=64)

    import functools

    @functools.partial(jax.jit, static_argnames=("coherent",))
    def img(k, coherent):
        return render_rgb(scene, k, cfg.replace(coherent_bounce=coherent))

    keys = jax.random.split(jax.random.key(7), 32)
    iid = np.stack([np.asarray(img(k, coherent=False)) for k in keys])
    coh = np.stack([np.asarray(img(k, coherent=True)) for k in keys])
    # Mean per-pixel variance across seeds.  Coherent pixel variances are
    # correlated across the image (shared draws), so the averaged estimate
    # keeps ~the single-pixel chi-square noise (rel std ~ sqrt(2/31) = 25%);
    # the band below catches any real blowup (2x) without flaking.
    v_iid = float(iid.var(axis=0).mean())
    v_coh = float(coh.var(axis=0).mean())
    assert v_iid > 0
    ratio = v_coh / v_iid
    assert 0.5 < ratio < 2.0, (v_iid, v_coh)


def test_coherent_bounce_gradients_finite():
    """The shared-draw path must stay differentiable (pattern-optimization
    unit of work runs under grad)."""
    scene = _box_scene()
    cfg = RenderConfig(
        width=8, height=8, spp=2, max_bounces=2, tri_chunk=64,
        coherent_bounce=True,
    )

    def loss(intensity):
        s = scene.replace(
            lights=scene.lights.replace(intensity=jnp.full((1, 3), intensity))
        )
        return jnp.mean(render_rgb(s, jax.random.key(1), cfg))

    g = jax.grad(loss)(8.0)
    assert np.isfinite(float(g)) and float(g) > 0.0

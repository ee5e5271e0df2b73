"""Static-geometry attribute fast path (RenderConfig.static_geometry).

Hit attributes come straight from the traversal (kernel-emitted on TPU,
one narrow packed gather elsewhere) instead of the differentiable
face-table re-derivation.  The PRIMAL image must match the default path
(same geometric normal — the Woop W2 row is cross(e1, e2)/det, the same
orientation the gather path normalizes; position o + t*d vs barycentric
re-derivation differ only by FP noise).  Gradients w.r.t. NON-geometry
parameters (emitters, materials) must keep flowing; gradients w.r.t.
vertices are zero by design (Dr.Jit-equivalent semantics when only
emitter params are attached — reference main.py only attaches the laser
texture to the AD graph).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from fireflies_tpu.render import RenderConfig, render_rgb
from tests.test_coherent_bounce import _box_scene


def _cfg(**kw):
    return RenderConfig(width=24, height=24, spp=2, max_bounces=2,
                        tri_chunk=64, **kw)


def test_static_geometry_primal_matches_default():
    scene = _box_scene()

    @functools.partial(jax.jit, static_argnames=("static",))
    def img(k, static):
        return render_rgb(scene, k, _cfg(static_geometry=static))

    k = jax.random.key(3)
    a = np.asarray(img(k, static=False))
    b = np.asarray(img(k, static=True))
    assert np.isfinite(b).all()
    np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-3)


def test_static_geometry_nongeometry_gradients_flow():
    scene = _box_scene()
    cfg = _cfg(static_geometry=True)

    def loss(intensity):
        s = scene.replace(
            lights=scene.lights.replace(intensity=jnp.full((1, 3), intensity))
        )
        return jnp.mean(render_rgb(s, jax.random.key(1), cfg))

    g = float(jax.grad(loss)(8.0))
    assert np.isfinite(g) and g > 0.0


def test_static_geometry_vertex_gradients_zero():
    """The documented contract: vertices are detached in this mode."""
    scene = _box_scene()
    cfg = _cfg(static_geometry=True)

    def loss(dz):
        g = scene.geometry
        s = scene.replace(geometry=g.replace(
            vertices=g.vertices + jnp.stack([0.0 * dz, 0.0 * dz, dz])
        ))
        return jnp.mean(render_rgb(s, jax.random.key(1), cfg))

    g = float(jax.grad(loss)(jnp.asarray(0.0)))
    assert g == 0.0


def test_static_geometry_falls_back_with_smooth_normals():
    """Scenes needing interpolated quantities silently use the gather path
    (the gate, not the caller, owns the decision)."""
    scene = _box_scene()
    geo = scene.geometry
    # Flat-marked smooth normals (all-zero rows = flat sentinel would kick
    # in per-face; use real vertex normals so has_normals is True).
    n = jnp.zeros_like(geo.vertices).at[:, 1].set(1.0)
    scene_sm = scene.replace(geometry=geo.replace(normals=n))

    img = render_rgb(scene_sm, jax.random.key(0), _cfg(static_geometry=True))
    assert np.isfinite(np.asarray(img)).all()

"""KNOWN BUG (r5, open): NaN vertex gradients at max_bounces=3 in a
two-bounce transport scene.

Repro: camera -> wall A (z=-2, faces +z) -> wall B (z=0, faces -z) ->
emissive panel (y=-4, y-normal, below A); a grey blocker in the y=-2
plane between B and the panel, translated by dx (the differentiated
input).  d(mean image)/d(dx) is NaN at max_bounces=3 (spp>=2, key 0)
while max_bounces=2 returns exactly 0.0 on the same scene.

r5 bisection (all measured, 8x8 film, spp 2):
  * FF_CONST_SAMPLE=1 (mirror direction / unit pdf / grey f in place of
    bsdf.sample_v) -> clean 0.0: the NaN is born in the backward of the
    sample_v -> pdf_v/evaluate_v chain at the SECOND _sample_bounce.
  * A non-black panel (base_color 0.5) still NaNs -> not the black-
    material lobe-probability normalization.
  * spp=1 with the same scene and a directly-driven _film_render is
    clean -> specific sample draws hit the degenerate lane.
  * The dx dependence reaches sample_v only through the blocker's
    normal/attr chain, whose forward value is dx-free (pure translation
    cancels in e1/e2) — so the NaN is an unbounded local VJP (sqrt/1/x
    at an attainable degenerate input) somewhere in that chain turning
    an analytically-zero cotangent into inf * 0.

Decisive final bisection (monkeypatched _sample_bounce, same repro):
  * stop_gradient on the bounce-1 OUTPUT RAY (o, d) -> still NaN;
  * stop_gradient on the bounce-1 THROUGHPUT -> clean 0.0.
So the NaN is born on the backward chain
    vertex-1 shading normal ns -> cos_i = |ns . wi| -> throughput,
NOT on the ray/position path: the cotangent arriving at the vertex-1
attrs' normal (face-table gather -> e1 x e2 -> normalized -> flip) is
already NaN.  Since stubbing pdf_v/evaluate_v to constants does NOT
clear it, the inf/NaN factor multiplying that cotangent is in the
throughput product's backward itself (thr * f * cos_i/safe_pdf chain
across the two bounces), e.g. an inf-magnitude f or pdf reached on a
masked lane.  Vec3.normalized, _d_ggx_stable, _lobe_probs, _frame
(Frisvad), abs-at-zero, and the double-where inv_det guards all audit
safe individually.  Marked xfail until root-caused.
"""

import jax
import jax.numpy as jnp
import pytest

from fireflies_tpu.render import RenderConfig
from fireflies_tpu.render.pathtracer import render_rgb
from fireflies_tpu.render.types import (
    Camera, Geometry, Lights, Materials, RenderScene,
)


def _scene(dx):
    quads = [
        jnp.asarray([[-1, -1, -2], [1, -1, -2], [1, 1, -2], [-1, 1, -2]],
                    jnp.float32),
        jnp.asarray([[-2, -1.2, 0], [2, -1.2, 0], [2, 1.5, 0], [-2, 1.5, 0]],
                    jnp.float32),
        jnp.asarray([[-3, -4, -2.4], [3, -4, -2.4], [3, -4, -0.8],
                     [-3, -4, -0.8]], jnp.float32),
    ]
    bl = jnp.asarray(
        [[-1, -2, -1.4], [1, -2, -1.4], [1, -2, -0.6], [-1, -2, -0.6]],
        jnp.float32,
    ) + jnp.stack([dx, jnp.zeros_like(dx), jnp.zeros_like(dx)])[None, :]
    quads.append(bl)
    verts = jnp.concatenate(quads)
    faces = []
    for q in range(4):
        b = 4 * q
        faces += [[b, b + 1, b + 2], [b, b + 2, b + 3]]
    geo = Geometry(
        vertices=verts, faces=jnp.asarray(faces, jnp.int32),
        face_mat=jnp.asarray([0, 0, 0, 0, 1, 1, 0, 0], jnp.int32),
        face_mesh=jnp.asarray([0, 0, 1, 1, 2, 2, 3, 3], jnp.int32),
    )
    mats = Materials.default(2).replace(
        base_color=jnp.asarray([[0.8] * 3, [0.0] * 3], jnp.float32),
        specular=jnp.zeros(2), roughness=jnp.ones(2),
        emission=jnp.asarray([[0.0] * 3, [24.0] * 3], jnp.float32),
    )
    return RenderScene(geometry=geo, materials=mats, lights=Lights.empty(),
                       camera=Camera.create(jnp.eye(4), fov=60.0))


def _grad(mb):
    cfg = RenderConfig(width=8, height=8, spp=2, max_bounces=mb, tri_chunk=16)
    return float(jax.grad(lambda dx: jnp.mean(
        render_rgb(_scene(dx), jax.random.key(0), cfg)[..., 0]
    ))(jnp.asarray(1.0)))


def test_mb2_gradient_finite():
    g = _grad(2)
    assert g == g  # finite (measured exactly 0.0: blocker invisible at mb=2)


@pytest.mark.xfail(reason="open r5 bug: NaN backward in the sample_v chain "
                          "at the second bounce (see module docstring)",
                   strict=False)
def test_mb3_gradient_finite():
    g = _grad(3)
    assert g == g, "NaN vertex gradient at max_bounces=3"

"""Rough-dielectric glass lobe (spec_trans, thin = 0): validation suite.

Mitsuba `principled` parity for the reference's randomized `spec_trans`
(/root/reference/main.py:99-107): non-thin surfaces do Walter-style
microfacet refraction with `ior`, dielectric-Fresnel reflection, and TIR.
Checks: mixture-pdf normalization, importance/uniform estimator agreement,
exact Walter radiance reciprocity, TIR behavior, sidedness, and a
glass-slab golden render (light refracted through a slab onto the film).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fireflies_tpu.render import bsdf as B
from fireflies_tpu.render.types import (
    Camera,
    Geometry,
    Lights,
    Materials,
    RenderConfig,
    RenderScene,
)
from fireflies_tpu.render.pathtracer import render_rgb

N = 400_000
_N_DIR = jnp.asarray([[0.0, 0.0, 1.0]])
_TH = np.deg2rad(35.0)
_WO1 = jnp.asarray([[np.sin(_TH), 0.0, np.cos(_TH)]], jnp.float32)


def _params(n_rows, st=1.0, rough=0.5, thin=0.0, spec=0.0, ior=1.5,
            eta_rel=None, metallic=0.0):
    mats = Materials.default(1).replace(
        spec_trans=jnp.asarray([st]), roughness=jnp.asarray([rough]),
        thin=jnp.asarray([thin]), specular=jnp.asarray([spec]),
        ior=jnp.asarray([ior]), metallic=jnp.asarray([metallic]),
        base_color=jnp.asarray([[1.0, 1.0, 1.0]]),
    )
    p = B.gather_params(mats, jnp.zeros(n_rows, jnp.int32))
    if eta_rel is not None:
        p["eta_rel"] = jnp.full((n_rows,), eta_rel)
    return p


def _uniform_sphere(key, n):
    k1, k2 = jax.random.split(key)
    z = jax.random.uniform(k1, (n,)) * 2 - 1
    ph = jax.random.uniform(k2, (n,)) * 2 * np.pi
    s = jnp.sqrt(1 - z * z)
    return jnp.stack([s * jnp.cos(ph), s * jnp.sin(ph), z], -1)


@pytest.mark.parametrize("rough,eta_rel", [(0.5, None), (0.7, None), (0.5, 1 / 1.5)])
def test_glass_pdf_normalizes(rough, eta_rel):
    p = _params(N, rough=rough, eta_rel=eta_rel)
    n = jnp.tile(_N_DIR, (N, 1))
    wo = jnp.tile(_WO1, (N, 1))
    wi = _uniform_sphere(jax.random.key(1), N)
    integral = float(jnp.mean(B.pdf_fn(p, n, wo, wi))) * 4 * np.pi
    assert integral == pytest.approx(1.0, abs=0.08)


@pytest.mark.parametrize("st,rough,spec,thin", [
    (1.0, 0.7, 0.0, 0.0), (0.5, 0.7, 0.5, 0.0), (0.9, 0.5, 0.5, 1.0),
])
def test_glass_estimator_consistency(st, rough, spec, thin):
    """Importance-sampled integral of f|cos| matches the uniform-MC one —
    the sampling procedure and pdf_fn describe the same density (this
    caught hemisphere-gated half-vector pdfs and phantom refraction
    density)."""
    p = _params(N, st=st, rough=rough, spec=spec, thin=thin)
    n = jnp.tile(_N_DIR, (N, 1))
    wo = jnp.tile(_WO1, (N, 1))
    wi_u = _uniform_sphere(jax.random.key(2), N)
    f_u = B.evaluate(p, n, wo, wi_u)
    e_unif = float(jnp.mean(f_u[:, 0] * jnp.abs(wi_u[:, 2]))) * 4 * np.pi
    wi_s, pdf_s, f_s = B.sample(p, n, wo, jax.random.key(3))
    w = jnp.where(
        pdf_s > 1e-7, f_s[:, 0] * jnp.abs(wi_s[:, 2]) / jnp.maximum(pdf_s, 1e-7), 0.0
    )
    e_is = float(jnp.mean(w))
    assert e_is == pytest.approx(e_unif, rel=0.08)
    # Transmission never creates energy going INTO a denser medium.
    assert e_is < 1.05


def test_glass_walter_reciprocity_exact():
    """f(i->o) / eta_o^2 is symmetric (Walter 2007 radiance BTDF): evaluate
    the forward pair (viewer outside) and the role-swapped pair (viewer
    inside, eta_rel inverted, frame flipped) and compare exactly."""
    p_fwd = _params(1)
    p_rev = _params(1, eta_rel=1 / 1.5)
    eta = 1.5
    for wi_try in ([-0.38, 0.05, -0.92], [-0.2, 0.1, -0.97], [-0.5, 0.0, -0.87]):
        wi = jnp.asarray([wi_try])
        wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
        f_ab = float(B.evaluate(p_fwd, _N_DIR, _WO1, wi)[0, 0])
        f_ba = float(B.evaluate(p_rev, -_N_DIR, wi, _WO1)[0, 0])
        assert f_ab > 0
        # viewer side of a->b has n=1; of b->a has n=1.5
        assert f_ab / 1.0 == pytest.approx(f_ba / eta**2, rel=1e-4)


def test_glass_tir_no_transmission():
    """Exiting a dense medium beyond the critical angle: transmission is
    zero (TIR), reflection carries the energy."""
    # critical angle for eta_rel = 1/1.5: asin(1/1.5) ~ 41.8 deg
    th = np.deg2rad(60.0)
    wo = jnp.asarray([[np.sin(th), 0.0, np.cos(th)]], jnp.float32)
    p = _params(1, rough=0.05, eta_rel=1 / 1.5)
    # straight-through-ish transmitted direction candidates all evaluate ~0
    for wi_try in ([-0.6, 0.0, -0.8], [-0.87, 0.0, -0.5], [-0.95, 0.0, -0.31]):
        wi = jnp.asarray([wi_try])
        wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
        f = float(B.evaluate(p, _N_DIR, wo, wi)[0, 0])
        assert f < 1e-3  # tiny microfacet tail at roughness 0.05
    # mirror reflection is strong
    wi_r = jnp.asarray([[-np.sin(th), 0.0, np.cos(th)]], jnp.float32)
    f_r = float(B.evaluate(p, _N_DIR, wo, wi_r)[0, 0])
    assert f_r > 1.0


def test_glass_snell_bending_direction():
    """Entering glass bends toward the normal: the peak of the refraction
    lobe for a smooth-ish surface sits at asin(sin(35)/1.5) ~ 22.5 deg on
    the opposite azimuth."""
    p = _params(4096, rough=0.05)
    n = jnp.tile(_N_DIR, (4096, 1))
    wo = jnp.tile(_WO1, (4096, 1))
    wi, pdf, f = B.sample(p, n, wo, jax.random.key(4))
    down = np.asarray(wi[:, 2]) < 0
    assert down.mean() > 0.2
    wi_d = np.asarray(wi)[down]
    # transmitted rays head to -x (opposite azimuth from wo at +x)
    assert (wi_d[:, 0] < 0).mean() > 0.95
    ang = np.rad2deg(np.arccos(np.clip(-wi_d[:, 2], -1, 1)))
    assert abs(np.median(ang) - 22.5) < 4.0


def test_glass_slab_golden():
    """A rough-glass slab between the camera and a backlit emissive panel:
    transmitted light dominates the image; pinned as a golden."""
    import os
    from pathlib import Path

    # slab: two parallel quads at z=-1.0 and z=-1.2 (front/back faces)
    def quad(z, h, flip=False):
        v = np.array([[-h, -h, z], [h, -h, z], [h, h, z], [-h, h, z]], np.float32)
        f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        if flip:
            f = f[:, ::-1]
        return v, f

    v1, f1 = quad(-1.0, 1.0)
    v2, f2 = quad(-1.2, 1.0, flip=True)
    v3, f3 = quad(-3.0, 2.0)  # emissive panel
    verts = jnp.asarray(np.concatenate([v1, v2, v3]))
    faces = jnp.asarray(np.concatenate([f1, f2 + 4, f3 + 8]))
    face_mat = jnp.asarray([0, 0, 0, 0, 1, 1], jnp.int32)
    mats = Materials.default(2).replace(
        spec_trans=jnp.asarray([1.0, 0.0]),
        roughness=jnp.asarray([0.2, 0.5]),
        thin=jnp.zeros(2),
        specular=jnp.asarray([0.0, 0.0]),
        base_color=jnp.asarray([[1.0, 1.0, 1.0], [0.0, 0.0, 0.0]]),
        emission=jnp.asarray([[0.0, 0.0, 0.0], [4.0, 4.0, 4.0]]),
    )
    geo = Geometry(
        vertices=verts, faces=faces, face_mat=face_mat,
        face_mesh=jnp.zeros(6, jnp.int32),
        emissive_faces=jnp.asarray([4, 5], jnp.int32),
    )
    scene = RenderScene(
        geometry=geo, materials=mats, lights=Lights.empty(),
        camera=Camera.create(jnp.eye(4), fov=45.0),
    )
    cfg = RenderConfig(width=32, height=32, spp=8, max_bounces=4, tri_chunk=16)
    img = render_rgb(scene, jax.random.key(11), cfg)
    mean = float(jnp.mean(img))
    assert np.isfinite(np.asarray(img)).all()
    # Transmission must carry substantial energy through the slab.
    assert mean > 0.2

    GOLDEN_DIR = Path(__file__).parent / "goldens"
    GOLDEN_DIR.mkdir(exist_ok=True)
    path = GOLDEN_DIR / "glass_slab_rgb.npy"
    arr = np.asarray(img, np.float32)
    if os.environ.get("FF_UPDATE_GOLDENS") or not path.exists():
        np.save(path, arr)
        return
    np.testing.assert_allclose(arr, np.load(path), atol=2e-3)

"""Scene-static BSDF lobe specialization (Materials.flags).

The bridge computes, per scene, which optional principled lobes any material
can activate (spec_trans/clearcoat/sheen/anisotropic/flatness); the bsdf
functions skip the math for absent lobes at trace time.  These tests pin the
contract: when a lobe's parameters are identically zero, the specialized
path must agree with the full path (it only removes terms whose weight is
zero), and the bridge must derive the flag set from base values AND
registered samplers.

Reference behavior being specialized: Mitsuba's principled BSDF with the
reference workload's randomized parameter set (main.py:99-107).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fireflies_tpu.render import bsdf
from fireflies_tpu.render.vec3 import from_array

N = 256


def _params(n=N, **over):
    base = {
        "base_color": jnp.tile(jnp.asarray([[0.6, 0.4, 0.3]]), (n, 1)),
        "roughness": jnp.linspace(0.05, 0.95, n),
        "metallic": jnp.linspace(0.0, 1.0, n),
        "specular": jnp.full((n,), 0.5),
        "spec_tint": jnp.linspace(0.0, 1.0, n),
        "clearcoat": jnp.zeros((n,)),
        "clearcoat_gloss": jnp.full((n,), 1.0),
        "sheen": jnp.zeros((n,)),
        "sheen_tint": jnp.full((n,), 0.5),
        "anisotropic": jnp.zeros((n,)),
        "spec_trans": jnp.zeros((n,)),
        "flatness": jnp.zeros((n,)),
        "ior": jnp.full((n,), 1.5),
        "thin": jnp.zeros((n,)),
        "emission": jnp.zeros((n, 3)),
    }
    base.update(over)
    return base


def _dirs(seed=0, n=N):
    k1, k2, k3 = jax.random.split(jax.random.key(seed), 3)
    nrm = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    wo = jax.random.normal(k1, (n, 3))
    wo = wo.at[:, 2].set(jnp.abs(wo[:, 2]) + 0.05)
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    wi = jax.random.normal(k2, (n, 3))  # both hemispheres
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    tan = jax.random.normal(k3, (n, 3))
    tan = tan / jnp.linalg.norm(tan, axis=-1, keepdims=True)
    return from_array(nrm), from_array(wo), from_array(wi), from_array(tan)


def test_evaluate_specialized_matches_full():
    n_v, wo, wi, tan = _dirs()
    p_full = _params()
    p_spec = dict(_params(), _flags=frozenset())
    f_full = bsdf.evaluate_v(p_full, n_v, wo, wi, tangent=tan).to_array()
    f_spec = bsdf.evaluate_v(p_spec, n_v, wo, wi, tangent=tan).to_array()
    np.testing.assert_allclose(f_spec, f_full, rtol=2e-5, atol=1e-7)


def test_pdf_specialized_matches_full():
    n_v, wo, wi, tan = _dirs(1)
    p_full = _params()
    p_spec = dict(_params(), _flags=frozenset())
    d_full = bsdf.pdf_v(p_full, n_v, wo, wi, tangent=tan)
    d_spec = bsdf.pdf_v(p_spec, n_v, wo, wi, tangent=tan)
    np.testing.assert_allclose(d_spec, d_full, rtol=2e-5, atol=1e-7)


def test_sample_specialized_matches_full():
    n_v, wo, _wi, tan = _dirs(2)
    key = jax.random.key(7)
    p_full = _params()
    p_spec = dict(_params(), _flags=frozenset())
    wi_f, pdf_f, f_f = bsdf.sample_v(p_full, n_v, wo, key, tangent=tan)
    wi_s, pdf_s, f_s = bsdf.sample_v(p_spec, n_v, wo, key, tangent=tan)
    # Same key, zero transmission probability: the sampled directions agree
    # exactly (the diffuse/specular draws use the same uniforms).
    np.testing.assert_allclose(wi_s.to_array(), wi_f.to_array(), atol=1e-6)
    # GGX sampling lands on the NDF needle where D amplifies ulp-level
    # differences between the (both cancellation-free) iso and aniso
    # formulations ~1/alpha^2-fold; the estimator only needs each path's
    # pdf to be self-consistent with its own f, so compare loosely.
    np.testing.assert_allclose(pdf_s, pdf_f, rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(f_s.to_array(), f_f.to_array(), rtol=2e-3, atol=1e-6)


@pytest.mark.parametrize(
    "lobe,over",
    [
        ("flatness", {"flatness": jnp.full((N,), 0.7)}),
        ("sheen", {"sheen": jnp.full((N,), 0.8)}),
        ("clearcoat", {"clearcoat": jnp.full((N,), 0.9)}),
        ("aniso", {"anisotropic": jnp.full((N,), 0.6)}),
        (
            "trans",
            {"spec_trans": jnp.full((N,), 0.5), "thin": jnp.full((N,), 0.3)},
        ),
    ],
)
def test_active_lobe_with_flag_matches_all_on(lobe, over):
    """Keeping only the active lobe's flag reproduces the all-on result for
    materials that use just that lobe (plus the always-on diffuse/GGX)."""
    n_v, wo, wi, tan = _dirs(3)
    p_all = _params(**over)  # _flags absent -> all lobes on
    p_one = dict(_params(**over), _flags=frozenset({lobe}))
    f_all = bsdf.evaluate_v(p_all, n_v, wo, wi, tangent=tan).to_array()
    f_one = bsdf.evaluate_v(p_one, n_v, wo, wi, tangent=tan).to_array()
    np.testing.assert_allclose(f_one, f_all, rtol=2e-5, atol=1e-7)
    d_all = bsdf.pdf_v(p_all, n_v, wo, wi, tangent=tan)
    d_one = bsdf.pdf_v(p_one, n_v, wo, wi, tangent=tan)
    np.testing.assert_allclose(d_one, d_all, rtol=2e-5, atol=1e-7)


def test_bridge_computes_lobe_flags():
    import fireflies_tpu as ff
    from fireflies_tpu import material as ff_material
    from fireflies_tpu.assets import procedural
    from fireflies_tpu.render.bridge import SceneBridge

    def scene_with(mat):
        sc = ff.Scene()
        v, f = procedural.make_plane()[:2]
        m = ff.Mesh("mesh-plane", v - v.mean(0), f)
        sc.add_mesh(m, material=mat.name())
        sc.add_material(mat)
        cam = ff.Transformable("PerspectiveCamera")
        w = np.eye(4, dtype=np.float32)
        w[2, 3] = 4.0
        cam.set_world(w)
        sc.set_camera(cam)
        return sc

    # Plain default material: no optional lobes.
    mat0 = ff_material.Material("mat-a")
    b0 = SceneBridge(scene_with(mat0))
    assert b0._lobe_flags == frozenset()

    # Nonzero base value activates the lobe.
    mat1 = ff_material.Material("mat-b", spec_trans=0.4)
    b1 = SceneBridge(scene_with(mat1))
    assert b1._lobe_flags == frozenset({"trans"})

    # A registered sampler activates the lobe even at base 0 (the reference
    # randomizes these keys, main.py:99-107).
    mat2 = ff_material.Material("mat-c")
    mat2.add_float_key("clearcoat", 0.0, 1.0)
    b2 = SceneBridge(scene_with(mat2))
    assert b2._lobe_flags == frozenset({"clearcoat"})

    # Mitsuba-style nested keys resolve through canonical_param.
    mat3 = ff_material.Material("mat-d")
    mat3.add_float_key("brdf_0.anisotropic.value", 0.0, 0.5)
    b3 = SceneBridge(scene_with(mat3))
    assert b3._lobe_flags == frozenset({"aniso"})

    # The assembled table carries the flags.
    randomize = scene_with(mat1).compile()
    bridge = SceneBridge(scene_with(mat1))
    rs = bridge.assemble(dict(randomize(jax.random.key(0), 0)))
    assert rs.materials.flags == frozenset({"trans"})

"""RenderConfig.shared_primary: first path vertex shared across spp.

Unbiasedness argument: vertex-0 work (primary hit, attributes, every NEE
strategy) is a deterministic function of the primary rays for delta
emitters; sharing it across spp samples changes only WHICH randomness the
spp average integrates (bounce draws yes, pixel jitter no), not any
expectation.  These tests pin that: the shared-mode mean must agree with
the default mode's mean AND with the deterministic quadrature witness,
and gradients must flow identically in expectation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fireflies_tpu.assets import scenes as ff_scenes
from fireflies_tpu.render import RenderConfig, SceneBridge, render_rgb
from fireflies_tpu.render.quadrature import radiance_quadrature
from fireflies_tpu.render.rays import camera_rays


def _cornell():
    scene, kw = ff_scenes.cornell_like()
    bridge = SceneBridge(scene, **kw)
    return bridge.assemble(scene.compile()(jax.random.key(7), 0))


def test_shared_primary_mean_matches_default():
    """8-outer-key means of both estimators agree on a GI scene (measured
    during bring-up: image means 0.58068 vs 0.58071 at spp 16)."""
    rs = _cornell()
    cfg = RenderConfig(width=32, height=32, spp=16, max_bounces=3, tri_chunk=64)
    base = np.mean(
        [np.asarray(render_rgb(rs, jax.random.key(s), cfg)) for s in range(6)],
        axis=0,
    )
    shared = np.mean(
        [
            np.asarray(
                render_rgb(
                    rs, jax.random.key(100 + s), cfg.replace(shared_primary=True)
                )
            )
            for s in range(6)
        ],
        axis=0,
    )
    assert abs(base.mean() - shared.mean()) < 5e-3, (base.mean(), shared.mean())
    # Per-pixel residual is MC noise of both sides, not a systematic shift.
    assert np.abs(base - shared).mean() < 0.08


def test_shared_primary_matches_quadrature_witness():
    """The shared-primary estimator must converge to the independent
    deterministic integrator too (transport-level check, no other
    Monte Carlo estimate in the loop).

    render_rgb averages over the pixel AREA (jittered primaries), while
    the witness point-samples directions — at 24^2 the silhouette band
    makes the two film integrals differ by ~3% (measured: center-sampled
    witness 0.5499 vs jittered default-mode render 0.5298).  The witness
    is therefore area-averaged with a deterministic 4x4 subpixel grid
    (a 96^2 center-ray fan pooled back to 24^2)."""
    rs = _cornell()
    res, sub = 24, 4
    o, d = camera_rays(rs.camera, res * sub, res * sub)
    q_fine = np.asarray(
        radiance_quadrature(rs, o, d, max_bounces=2, n_mu=16, n_phi=32)
    ).reshape(res, sub, res, sub, 3)
    q = q_fine.mean(axis=(1, 3))
    cfg = RenderConfig(
        width=res, height=res, spp=32, max_bounces=2, tri_chunk=64,
        shared_primary=True,
    )
    imgs = np.stack(
        [np.asarray(render_rgb(rs, jax.random.key(s), cfg)) for s in range(8)]
    )
    assert abs(imgs.mean() - q.mean()) < 8e-3, (imgs.mean(), q.mean())


def test_shared_primary_gradient_matches_default():
    """Gradients (here w.r.t. a light-intensity scale, flowing through the
    NEE radiance at every vertex) agree between modes.  The loss is linear
    in the scale, so d(mean image)/d(scale) is itself an unbiased
    transport estimate on both sides."""
    rs = _cornell()
    cfg = RenderConfig(width=24, height=24, spp=8, max_bounces=2, tri_chunk=64)

    def mk_loss(c):
        def loss(s, key):
            scaled = rs.replace(
                lights=rs.lights.replace(intensity=rs.lights.intensity * s)
            )
            return jnp.mean(render_rgb(scaled, key, c))
        return jax.jit(jax.grad(loss))

    g_base = np.mean(
        [float(mk_loss(cfg)(1.0, jax.random.key(s))) for s in range(6)]
    )
    g_shared = np.mean(
        [
            float(
                mk_loss(cfg.replace(shared_primary=True))(
                    1.0, jax.random.key(50 + s)
                )
            )
            for s in range(6)
        ]
    )
    assert g_base == pytest.approx(g_shared, rel=0.05), (g_base, g_shared)
    assert g_base > 0


def test_shared_primary_spp1_consistent():
    """spp=1 degenerates to the ordinary path (one sample, v0 computed
    once either way): images from the two code paths differ only by key
    plumbing, not systematically."""
    rs = _cornell()
    cfg = RenderConfig(width=24, height=24, spp=1, max_bounces=2, tri_chunk=64)
    base = np.mean(
        [np.asarray(render_rgb(rs, jax.random.key(s), cfg)) for s in range(8)],
        axis=0,
    )
    shared = np.mean(
        [
            np.asarray(
                render_rgb(rs, jax.random.key(80 + s), cfg.replace(shared_primary=True))
            )
            for s in range(8)
        ],
        axis=0,
    )
    assert abs(base.mean() - shared.mean()) < 8e-3

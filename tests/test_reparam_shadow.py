"""Warped-area SHADOW-boundary gradients: analytic validation.

Secondary-discontinuity coverage (VERDICT r1 item 3, shadow silhouettes):
an occluder OUTSIDE the camera frustum casts a shadow edge onto a
full-frame receiver.  Moving the occluder laterally moves only the shadow
edge — the detached renderer sees exactly zero gradient, and the true
gradient is a pure shadow-boundary flux, computable by quadrature.

Geometry (camera at origin, fov 60, looking -z):
  receiver: backdrop quad at z = -2 covering the frame
  occluder: quad at z = -1, x in [dx-3.5, dx-2.7], y in [-0.6, 0.6]
            (frustum half-width at z=-1 is 0.577 -> never visible)
  light:    point at (-4, 0, 0), intensity I
  shadow:   x in [2 dx - 3, 2 dx - 1.4] on the receiver (magnification 2);
            only the right edge (x_s = 2 dx - 1.4) is in frame.

Direct-only radiance at a lit receiver point P: rho/pi * cos * I / r^2 with
r = |P - L|, cos = dot(unit(L - P), +z) (receiver faces the camera).
d(mean)/d(dx) = -(1/4) * v_u * integral of L_lit along the edge in NDC,
v_u = d(ndc_x)/d(dx) = 2 / (2 * 2 tan(fov/2)).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fireflies_tpu.render import RenderConfig
from fireflies_tpu.render.pathtracer import render_rgb
from fireflies_tpu.render.types import (
    Camera, Geometry, Lights, Materials, RenderScene,
)

FOV = 60.0
TANF = float(np.tan(np.deg2rad(FOV / 2.0)))
LIGHT = np.array([-4.0, 0.0, 0.0], np.float32)
INTENSITY = 20.0
RHO = 0.8


def _scene(dx):
    b = 2.5  # full-frame receiver at z = -2 (frame half-width 2 tanf ~ 2.31)
    rv = jnp.asarray(
        [[-b, -b, -2.0], [b, -b, -2.0], [b, b, -2.0], [-b, b, -2.0]], jnp.float32
    )
    ov = jnp.asarray(
        [[-3.5, -0.6, -1.0], [-2.7, -0.6, -1.0], [-2.7, 0.6, -1.0], [-3.5, 0.6, -1.0]],
        jnp.float32,
    ) + jnp.stack([dx, jnp.zeros_like(dx), jnp.zeros_like(dx)])[None, :]
    verts = jnp.concatenate([rv, ov])
    faces = jnp.asarray([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], jnp.int32)
    geo = Geometry(
        vertices=verts, faces=faces,
        face_mat=jnp.zeros(4, jnp.int32),
        face_mesh=jnp.asarray([0, 0, 1, 1], jnp.int32),
    )
    mats = Materials.default(1).replace(
        base_color=jnp.full((1, 3), RHO), specular=jnp.zeros(1),
        roughness=jnp.ones(1),
    )
    lw = np.eye(4, dtype=np.float32)
    lw[:3, 3] = LIGHT
    lights = Lights(
        kinds=jnp.zeros(1, jnp.int32),
        to_world=jnp.asarray(lw)[None],
        intensity=jnp.full((1, 3), INTENSITY, jnp.float32),
        cutoff_cos=jnp.zeros(1), beam_cos=jnp.ones(1),
        active=jnp.ones(1, bool),
    )
    return RenderScene(
        geometry=geo, materials=mats, lights=lights,
        camera=Camera.create(jnp.eye(4), fov=FOV),
    )


def _lit_radiance(x, y):
    """Direct radiance of the lit receiver at world (x, y, -2), per channel
    value (grayscale material)."""
    p = np.stack([x, y, np.full_like(x, -2.0)], -1)
    seg = LIGHT[None, :] - p
    r2 = np.sum(seg**2, -1)
    cos = np.clip(seg[..., 2], 0, None) / np.sqrt(r2)  # wait: receiver normal +z
    # receiver normal is +z; light z=0 > receiver z=-2 so cos = seg_z / r > 0
    return RHO / np.pi * cos * INTENSITY / r2


def _analytic_grad(dx):
    """d(mean img)/d(dx): the shadow's right edge at x_s = 2 dx - 1.4 sweeps
    lit area away.  mean = (1/4) int over NDC of radiance."""
    c = 2.0 * TANF  # world-per-NDC at |z| = 2
    x_s = 2.0 * dx - 1.4
    u_s = x_s / c
    if not (-1 < u_s < 1):
        return 0.0
    # edge spans world y in [-1.2, 1.2] -> ndc [-1.2/c, 1.2/c], inside frame
    y_ndc = np.linspace(-1.2 / c, 1.2 / c, 2001)
    y_w = y_ndc * c
    lit = _lit_radiance(np.full_like(y_w, x_s), y_w)
    v_u = 2.0 / c  # d ndc_x / d dx
    return float(-(1.0 / 4.0) * v_u * np.trapezoid(lit, y_ndc))


def _mean_grad(dx0, seed, res=64):
    cfg = RenderConfig(
        width=res, height=res, spp=1, max_bounces=1, tri_chunk=16,
        reparam=True, reparam_k_aux=12, reparam_radius=0.06,
    )

    def loss(dx):
        img = render_rgb(_scene(dx), jax.random.key(seed), cfg)
        return jnp.mean(img[..., 0])

    return float(jax.grad(loss)(jnp.asarray(dx0)))


def test_shadow_analytic_reference_sane():
    # jump magnitude at the edge center: rho/pi cos I / r^2 with geometry
    g = _analytic_grad(0.3)
    assert g < -1e-3  # lit area shrinks as dx grows


def test_detached_renderer_zero_shadow_gradient():
    cfg = RenderConfig(width=48, height=48, spp=1, max_bounces=1, tri_chunk=16)

    def loss(dx):
        return jnp.mean(render_rgb(_scene(dx), jax.random.key(0), cfg)[..., 0])

    g = float(jax.grad(loss)(jnp.asarray(0.3)))
    assert abs(g) < 1e-7


def test_shadow_boundary_gradient_matches_analytic():
    """Tolerance is set from an 8-seed characterization (r4): estimator
    mean -0.1519 vs analytic -0.1626 => systematic bias 6.5%, seed std 2.3%
    (sem 0.8%).  Two seeds land within ~9% worst-case; 0.12 keeps headroom
    without re-hiding a sign/magnitude regression the old 0.25 would."""
    dx0 = 0.3
    ref = _analytic_grad(dx0)
    grads = [_mean_grad(dx0, seed=s) for s in range(2)]
    g = float(np.mean(grads))
    assert g == pytest.approx(ref, rel=0.12), (g, ref, grads)


def test_pure_pose_recovery_with_reparam_only():
    """VERDICT r1 item 3 done-criterion: a pose recovery driven ONLY by
    warped-area reparam gradients (no soft-silhouette hybrid).  The occluder
    starts offset; gradient descent on a BLURRED L1 image loss must move it
    to the target pose using render_rgb(reparam=True) gradients alone.

    Why the blur (measured, not cosmetic): the warped-area flux is carried
    entirely by pixels on the LIT side of the moving shadow edge (f = 0 on
    the shadow side, so f * d(div W) vanishes there) — but with an spp=1
    primal those are exactly the pixels where sign(primal - target) is a
    coin flip (both renders lit, difference is jitter noise).  The product
    delivered ~4% of the true gradient (reparam ~0.005 vs FD ~0.11) and the
    recovery stalled.  A small Gaussian blur inside the loss lets g' see
    the edge from the lit side: measured reparam gradient of the blurred
    L1 is ~0.05 with consistent sign at every trajectory point (FD ~0.12).
    Higher primal spp is the other standard remedy; blur keeps the test
    cheap.  This sign-starvation applies to ANY nonsmooth/pointwise loss
    over a 1-sample image, not just this scene."""
    import optax

    from fireflies_tpu.postprocessing import gaussian_blur2d

    cfg = RenderConfig(
        width=48, height=48, spp=1, max_bounces=1, tri_chunk=16,
        reparam=True, reparam_k_aux=8, reparam_radius=0.08,
    )
    dx_target = 0.3
    target = jax.lax.stop_gradient(
        render_rgb(_scene(jnp.asarray(dx_target)), jax.random.key(99), cfg)
    )
    target_b = jax.lax.stop_gradient(gaussian_blur2d(target, (5, 5), (1.5, 1.5)))

    def loss(dx, seed):
        img = render_rgb(_scene(dx), jax.random.key(seed), cfg)
        return jnp.mean(jnp.abs(gaussian_blur2d(img, (5, 5), (1.5, 1.5)) - target_b))

    def mean_grad(dx, step):
        gs = [jax.grad(loss)(dx, 3 * step + j) for j in range(3)]
        return (gs[0] + gs[1] + gs[2]) / 3.0

    opt = optax.adam(4e-2)
    dx = jnp.asarray(0.62)
    state = opt.init(dx)
    grad_fn = jax.jit(mean_grad)
    traj = []
    for i in range(50):
        g = grad_fn(dx, i)
        updates, state = opt.update(g, state)
        dx = optax.apply_updates(dx, updates)
        traj.append(float(dx))
    assert abs(float(dx) - dx_target) < 0.08, traj[::5]

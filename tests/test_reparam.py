"""Warped-area reparameterized visibility gradients: analytic validation.

The discriminating scene: a quad at fixed z = -2 translated laterally by dx.
For every pixel whose ray hits the quad, depth t is INDEPENDENT of dx (the
plane doesn't move in z), so d(mean depth)/d(dx) is a *pure boundary term*:
the detached path tracer reports exactly 0, and the analytic value follows
from the flux of t through the moving silhouette edges:

    I(dx) = (1/4) * integral over covered NDC of t(x, y) dx dy
    dI/ddx = (1/4) * (1/c) * [G(x_r) - G(x_l)],   c = 2 tan(fov/2)
    G(x) = integral over covered y of t(x, y) dy
    t(x, y) = 2 sqrt(1 + (x tanf)^2 + (y tanf)^2)

computed below by quadrature — no staircase-FD noise.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fireflies_tpu.render import RenderConfig
from fireflies_tpu.render.reparam import render_depth_reparam
from fireflies_tpu.render.integrators import render_depth
from fireflies_tpu.render.types import Camera, Geometry, Lights, Materials, RenderScene

FOV = 60.0
HALF = 0.5
Z = -2.0


def _scene(dx, backdrop=False):
    verts = jnp.array(
        [
            [-HALF, -HALF, Z],
            [HALF, -HALF, Z],
            [HALF, HALF, Z],
            [-HALF, HALF, Z],
        ],
        jnp.float32,
    ) + jnp.stack([dx, jnp.zeros_like(dx), jnp.zeros_like(dx)])[None, :]
    faces = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
    if backdrop:
        # Static full-frame receiver at z = 2Z (covers NDC: 2.5/(4 tan30) > 1).
        b = 2.5
        bverts = jnp.array(
            [[-b, -b, 2 * Z], [b, -b, 2 * Z], [b, b, 2 * Z], [-b, b, 2 * Z]],
            jnp.float32,
        )
        verts = jnp.concatenate([verts, bverts])
        faces = jnp.concatenate([faces, faces + 4])
    n_f = faces.shape[0]
    geo = Geometry(
        vertices=verts,
        faces=faces,
        face_mat=jnp.zeros(n_f, jnp.int32),
        face_mesh=jnp.repeat(jnp.arange(n_f // 2, dtype=jnp.int32), 2),
    )
    return RenderScene(
        geometry=geo,
        materials=Materials.default(1),
        lights=Lights.empty(),
        camera=Camera.create(jnp.eye(4), fov=FOV),
    )


def _analytic_boundary_grad(dx: float) -> float:
    tanf = np.tan(np.deg2rad(FOV / 2.0))
    c = 2.0 * tanf  # world units per NDC unit at |z| = 2

    def t_of(x, y):
        return 2.0 * np.sqrt(1.0 + (x * tanf) ** 2 + (y * tanf) ** 2)

    ys = np.linspace(-HALF / c, HALF / c, 4001)
    x_r = (dx + HALF) / c
    x_l = (dx - HALF) / c
    g_r = np.trapezoid(t_of(x_r, ys), ys)
    g_l = np.trapezoid(t_of(x_l, ys), ys)
    return float((g_r - g_l) / (4.0 * c))


def _mean_depth_grad(dx0: float, res=96, k_aux=12, radius=0.06, seed=0,
                     backdrop=False):
    cfg = RenderConfig(width=res, height=res, tri_chunk=16)

    def loss(dx):
        depth = render_depth_reparam(
            _scene(dx, backdrop=backdrop), cfg, jax.random.key(seed),
            k_aux=k_aux, radius=radius
        )
        return jnp.mean(depth)

    return float(jax.grad(loss)(jnp.asarray(dx0)))


def test_primal_matches_hard_depth():
    cfg = RenderConfig(width=48, height=48, tri_chunk=16)
    scene = _scene(jnp.asarray(0.3))
    hard = render_depth(scene, cfg)
    soft = render_depth_reparam(scene, cfg, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(soft), np.asarray(hard), atol=1e-5)


def test_detached_renderer_has_zero_lateral_gradient():
    """The baseline this module exists to fix: interior-only gradients see
    nothing when only the silhouette moves."""
    cfg = RenderConfig(width=48, height=48, tri_chunk=16)

    def loss(dx):
        from fireflies_tpu.render.integrators import render_depth_differentiable

        return jnp.mean(render_depth_differentiable(_scene(dx), cfg))

    g = float(jax.grad(loss)(jnp.asarray(0.3)))
    assert abs(g) < 1e-6


def test_boundary_gradient_matches_analytic():
    """THE warped-area test: the reparam gradient must recover the analytic
    boundary flux (exactly zero for the detached renderer)."""
    dx0 = 0.3
    ref = _analytic_boundary_grad(dx0)
    assert ref > 1e-3  # asymmetric placement -> nonzero reference
    # Average a few aux-sampling seeds (the estimator is stochastic).
    grads = [_mean_depth_grad(dx0, seed=s) for s in range(3)]
    g = float(np.mean(grads))
    assert g == pytest.approx(ref, rel=0.15), (g, ref, grads)


def test_occluder_over_receiver_matches_analytic():
    """Silhouette over a static full-frame backdrop at 2|Z|: the receiver
    depth is exactly 2x the occluder depth along each ray, so the boundary
    flux is t_n - t_f = -t_n, i.e. exactly MINUS the background-case
    reference.  Exercises aux rays landing on a second surface (finite B,
    zero velocity) instead of misses."""
    dx0 = 0.3
    ref = -_analytic_boundary_grad(dx0)
    grads = [_mean_depth_grad(dx0, seed=s, backdrop=True) for s in range(3)]
    g = float(np.mean(grads))
    assert g == pytest.approx(ref, rel=0.15), (g, ref, grads)


def test_boundary_gradient_zero_when_symmetric():
    """At dx = 0 the two vertical edges carry equal-and-opposite flux."""
    ref = _analytic_boundary_grad(0.0)
    assert abs(ref) < 1e-9
    g = float(np.mean([_mean_depth_grad(0.0, seed=s) for s in range(2)]))
    assert abs(g) < 0.03  # noise floor, well below the dx=0.3 signal (~0.07)

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


def test_render_rgb_reparam_flag_emissive_area_growth():
    """RenderConfig(reparam=True) end-to-end: an emissive quad moving toward
    the camera grows its screen coverage; with constant emission E the
    image mean is I = E * (s / (|z| tanf))^2, so

        dI/ddz = E * 2 s^2 / (tanf^2 |z|^3)      (|z| = 2 - dz)

    — a pure boundary term (the detached renderer reports 0 per channel)."""
    from fireflies_tpu.render.pathtracer import render_rgb

    emission = jnp.array([2.0, 1.0, 0.5], jnp.float32)

    def scene(dz):
        half = HALF
        z = Z + dz
        verts = jnp.stack(
            [
                jnp.stack([-half + 0 * dz, -half + 0 * dz, z]),
                jnp.stack([half + 0 * dz, -half + 0 * dz, z]),
                jnp.stack([half + 0 * dz, half + 0 * dz, z]),
                jnp.stack([-half + 0 * dz, half + 0 * dz, z]),
            ]
        )
        faces = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
        geo = Geometry(
            vertices=verts,
            faces=faces,
            face_mat=jnp.zeros(2, jnp.int32),
            face_mesh=jnp.zeros(2, jnp.int32),
        )
        mats = Materials.default(1).replace(emission=emission[None, :])
        return RenderScene(
            geometry=geo,
            materials=mats,
            lights=Lights.empty(),
            camera=Camera.create(jnp.eye(4), fov=FOV),
        )

    tanf = np.tan(np.deg2rad(FOV / 2.0))
    ref = np.asarray(emission) * 2.0 * HALF**2 / (tanf**2 * 2.0**3)

    cfg0 = RenderConfig(width=96, height=96, spp=2, max_bounces=1, tri_chunk=16)

    def mean_img(dz, cfg, seed):
        return jnp.mean(
            render_rgb(scene(dz), jax.random.key(seed), cfg), axis=(0, 1)
        )

    g_detached = jax.jacrev(lambda dz: mean_img(dz, cfg0, 0))(jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(g_detached), 0.0, atol=1e-6)

    cfg1 = cfg0.replace(reparam=True, reparam_k_aux=8, reparam_radius=0.06)
    grads = [
        np.asarray(jax.jacrev(lambda dz: mean_img(dz, cfg1, s))(jnp.asarray(0.0)))
        for s in range(3)
    ]
    g = np.mean(grads, axis=0)
    np.testing.assert_allclose(g, ref, rtol=0.15)
    # Primal agrees with the analytic mean either way (the flag changes only
    # the pixel-jitter key path, so exact equality isn't expected).
    truth = float(np.mean(np.asarray(emission))) * (HALF / (2.0 * tanf)) ** 2
    a = float(jnp.mean(render_rgb(scene(jnp.asarray(0.0)), jax.random.key(5), cfg0)))
    b = float(jnp.mean(render_rgb(scene(jnp.asarray(0.0)), jax.random.key(5), cfg1)))
    assert a == pytest.approx(truth, rel=0.02)
    assert b == pytest.approx(truth, rel=0.02)


def test_reparam_rgb_nonlinear_loss_decorrelated():
    """Regression: with a nonlinear (L2) loss, a correlated value/derivative
    estimate kills boundary gradients — every boundary sample lands on the
    covered side where (img - target) == 0, so grad was EXACTLY 0.0 and
    optimization stalled.  render_rgb decorrelates (independent seeds for
    value and gradient); the L2 gradient must now point back toward the
    target from both sides."""
    from fireflies_tpu.render.pathtracer import render_rgb

    emission = jnp.array([2.0, 1.0, 0.5], jnp.float32)

    def scene(dz):
        z = Z + dz
        verts = jnp.stack(
            [
                jnp.stack([sx * HALF + 0 * dz, sy * HALF + 0 * dz, z])
                for sx, sy in [(-1, -1), (1, -1), (1, 1), (-1, 1)]
            ]
        )
        faces = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
        geo = Geometry(
            vertices=verts, faces=faces,
            face_mat=jnp.zeros(2, jnp.int32), face_mesh=jnp.zeros(2, jnp.int32),
        )
        return RenderScene(
            geometry=geo,
            materials=Materials.default(1).replace(emission=emission[None, :]),
            lights=Lights.empty(),
            camera=Camera.create(jnp.eye(4), fov=FOV),
        )

    cfg = RenderConfig(width=64, height=64, spp=1, max_bounces=1, tri_chunk=16,
                       reparam=True, reparam_radius=0.08)
    target = render_rgb(scene(jnp.asarray(-0.5)), jax.random.key(42), cfg)

    def loss(dz, seed):
        img = render_rgb(scene(dz), jax.random.key(seed), cfg)
        return jnp.mean((img - target) ** 2)

    g_before = np.mean([float(jax.grad(loss)(jnp.asarray(0.0), s)) for s in range(3)])
    g_after = np.mean([float(jax.grad(loss)(jnp.asarray(-0.75), s)) for s in range(3)])
    assert g_before > 0.05  # quad too close/too large -> push dz negative
    assert g_after < -1e-3  # overshot -> push dz back up (was exactly 0.0)


def test_boundary_gradient_zero_when_symmetric():
    """At dx = 0 the two vertical edges carry equal-and-opposite flux."""
    ref = _analytic_boundary_grad(0.0)
    assert abs(ref) < 1e-9
    g = float(np.mean([_mean_depth_grad(0.0, seed=s) for s in range(2)]))
    assert abs(g) < 0.03  # noise floor, well below the dx=0.3 signal (~0.07)


def test_split_step_matches_monolithic():
    """reparam_split_value_and_grad (the host-split pipeline for films
    whose monolithic dispatch exceeds the tunnel's ~60s budget) must
    reproduce the monolithic RenderConfig(reparam=True) loss AND gradient
    — same key chain, same warp chunking, same chain rule, different
    dispatch boundaries."""
    from fireflies_tpu.render.pathtracer import render_rgb
    from fireflies_tpu.render.reparam import reparam_split_value_and_grad

    emission = jnp.array([2.0, 1.0, 0.5], jnp.float32)

    def scene_fn(dz):
        half = HALF
        z = Z + dz
        verts = jnp.stack(
            [
                jnp.stack([-half + 0 * dz, -half + 0 * dz, z]),
                jnp.stack([half + 0 * dz, -half + 0 * dz, z]),
                jnp.stack([half + 0 * dz, half + 0 * dz, z]),
                jnp.stack([-half + 0 * dz, half + 0 * dz, z]),
            ]
        )
        faces = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
        geo = Geometry(
            vertices=verts,
            faces=faces,
            face_mat=jnp.zeros(2, jnp.int32),
            face_mesh=jnp.zeros(2, jnp.int32),
        )
        mats = Materials.default(1).replace(emission=emission[None, :])
        return RenderScene(
            geometry=geo,
            materials=mats,
            lights=Lights.empty(),
            camera=Camera.create(jnp.eye(4), fov=FOV),
        )

    cfg = RenderConfig(
        width=32, height=32, spp=1, max_bounces=1, tri_chunk=16,
        reparam=True, reparam_k_aux=4, reparam_radius=0.06,
        reparam_chunk=256,
    )
    key = jax.random.key(3)

    def image_loss(img):
        return jnp.mean(img * img)  # nonlinear: exercises the decorrelated path

    def mono(dz):
        return image_loss(render_rgb(scene_fn(dz), key, cfg))

    l_mono, g_mono = jax.value_and_grad(mono)(jnp.asarray(0.0))
    step = reparam_split_value_and_grad(scene_fn, image_loss, key, cfg)
    l_split, g_split = step(jnp.asarray(0.0))

    np.testing.assert_allclose(float(l_split), float(l_mono), rtol=1e-5)
    assert abs(float(g_mono)) > 1e-4  # boundary term present (moving quad)
    np.testing.assert_allclose(float(g_split), float(g_mono), rtol=1e-3)

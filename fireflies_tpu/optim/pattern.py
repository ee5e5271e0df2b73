"""Gradient-based pattern optimization workloads.

Restores the reference's empty examples 07-11 (SURVEY.md §2) as library
functions:

  * overlap-regularized 2D point optimization — the semantics of
    rasterization.py:564-642 (test_point_reg): minimize
    L1(softor(points), sum(points)), which is zero iff no two splats
    overlap; Adam on point coordinates, clamped to [0, 1]^2.
  * gradient accumulation across randomized scene variants (psum-ready):
    optimize laser beam directions through the *differentiable renderer*
    against an image-space objective, averaging gradients over a vmapped
    batch of randomized variants — the "Paper-branch" workload the
    reference's dr.wrap_ad bridges imply (SURVEY.md §3.5).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from fireflies_tpu.graphics import rasterization
from fireflies_tpu.projection import laser as laser_mod

Array = jax.Array


def overlap_loss(points: Array, sigma: float, texture_size, chunk: int = 64) -> Array:
    """L1 between softor- and sum-reduced splats (reference loss at
    rasterization.py:589-596).  Zero iff splats don't overlap."""
    summed = rasterization.sum_points(points, sigma, texture_size, chunk=chunk)
    softored = rasterization.softor_points(points, sigma, texture_size, chunk=chunk)
    return jnp.mean(jnp.abs(softored - summed))


class PatternOptResult(NamedTuple):
    points: Array
    losses: Array


def optimize_point_pattern(
    key: Array,
    n_points: int = 500,
    sigma: float = 225.0,
    texture_size=(512, 512),
    steps: int = 200,
    learning_rate: float = 1e-3,
    init_points: Optional[Array] = None,
    chunk: int = 64,
) -> PatternOptResult:
    """The reference pattern-optimization loop (rasterization.py:564-642) as
    one jitted lax.scan: Adam on point coords, clamp to [0, 1] each step
    (:605-607).  Defaults match the reference workload shape
    (500 points, 512^2, 200 steps, lr 1e-3, sigma 15^2)."""
    points = (
        init_points
        if init_points is not None
        else jax.random.uniform(key, (n_points, 2))
    )
    tx = optax.adam(learning_rate)
    opt_state = tx.init(points)

    loss_fn = lambda p: overlap_loss(p, sigma, texture_size, chunk=chunk)
    grad_fn = jax.value_and_grad(loss_fn)

    def step(carry, _):
        pts, state = carry
        loss, g = grad_fn(pts)
        updates, state = tx.update(g, state, pts)
        pts = optax.apply_updates(pts, updates)
        pts = jnp.clip(pts, 0.0, 1.0)
        return (pts, state), loss

    (points, _), losses = jax.lax.scan(step, (points, opt_state), None, length=steps)
    return PatternOptResult(points=points, losses=losses)


# ---------------------------------------------------------------------------
# Through-the-renderer pattern optimization with variant batching
# ---------------------------------------------------------------------------


class RenderOptResult(NamedTuple):
    rays: Array
    losses: Array


def make_variant_loss(
    randomize_fn: Callable,
    assemble_fn: Callable,
    render_fn: Callable,
    objective: Callable[[Array, dict], Array],
    texture_fn: Callable[[Array], Array] | None = None,
    pattern_params_fn: Callable[[Array], dict] | None = None,
):
    """Compose randomize -> assemble(+pattern) -> render -> objective.

    Returns loss(rays, key, step) for ONE variant; see
    `optimize_pattern_through_render` for the batched optimizer.

    Pattern injection, one of:
      texture_fn: rays (B, 3) -> (H, W, 3) projector texture (the texture
        route, e.g. laser.rays_to_texture_rgb — Mitsuba "tex.data" parity);
      pattern_params_fn: rays (B, 3) -> {param_key: value} entries merged
        into the randomized params — use laser.rays_to_beam_params for the
        ANALYTIC beam projector (measured ~1.5x faster per optimization
        step at 512x512: no texture gather per NEE vertex, no
        rasterization, exact beam-direction gradients).
    objective: (image, aux) -> scalar; aux carries {"params", "scene"}.
    """
    if (texture_fn is None) == (pattern_params_fn is None):
        raise ValueError("pass exactly one of texture_fn / pattern_params_fn")

    def loss(rays: Array, key: Array, step: Array) -> Array:
        params = dict(randomize_fn(key, step))
        if texture_fn is not None:
            params["tex.data"] = texture_fn(rays)
        else:
            params.update(pattern_params_fn(rays))
        scene = assemble_fn(params)
        img = render_fn(scene, key)
        return objective(img, {"params": params, "scene": scene})

    return loss


def optimize_pattern_through_render(
    loss_fn: Callable[[Array, Array, Array], Array],
    init_rays: Array,
    key: Array,
    steps: int = 100,
    batch: int = 4,
    learning_rate: float = 5e-3,
    fov_deg: float = 30.0,
    respawn_oob: bool = True,
) -> RenderOptResult:
    """Adam on laser-beam directions with gradient accumulation across a
    vmapped batch of randomized variants per step (the reference's intended
    examples 07/09-11 workload; gradient accumulation == mean over the
    variant axis — under shard_map this becomes a psum, see
    fireflies_tpu.parallel).

    After each step beams are re-normalized and (optionally) out-of-bounds
    beams respawned (reference laser.py:199-231 semantics).
    """
    tx = optax.adam(learning_rate)
    opt_state = tx.init(init_rays)

    def batched_loss(rays, key, step):
        keys = jax.random.split(key, batch)
        losses = jax.vmap(lambda k: loss_fn(rays, k, step))(keys)
        return jnp.mean(losses)

    grad_fn = jax.value_and_grad(batched_loss)

    def step_fn(carry, step_idx):
        rays, state, k = carry
        k, k_step, k_respawn = jax.random.split(k, 3)
        loss, g = grad_fn(rays, k_step, step_idx)
        updates, state = tx.update(g, state, rays)
        rays = optax.apply_updates(rays, updates)
        rays = rays / (jnp.linalg.norm(rays, axis=-1, keepdims=True) + 1e-20)
        if respawn_oob:
            rays = laser_mod.respawn_out_of_bounds(k_respawn, rays, fov_deg)
        return (rays, state, k), loss

    (rays, _, _), losses = jax.lax.scan(
        step_fn, (init_rays, opt_state, key), jnp.arange(steps)
    )
    return RenderOptResult(rays=rays, losses=losses)


# ---------------------------------------------------------------------------
# Built-in objectives
# ---------------------------------------------------------------------------


def dot_coverage_objective(channel: int = 1) -> Callable:
    """Maximize detected laser-dot energy spread: encourages bright,
    well-separated dots in the camera image (negated for minimization)."""

    def objective(img: Array, aux: dict) -> Array:
        x = img[..., channel]
        total = jnp.sum(x)
        # Penalize concentration: high pixel max relative to total means
        # dots collapsed together.
        peak = jnp.max(x)
        return -(total - 0.5 * peak * jnp.sqrt(total + 1e-6))

    return objective

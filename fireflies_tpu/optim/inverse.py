"""Inverse rendering: optimize scene parameters against target images.

The intent of the reference's empty examples 07 (gradient accumulation) and
08 (mesh/scene optimization): differentiate rendered images w.r.t. any subset
of the flat param dict (vertex positions, material values, light intensity,
poses, the projector texture) and descend.

`optimize_params` treats the chosen params as leaves of the optimization
pytree and closes over the rest — the JAX-native version of "requires_grad
on some Mitsuba params".
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

Array = jax.Array


class InverseResult(NamedTuple):
    params: dict
    losses: Array


def image_l2(rendered: Array, target: Array) -> Array:
    return jnp.mean((rendered - target) ** 2)


def hybrid_pose_loss(
    rendered: Array,
    target: Array,
    soft_mask: Array,
    target_mask: Array,
    mask_weight: float = 1.0,
    valid_mask: Array | None = None,
):
    """The supported pose/shape-fitting objective.

    Combines the path tracer's exact *interior* gradients (appearance term,
    optionally restricted to mutually-valid pixels) with the soft-silhouette
    renderer's *boundary* gradients (mask IoU term) — together they cover
    both gradient regimes (COMPONENTS.md gap #1): interiors move with
    shading/parallax, silhouettes move with the soft mask.

    rendered/target: (H, W, C) images; soft_mask/target_mask: (H, W) coverage.
    """
    if valid_mask is not None:
        import jax as _jax

        valid = _jax.lax.stop_gradient(valid_mask)
        n = jnp.maximum(jnp.sum(valid), 1)
        app = jnp.sum(jnp.where(valid[..., None], (rendered - target) ** 2, 0.0)) / n
    else:
        app = jnp.mean((rendered - target) ** 2)
    sil = jnp.mean((soft_mask - target_mask) ** 2)
    return app + mask_weight * sil


def optimize_params(
    trainable_init: dict,
    loss_fn: Callable[[dict, Array], Array],
    key: Array,
    steps: int = 100,
    learning_rate: float = 1e-2,
    optimizer: optax.GradientTransformation | None = None,
    grad_batch: int = 1,
) -> InverseResult:
    """Adam over an arbitrary dict of trainable arrays.

    loss_fn(trainable, key) -> scalar must close over the scene/render.
    grad_batch > 1 averages gradients over that many keys per step
    (gradient accumulation across randomized variants, example 07).
    """
    tx = optimizer or optax.adam(learning_rate)
    opt_state = tx.init(trainable_init)

    def batched(trainable, k):
        if grad_batch == 1:
            return loss_fn(trainable, k)
        keys = jax.random.split(k, grad_batch)
        return jnp.mean(jax.vmap(lambda kk: loss_fn(trainable, kk))(keys))

    grad_fn = jax.value_and_grad(batched)

    def step(carry, _):
        trainable, state, k = carry
        k, k_step = jax.random.split(k)
        loss, g = grad_fn(trainable, k_step)
        updates, state = tx.update(g, state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return (trainable, state, k), loss

    (trainable, _, _), losses = jax.lax.scan(
        step, (trainable_init, opt_state, key), None, length=steps
    )
    return InverseResult(params=trainable, losses=losses)

"""Multi-chip scale-out: variant-parallel rendering and psum training steps.

The reference is strictly single-GPU with a serial variant loop
(main.py:147-193, SURVEY.md §2 "Parallelism: none").  This module is the
rebuild's first-class replacement: a `jax.sharding.Mesh` over the TPU slice,
`shard_map` for variant-parallel rendering (each device renders its share of
randomized variants) and gradient accumulation via `psum` for pattern /
inverse-rendering optimization.  Collectives ride ICI; no NCCL analog exists
or is needed.

All helpers also run on CPU test meshes
(XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array

DATA_AXIS = "variants"


def make_mesh(n_devices: int | None = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D device mesh over (up to) all local devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_keys(mesh: Mesh, key: Array, per_device: int, axis_name: str = DATA_AXIS) -> Array:
    """(n_devices * per_device,) keys laid out for sharding along axis 0."""
    n = mesh.shape[axis_name] * per_device
    keys = jax.random.split(key, n)
    return jax.device_put(keys, NamedSharding(mesh, P(axis_name)))


def variant_parallel(
    fn: Callable[[Array, Array], Array],
    mesh: Mesh,
    axis_name: str = DATA_AXIS,
) -> Callable[[Array, Array], Array]:
    """Lift fn(key, step) -> pytree into a device-parallel batched version:
    result(keys (N,), steps (N,)) with N = n_devices * per_device, sharded
    over the mesh; inside each device the local batch vmaps.

    This is the replacement for the reference's serial `while count != 10000`
    render loop: one dispatch renders n_devices x per_device variants.
    """

    def local(keys, steps):
        return jax.vmap(fn)(keys, steps)

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )

    def run(keys: Array, steps: Array):
        return sharded(keys, steps)

    return run


def psum_grad_step(
    loss_fn: Callable[..., Array],
    mesh: Mesh,
    axis_name: str = DATA_AXIS,
) -> Callable:
    """Build a data-parallel gradient step: each device computes the gradient
    of `loss_fn(params, key)` averaged over its local keys, then gradients
    are psum-averaged across the mesh.  Returns
    step(params, keys (N,)) -> (mean_loss, mean_grad) with params replicated.
    """
    grad_fn = jax.value_and_grad(loss_fn)

    def local(params, keys):
        def one(k):
            return grad_fn(params, k)

        losses, grads = jax.vmap(one)(keys)
        loss = jax.lax.pmean(jnp.mean(losses), axis_name)
        grad = jax.tree.map(
            lambda g: jax.lax.pmean(jnp.mean(g, axis=0), axis_name), grads
        )
        return loss, grad

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=(P(), P()),
        check_vma=False,
    )


def all_gather_frames(mesh: Mesh, frames: Array, axis_name: str = DATA_AXIS) -> Array:
    """Collect per-device frame batches to every device (dataset collection)."""

    def local(x):
        return jax.lax.all_gather(x, axis_name, tiled=True)

    return jax.shard_map(
        local, mesh=mesh, in_specs=P(axis_name), out_specs=P(), check_vma=False
    )(frames)

"""Multi-chip scale-out: variant-parallel rendering, film-band parallelism,
and psum training steps.

The reference is strictly single-GPU with a serial variant loop
(main.py:147-193, SURVEY.md §2 "Parallelism: none").  This module is the
rebuild's first-class replacement: a `jax.sharding.Mesh` over the TPU slice,
`shard_map` for variant-parallel rendering (each device renders its share of
randomized variants), film-band parallelism for scaling ONE render across
chips (render_tile_parallel; each device traces a horizontal band of the
film), their 2-D composition (dp_tile_grad_step), and gradient accumulation
via `psum` for pattern / inverse-rendering optimization.  Collectives ride
ICI; no NCCL analog exists or is needed.

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
TILE_AXIS = "tiles"


def make_mesh(n_devices: int | None = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D device mesh over (up to) all local devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(
    n_variants: int,
    n_tiles: int,
    var_axis: str = DATA_AXIS,
    tile_axis: str = TILE_AXIS,
) -> Mesh:
    """2-D mesh: variant data-parallel x film-band parallel.

    The tile axis should map to the mesh's minor (fastest-ICI) dimension —
    the per-step all_gather of film bands rides it, while the variant axis
    only carries a gradient psum.
    """
    devices = jax.devices()
    n = n_variants * n_tiles
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    return Mesh(
        np.asarray(devices[:n]).reshape(n_variants, n_tiles),
        (var_axis, tile_axis),
    )


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


def render_tile_parallel(scene, key: Array, config, mesh: Mesh, axis_name: str = TILE_AXIS):
    """Render ONE image with its pixel rows sharded across a mesh axis.

    Each device renders a config.height/n_tiles-row horizontal band of the
    film (render_rgb's film_y0/film_full_height band mode) with a
    per-band-decorrelated key; out_specs concatenate the bands back into the
    (H, W, 3) image.  Scales a SINGLE large render across chips — the axis
    the variant-DP model cannot cover when batch < n_devices or the film is
    too large per chip.  Width % 128 == 0 and band height % 16 == 0 keep the
    arithmetic tile-major ray path (no permutation gathers).

    Not supported with config.reparam (the warp samples the full film).
    """
    from fireflies_tpu.render.pathtracer import render_rgb  # noqa: PLC0415

    nt = mesh.shape[axis_name]
    if config.height % nt:
        raise ValueError(f"height {config.height} not divisible by {nt} bands")
    bh = config.height // nt
    band_cfg = config.replace(height=bh)

    def local(scene_, key_):
        ti = jax.lax.axis_index(axis_name)
        kb = jax.random.fold_in(key_, ti)
        return render_rgb(
            scene_, kb, band_cfg, film_y0=ti * bh, film_full_height=config.height
        )

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(axis_name),
        check_vma=False,
    )(scene, key)


def dp_tile_grad_step(
    scene_fn: Callable,
    image_loss: Callable[[Array], Array],
    config,
    mesh: Mesh,
    var_axis: str = DATA_AXIS,
    tile_axis: str = TILE_AXIS,
) -> Callable:
    """Training step on a 2-D (variants x tiles) mesh.

    `scene_fn(params, key) -> RenderScene` builds a randomized variant;
    `image_loss(img (H, W, 3)) -> scalar`.  Only the RENDER runs under
    shard_map (each device traces its film band of its variant group's
    frames); the loss and autodiff stay GLOBAL, pjit-style — shard_map's
    own transpose machinery then inserts the correct collectives (psum of
    the replicated params' cotangents across the whole mesh, cotangent
    scatter of the assembled frames back to band owners).  Hand-written
    collective transposes under check_vma=False are easy to get wrong by
    exactly a mesh-axis factor; global AD is the supported path.

    Returns step(params, keys (n_variant_groups,)) -> (loss, grad).  This
    is the dp x sp composition: batch scaling on one mesh axis,
    single-render scaling on the other.
    """
    from fireflies_tpu.render.pathtracer import render_rgb  # noqa: PLC0415

    nt = mesh.shape[tile_axis]
    if config.height % nt:
        raise ValueError(f"height {config.height} not divisible by {nt} bands")
    bh = config.height // nt
    band_cfg = config.replace(height=bh)

    def render_bands(params, keys):
        def one(k):
            scene = scene_fn(params, k)
            ti = jax.lax.axis_index(tile_axis)
            return render_rgb(
                scene,
                jax.random.fold_in(k, ti),
                band_cfg,
                film_y0=ti * bh,
                film_full_height=config.height,
            )

        return jax.vmap(one)(keys)  # (local_variants, bh, W, 3)

    sharded_render = jax.shard_map(
        render_bands,
        mesh=mesh,
        in_specs=(P(), P(var_axis)),
        out_specs=P(var_axis, tile_axis),
        check_vma=False,
    )

    def loss(params, keys):
        imgs = sharded_render(params, keys)  # (n_variants, H, W, 3) global
        return jnp.mean(jax.vmap(image_loss)(imgs))

    return jax.value_and_grad(loss)


def all_gather_frames(mesh: Mesh, frames: Array, axis_name: str = DATA_AXIS) -> Array:
    """Collect per-device frame batches to every device (dataset collection)."""

    def local(x):
        return jax.lax.all_gather(x, axis_name, tiled=True)

    return jax.shard_map(
        local, mesh=mesh, in_specs=P(axis_name), out_specs=P(), check_vma=False
    )(frames)

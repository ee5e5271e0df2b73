"""Packed 2x2-neighborhood bilinear == classic bilinear (values + grads)."""

import numpy as np
import jax
import jax.numpy as jnp

from fireflies_tpu.render.texture import (
    bilinear_sample,
    bilinear_sample_packed,
    bilinear_sample_stack,
    bilinear_sample_stack_packed,
    pack_neighborhood_stack,
    pack_neighborhood_table,
)


def test_packed_matches_classic_single():
    rng = np.random.default_rng(0)
    tex = jnp.asarray(rng.uniform(size=(17, 23, 3)), jnp.float32)
    uv = jnp.asarray(rng.uniform(-0.1, 1.1, size=(500, 2)), jnp.float32)
    ref = bilinear_sample(tex, uv)
    table = pack_neighborhood_table(tex)
    out = bilinear_sample_packed(table, 17, 23, uv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_packed_matches_classic_stack():
    rng = np.random.default_rng(1)
    texs = jnp.asarray(rng.uniform(size=(3, 9, 11, 2)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 3, size=400), jnp.int32)
    uv = jnp.asarray(rng.uniform(size=(400, 2)), jnp.float32)
    ref = bilinear_sample_stack(texs, idx, uv)
    table = pack_neighborhood_stack(texs)
    out = bilinear_sample_stack_packed(table, 9, 11, idx, uv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_packed_texture_gradients_match():
    """d loss / d texture must agree through the packed path (the packed
    table is built from the texture with pads/slices, so reverse-mode folds
    the one scatter back into the texture cotangent)."""
    rng = np.random.default_rng(2)
    tex0 = jnp.asarray(rng.uniform(size=(8, 8, 3)), jnp.float32)
    uv = jnp.asarray(rng.uniform(size=(100, 2)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(100, 3)), jnp.float32)

    def loss_classic(tex):
        return jnp.sum(w * bilinear_sample(tex, uv))

    def loss_packed(tex):
        table = pack_neighborhood_table(tex)
        return jnp.sum(w * bilinear_sample_packed(table, 8, 8, uv))

    g_ref = jax.grad(loss_classic)(tex0)
    g_new = jax.grad(loss_packed)(tex0)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref), atol=1e-5)


def test_packed_uv_gradients_match():
    rng = np.random.default_rng(3)
    tex = jnp.asarray(rng.uniform(size=(16, 16, 1)), jnp.float32)
    table = pack_neighborhood_table(tex)
    uv0 = jnp.asarray(rng.uniform(0.1, 0.9, size=(50, 2)), jnp.float32)

    g_ref = jax.grad(lambda uv: jnp.sum(bilinear_sample(tex, uv) ** 2))(uv0)
    g_new = jax.grad(
        lambda uv: jnp.sum(bilinear_sample_packed(table, 16, 16, uv) ** 2)
    )(uv0)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref), atol=1e-5)

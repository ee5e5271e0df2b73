import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fireflies_tpu import sampling


def test_uniform_train_in_bounds():
    s = sampling.UniformSampler.create(jnp.array([-1.0, 0.0, 3.0]), jnp.array([1.0, 0.0, 4.0]))
    key = jax.random.key(1)
    for i in range(10):
        v = s.sample(jax.random.fold_in(key, i), train=True)
        assert jnp.all(v >= s.min_range) and jnp.all(v <= s.max_range)


def test_eval_sweep_deterministic_and_wraps():
    s = sampling.UniformSampler.create(0.0, 0.05, eval_step_size=0.01)
    key = jax.random.key(0)
    vals = [float(s.sample(key, step=i, train=False)[0]) for i in range(8)]
    # 6 distinct values 0.00..0.05 then wrap.
    np.testing.assert_allclose(vals[:6], [0.0, 0.01, 0.02, 0.03, 0.04, 0.05], atol=1e-6)
    assert vals[6] == pytest.approx(0.0, abs=1e-6)


def test_eval_constant_when_min_equals_max():
    s = sampling.UniformSampler.create(jnp.array([2.0]), jnp.array([2.0]))
    assert float(s.sample(jax.random.key(0), step=7, train=False)[0]) == 2.0


def test_eval_sweep_is_vmappable():
    s = sampling.UniformSampler.create(0.0, 1.0, eval_step_size=0.25)
    steps = jnp.arange(6)
    vals = jax.vmap(lambda i: s.sample_eval(i))(steps)
    np.testing.assert_allclose(vals[:, 0], [0, 0.25, 0.5, 0.75, 1.0, 0.0], atol=1e-6)


def test_gaussian_stats():
    s = sampling.GaussianSampler.create(jnp.array([5.0]), jnp.array([0.1]))
    keys = jax.random.split(jax.random.key(0), 2000)
    vals = jax.vmap(s.sample_train)(keys)
    assert float(jnp.mean(vals)) == pytest.approx(5.0, abs=0.02)
    assert float(jnp.std(vals)) == pytest.approx(0.1, abs=0.02)


def test_integer_sampler():
    s = sampling.UniformIntegerSampler.create(jnp.array([1.0]), jnp.array([8.0]))
    key = jax.random.key(0)
    for i in range(20):
        v = s.sample(jax.random.fold_in(key, i), train=True)
        assert v.dtype == jnp.int32
        assert 1 <= int(v[0]) < 8
    evals = [int(s.sample(key, step=i, train=False)[0]) for i in range(9)]
    assert evals[:7] == [1, 2, 3, 4, 5, 6, 7]
    assert evals[7] == 1  # wraps


def test_scalar_to_vec3_correlated():
    s = sampling.UniformScalarToVec3Sampler.create(0.0, 10.0)
    v = s.sample(jax.random.key(3), train=True)
    assert v.shape == (3,)
    assert float(v[0]) == float(v[1]) == float(v[2])
    assert 0.0 <= float(v[0]) <= 10.0


def test_animation_sampler_train_eval_intervals():
    s = sampling.AnimationSampler.create(0, 80, 80, 100)
    key = jax.random.key(0)
    for i in range(10):
        frame = int(s.sample(jax.random.fold_in(key, i), train=True))
        assert 0 <= frame < 80
    evals = [int(s.sample(key, step=i, train=False)) for i in range(25)]
    assert evals[0] == 80 and evals[19] == 99 and evals[20] == 80


def test_perlin_shape_and_range():
    tex = sampling.rand_perlin_2d(jax.random.key(0), (64, 64), (4, 4))
    assert tex.shape == (64, 64)
    assert float(jnp.max(jnp.abs(tex))) <= 1.5  # sqrt(2) bound-ish
    # Non-degenerate.
    assert float(jnp.std(tex)) > 0.01


def test_noise_texture_lerp_sampler():
    s = sampling.NoiseTextureLerpSampler.create(
        color_a=[1.0, 0.0, 0.0], color_b=[0.0, 0.0, 1.0], texture_shape=(32, 32)
    )
    tex = s.sample(jax.random.key(1), train=True)
    assert tex.shape == (3, 32, 32)
    assert float(tex.min()) >= -1e-5 and float(tex.max()) <= 1.0 + 1e-5
    # Jit + vmap over keys must work (the reason this sampler was redesigned).
    keys = jax.random.split(jax.random.key(0), 4)
    batch = jax.jit(jax.vmap(s.sample_train))(keys)
    assert batch.shape == (4, 3, 32, 32)


def test_bridson_spacing():
    n, pts = sampling.bridson(np.full((50, 50), 5.0), seed=0)
    assert n == len(pts) and n > 10
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    d[np.arange(n), np.arange(n)] = 1e9
    assert d.min() >= 5.0 * 0.999


def test_dart_throwing_spacing():
    pts, valid = sampling.dart_throwing(jax.random.key(0), 64, radius=0.05)
    pts = np.asarray(pts)[np.asarray(valid)]
    assert len(pts) > 16
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    np.fill_diagonal(d, 1e9)
    assert d.min() >= 0.05 * 0.999


def test_noise_texture_eval_deterministic():
    s = sampling.NoiseTextureLerpSampler.create([0, 0, 0], [1, 1, 1], (16, 16))
    a = s.sample(jax.random.key(5), step=3, train=False)
    b = s.sample(jax.random.key(9), step=3, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))  # key-independent
    c = s.sample(jax.random.key(0), step=4, train=False)
    assert float(jnp.abs(a - c).max()) > 1e-3  # steps differ
    # And it jits.
    d = jax.jit(lambda st: s.sample_eval(st))(jnp.asarray(3))
    np.testing.assert_allclose(np.asarray(d), np.asarray(a), atol=1e-6)

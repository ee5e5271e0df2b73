"""Golden-image regression tests.

Pinned small renders of canonical scenes (CPU, fixed keys).  Any
unintentional change to the renderer's output between rounds fails here;
intentional changes regenerate with FF_UPDATE_GOLDENS=1.
"""

import os
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fireflies_tpu.assets import scenes as ff_scenes
from fireflies_tpu.render import (
    RenderConfig,
    SceneBridge,
    render_depth,
    render_rgb,
    render_soft_silhouette,
)

GOLDEN_DIR = Path(__file__).parent / "goldens"
UPDATE = bool(os.environ.get("FF_UPDATE_GOLDENS"))


def _check(name: str, img, atol=2e-3):
    GOLDEN_DIR.mkdir(exist_ok=True)
    path = GOLDEN_DIR / f"{name}.npy"
    arr = np.asarray(img, np.float32)
    if UPDATE or not path.exists():
        np.save(path, arr)
        if UPDATE:
            pytest.skip(f"golden {name} regenerated")
        return
    golden = np.load(path)
    np.testing.assert_allclose(arr, golden, atol=atol, err_msg=f"golden {name} drifted")


def test_golden_hello_world_rgb():
    scene, kw = ff_scenes.hello_world(randomize_rotation=False)
    bridge = SceneBridge(scene, **kw)
    rs = bridge.assemble(scene.compile()(jax.random.key(7), 0))
    cfg = RenderConfig(width=48, height=48, spp=4, max_bounces=2, tri_chunk=64)
    _check("hello_world_rgb", render_rgb(rs, jax.random.key(7), cfg))


def test_golden_vocalfold_depth():
    scene, kw = ff_scenes.vocalfold(resolution=12, n_anim_frames=2)
    bridge = SceneBridge(scene, **kw)
    rs = bridge.assemble(scene.compile()(jax.random.key(7), 0))
    cfg = RenderConfig(width=48, height=48, spp=1, max_bounces=1, tri_chunk=256)
    _check("vocalfold_depth", render_depth(rs, cfg), atol=1e-4)


def test_golden_cornell_rgb():
    scene, kw = ff_scenes.cornell_like()
    bridge = SceneBridge(scene, **kw)
    rs = bridge.assemble(scene.compile()(jax.random.key(7), 0))
    cfg = RenderConfig(width=32, height=32, spp=4, max_bounces=3, tri_chunk=64)
    _check("cornell_rgb", render_rgb(rs, jax.random.key(7), cfg))


def test_golden_soft_silhouette():
    scene, kw = ff_scenes.hello_world(randomize_rotation=False)
    bridge = SceneBridge(scene, **kw)
    rs = bridge.assemble(scene.compile()(jax.random.key(7), 0))
    cfg = RenderConfig(width=48, height=48)
    _check("hello_world_soft_sil", render_soft_silhouette(rs, cfg, sigma=1e-4), atol=1e-4)

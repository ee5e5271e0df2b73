"""Shared helpers for the example scripts.

Each example mirrors its reference twin (/root/reference/examples/*) but is
headless: instead of cv2.imshow loops it renders N randomized variants and
writes PNGs to examples/output/<name>/.

Run on CPU by default (fast for the small sizes used here); set
FIREFLIES_PLATFORM=axon (or any jax platform) to target the TPU.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", os.environ.get("FIREFLIES_PLATFORM", "cpu"))

import jax.numpy as jnp  # noqa: E402

from fireflies_tpu.datagen import tonemap  # noqa: E402
from fireflies_tpu.utils.png import write_png  # noqa: E402

SIZE = int(os.environ.get("EXAMPLE_SIZE", 128))
N_VARIANTS = int(os.environ.get("EXAMPLE_VARIANTS", 4))


def out_dir(name: str) -> Path:
    d = Path(__file__).resolve().parent / "output" / name
    d.mkdir(parents=True, exist_ok=True)
    return d


def save_variants(name: str, images, prefix: str = "variant") -> None:
    d = out_dir(name)
    import numpy as np

    for i, img in enumerate(np.asarray(images)):
        write_png(str(d / f"{prefix}_{i:02d}.png"), img)
    print(f"[{name}] wrote {len(images)} images to {d}")


def render_randomized_variants(scene, bridge_kwargs, n=N_VARIANTS, size=SIZE, spp=2,
                               bounces=2, extra_params=None, key=0):
    """randomize -> render loop shared by examples 01-06."""
    from fireflies_tpu.render import RenderConfig, SceneBridge, render_rgb

    bridge = SceneBridge(scene, **bridge_kwargs)
    randomize = scene.compile()
    cfg = RenderConfig(width=size, height=size, spp=spp, max_bounces=bounces, tri_chunk=256)

    def render_one(k, step):
        params = dict(randomize(k, step))
        if extra_params:
            params.update(extra_params)
        return tonemap(render_rgb(bridge.assemble(params), k, cfg))

    keys = jax.random.split(jax.random.key(key), n)
    steps = jnp.arange(n)
    return jax.jit(jax.vmap(render_one))(keys, steps)

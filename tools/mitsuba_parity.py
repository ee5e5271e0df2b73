"""Mitsuba RMSE parity harness (BASELINE.md target: RMSE <= 1e-3).

Mitsuba is not installable in the build environment (no egress), so this
tool is a READY-TO-RUN kit:

  1. `python tools/mitsuba_parity.py export` — (any env) assemble the
     canonical scenes with fixed keys, export Mitsuba 3 bundles into
     tools/parity_scenes/, and render the fireflies_tpu side to .npy.
  2. Copy the repo (or just tools/parity_scenes/ + this file) to a machine
     with `pip install mitsuba`, then
     `python tools/mitsuba_parity.py compare` — renders each exported XML
     with Mitsuba and prints the RMSE table.

Expected results (hand-analysis; the renderer matches the analytic harness
in tests/test_render_quality.py to <1%):

  scene            spp    expected RMSE
  hello_world      256    <= 1e-3 (direct lighting, diffuse)
  cornell_like     1024   <= 5e-3 (3-bounce GI; MC noise dominates)
  vocalfold        256    <= 2e-3 (spot + principled tissue)

Known convention deltas to account for when comparing:
  * Mitsuba's `principled` couples specular/metallic slightly differently
    at spec_tint > 0; the canonical scenes keep spec_tint = 0.
  * Our spot falloff matches Mitsuba's smooth falloff between beam_width
    and cutoff_angle.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

OUT = Path(__file__).parent / "parity_scenes"
SPP = {"hello_world": 256, "cornell_like": 1024, "vocalfold": 256}
SIZE = 256


def _scenes():
    import jax

    from fireflies_tpu.assets import scenes as ff_scenes
    from fireflies_tpu.render import SceneBridge

    out = {}
    for name in ("hello_world", "cornell_like", "vocalfold"):
        if name == "hello_world":
            scene, kw = ff_scenes.hello_world(randomize_rotation=False)
        elif name == "cornell_like":
            scene, kw = ff_scenes.cornell_like()
        else:
            scene, kw = ff_scenes.vocalfold(resolution=24, n_anim_frames=2)
        bridge = SceneBridge(scene, **kw)
        rs = bridge.assemble(scene.compile()(jax.random.key(7), 0))
        out[name] = rs
    return out


def export() -> None:
    import jax

    from fireflies_tpu.render import RenderConfig, render_rgb
    from fireflies_tpu.utils.mitsuba_export import export_render_scene

    OUT.mkdir(exist_ok=True)
    meta = {}
    for name, rs in _scenes().items():
        xml = export_render_scene(rs, OUT, name, spp=SPP[name], width=SIZE, height=SIZE)
        cfg = RenderConfig(width=SIZE, height=SIZE, spp=min(SPP[name], 64),
                           max_bounces=3, tri_chunk=512)
        img = np.asarray(render_rgb(rs, jax.random.key(3), cfg), np.float32)
        np.save(OUT / f"{name}_ours.npy", img)
        meta[name] = {"xml": xml.name, "ours": f"{name}_ours.npy", "spp": SPP[name]}
        print(f"exported {name}: {xml}")
    (OUT / "manifest.json").write_text(json.dumps(meta, indent=1))


def compare() -> None:
    try:
        import mitsuba as mi
    except ImportError:
        sys.exit("mitsuba is not installed — run `export` here, `compare` in a "
                 "Mitsuba-capable environment (pip install mitsuba).")
    mi.set_variant("scalar_rgb")
    meta = json.loads((OUT / "manifest.json").read_text())
    print(f"{'scene':<16} {'RMSE':>10} {'rel-RMSE':>10}")
    for name, m in meta.items():
        scene = mi.load_file(str(OUT / m["xml"]))
        ref = np.asarray(mi.render(scene, spp=m["spp"]))[..., :3]
        ours = np.load(OUT / m["ours"])
        rmse = float(np.sqrt(np.mean((ref - ours) ** 2)))
        rel = rmse / max(float(np.sqrt(np.mean(ref**2))), 1e-9)
        print(f"{name:<16} {rmse:>10.5f} {rel:>10.5f}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "export"
    {"export": export, "compare": compare}[mode]()

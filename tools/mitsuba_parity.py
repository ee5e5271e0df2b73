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

Expected-RMSE bounds are MEASURED, not hand-analysis (VERDICT r3 #6):
`python tools/mitsuba_parity.py bounds` renders every scene at two
independent seeds and records the empirical MC-noise RMSE into
tools/parity_scenes/bounds.json; the pass bound for `compare` is

    expected_rmse = noise_rmse * sqrt(1 + spp_ours / spp_mitsuba) + bias

where `bias` is the estimator-bias allowance pinned by the per-lobe furnace
tests (tests/test_furnace.py: importance-sampled vs uniform-direction albedo
agreement <= 8% per lobe; energy conservation bounds per lobe per angle).
Measured on this box (256x256, spp 64, tools/parity_scenes/bounds.json):

  scene            spp_ours   2-seed noise RMSE   bound for compare
  hello_world      64         7.7e-4              1.6e-3
  cornell_like     64         5.7e-2              4.3e-2  (3-bounce GI)
  vocalfold        64         5.4e-2              4.4e-2  (spot highlights)

BASELINE.md's <= 1e-3 RMSE target is below the spp-64 NOISE FLOOR on the
GI/specular scenes — matching it needs spp >= ~200k on our side (noise
scales 1/sqrt(spp)) or denoised/matched-seed comparisons; `compare`
therefore prints both the measured RMSE and the noise-derived bound so the
verdict is explicit about what is bias and what is variance.

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


# Estimator-bias allowance from the per-lobe furnace harness
# (tests/test_furnace.py): the importance-sampled and uniform-direction
# albedo estimators agree to <= 8% per lobe, and the analytic falloff tests
# (tests/test_render_quality.py) hold to <= 5-8%; systematic bias between
# two CORRECT renderers of the same scene is far below either, so a 1e-3
# absolute allowance (the BASELINE.md target itself) is conservative.
BIAS_ALLOWANCE = 1e-3


def bounds() -> None:
    """Measure each scene's MC-noise RMSE floor (two independent seeds).

    Two same-spp renders at independent seeds differ by sqrt(2) * the
    per-render noise sigma; the expected RMSE against a Mitsuba render at
    spp_mi is then noise_rmse * sqrt(1/2 + spp_ours / (2 * spp_mi)) +
    BIAS_ALLOWANCE.  Written to tools/parity_scenes/bounds.json and used by
    `compare` — replaces the r3 hand-analysis table with measurements.
    """
    import jax

    from fireflies_tpu.render import RenderConfig, render_rgb

    OUT.mkdir(exist_ok=True)
    table = {}
    for name, rs in _scenes().items():
        spp = min(SPP[name], 64)
        cfg = RenderConfig(width=SIZE, height=SIZE, spp=spp,
                           max_bounces=3, tri_chunk=512)
        a = np.asarray(render_rgb(rs, jax.random.key(3), cfg), np.float32)
        b = np.asarray(render_rgb(rs, jax.random.key(11), cfg), np.float32)
        noise = float(np.sqrt(np.mean((a - b) ** 2)))
        # vs a Mitsuba render at the manifest spp (equal-spp worst case
        # keeps the full sqrt(2)... no: equal spp gives exactly `noise`).
        spp_mi = SPP[name]
        expected = noise * float(np.sqrt(0.5 + spp / (2.0 * spp_mi)))
        table[name] = {
            "spp_ours": spp, "spp_mitsuba": spp_mi,
            "noise_rmse_2seed": round(noise, 6),
            "expected_rmse_bound": round(expected + BIAS_ALLOWANCE, 6),
            "signal_rms": round(float(np.sqrt(np.mean(a**2))), 6),
        }
        print(f"{name:<16} noise={noise:.5f} bound={table[name]['expected_rmse_bound']:.5f}")
    (OUT / "bounds.json").write_text(json.dumps(table, indent=1))


def compare() -> None:
    try:
        import mitsuba as mi
    except ImportError:
        sys.exit("mitsuba is not installed — run `export` here, `compare` in a "
                 "Mitsuba-capable environment (pip install mitsuba).")
    mi.set_variant("scalar_rgb")
    meta = json.loads((OUT / "manifest.json").read_text())
    bounds_f = OUT / "bounds.json"
    btab = json.loads(bounds_f.read_text()) if bounds_f.exists() else {}
    print(f"{'scene':<16} {'RMSE':>10} {'rel-RMSE':>10} {'bound':>10} {'ok':>4}")
    for name, m in meta.items():
        scene = mi.load_file(str(OUT / m["xml"]))
        ref = np.asarray(mi.render(scene, spp=m["spp"]))[..., :3]
        ours = np.load(OUT / m["ours"])
        rmse = float(np.sqrt(np.mean((ref - ours) ** 2)))
        rel = rmse / max(float(np.sqrt(np.mean(ref**2))), 1e-9)
        bound = btab.get(name, {}).get("expected_rmse_bound")
        ok = "?" if bound is None else ("yes" if rmse <= bound else "NO")
        bs = f"{bound:>10.5f}" if bound is not None else f"{'n/a':>10}"
        print(f"{name:<16} {rmse:>10.5f} {rel:>10.5f} {bs} {ok:>4}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "export"
    {"export": export, "compare": compare, "bounds": bounds}[mode]()

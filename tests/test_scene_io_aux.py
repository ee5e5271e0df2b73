import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

import fireflies_tpu as ff
from fireflies_tpu import scene_io
from fireflies_tpu.optim import checkpoint
from fireflies_tpu.render import RenderConfig, SceneBridge, render_depth, render_rgb
from fireflies_tpu.utils import profiling


SCENE_YAML = {
    "camera": {
        "position": [0, 0.8, 2.5],
        "look_at": [0, 0, 0],
        "fov": 45,
        "randomize": {"translate_x": [-0.1, 0.1], "fov": [40, 60]},
    },
    "meshes": [
        {
            "name": "mesh-Cube",
            "primitive": "box",
            "size": 0.5,
            "material": "mat-Cube",
            "randomize": {"rotate_y": [-3.14, 3.14]},
        },
        {
            "name": "mesh-Floor",
            "primitive": "plane",
            "size": 3.0,
            "position": [0, -0.6, 0],
            "material": "mat-Floor",
        },
    ],
    "materials": [
        {
            "name": "mat-Cube",
            "base_color": [0.8, 0.3, 0.25],
            "randomize": {"roughness": [0.1, 0.9]},
        },
        {"name": "mat-Floor", "base_color": [0.6, 0.6, 0.6]},
    ],
    "lights": [
        {
            "name": "light-Main",
            "kind": "point",
            "position": [1.5, 2, 2],
            "intensity": [12, 12, 12],
            "randomize": {"intensity_scalar": [5, 25]},
        }
    ],
    "background": [0, 0, 0],
}


def test_yaml_scene_loads_and_renders(tmp_path):
    import yaml

    p = tmp_path / "scene.yml"
    p.write_text(yaml.safe_dump(SCENE_YAML))
    scene, kwargs = scene_io.load_scene(p)
    assert scene.mesh("mesh-Cube") is not None
    assert scene.material("mat-Cube") is not None
    assert kwargs["camera_fov"] == 45.0

    bridge = SceneBridge(scene, **kwargs)
    params = scene.compile()(jax.random.key(0), 0)
    cfg = RenderConfig(width=24, height=24, spp=1, max_bounces=2, tri_chunk=64)
    rs = bridge.assemble(params)
    depth = render_depth(rs, cfg)
    assert float((depth > 0).mean()) > 0.3  # cube + floor visible
    img = render_rgb(rs, jax.random.key(0), cfg)
    assert bool(jnp.all(jnp.isfinite(img)))
    # Randomization spec took: fov in [40, 60].
    assert 40.0 <= float(params["PerspectiveCamera.fov"][0]) <= 60.0
    # Intensity correlated scalar sampler.
    inten = params["light-Main.intensity"]
    assert float(inten[0]) == float(inten[1]) == float(inten[2])


def test_yaml_mesh_placement():
    scene, _ = scene_io.load_scene(
        {
            "meshes": [
                {"name": "mesh-S", "primitive": "box", "size": 1.0, "position": [5, 0, 0]}
            ],
            "camera": {"position": [0, 0, 4]},
        }
    )
    params = scene.compile()(jax.random.key(0), 0)
    center = params["mesh-S.vertex_positions"].mean(axis=0)
    np.testing.assert_allclose(center, [5, 0, 0], atol=1e-4)


def test_checkpoint_roundtrip(tmp_path):
    params = {"rays": jnp.ones((8, 3)), "nested": {"a": jnp.arange(4)}}
    tx = optax.adam(1e-3)
    state = {
        "params": params,
        "opt_state": tx.init(params),
        "key": jax.random.key_data(jax.random.key(7)),
        "step": jnp.asarray(42),
    }
    p = tmp_path / "ckpt_000042.npz"
    checkpoint.save_checkpoint(p, state)
    restored = checkpoint.load_checkpoint(p, jax.tree.map(jnp.zeros_like, state))
    assert int(restored["step"]) == 42
    np.testing.assert_allclose(restored["params"]["rays"], params["rays"])
    chex_equal = jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)), restored["opt_state"], state["opt_state"]
    )
    assert all(jax.tree.leaves(chex_equal))
    assert checkpoint.latest_checkpoint(tmp_path).name == "ckpt_000042.npz"


def test_time_it_and_metrics(tmp_path):
    f = jax.jit(lambda x: x * 2)
    stats = profiling.time_it(f, jnp.ones(16), repeats=3)
    assert stats["median_s"] > 0

    log = tmp_path / "metrics.jsonl"
    m = profiling.MetricsLogger(log, echo=False)
    m.log(0, loss=1.5)
    m.log(1, loss=0.5, renders_per_sec=3.0)
    lines = log.read_text().strip().splitlines()
    assert len(lines) == 2 and '"loss": 0.5' in lines[1]


def test_debug_nans_context():
    with profiling.debug_nans(True):
        with pytest.raises(FloatingPointError):
            jnp.log(jnp.asarray(-1.0)) * 1.0  # NaN under debug_nans
    # Restored afterwards.
    _ = jnp.log(jnp.asarray(-1.0))


# ---------------------------------------------------------------------------
# PLY loading (Mitsuba scenes commonly ship .ply shapes)
# ---------------------------------------------------------------------------


def _write_ascii_ply(path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\ncomment test quad\n")
        f.write("element vertex 4\n")
        for p in ("x", "y", "z"):
            f.write(f"property float {p}\n")
        for p in ("s", "t"):
            f.write(f"property float {p}\n")
        f.write("element face 1\nproperty list uchar int vertex_indices\n")
        f.write("end_header\n")
        for v, uv in zip(verts, uvs):
            f.write(" ".join(map(str, list(v) + list(uv))) + "\n")
        f.write("4 0 1 2 3\n")
    return verts, uvs


def test_load_ply_ascii_quad_triangulated(tmp_path):
    from fireflies_tpu.utils.io import load_ply

    p = tmp_path / "quad.ply"
    verts, uvs = _write_ascii_ply(p)
    m = load_ply(p)
    np.testing.assert_allclose(m["vertices"], verts)
    np.testing.assert_allclose(m["uvs"], uvs)
    assert m["faces"].tolist() == [[0, 1, 2], [0, 2, 3]]  # fan-triangulated


def test_load_ply_binary_both_endians(tmp_path):
    import struct

    from fireflies_tpu.utils.io import load_mesh

    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    le = tmp_path / "le.ply"
    with open(le, "wb") as f:
        hdr = (
            "ply\nformat binary_little_endian 1.0\nelement vertex 4\n"
            + "".join(f"property float {p}\n" for p in ("x", "y", "z", "nx", "ny", "nz"))
            + "element face 1\nproperty list uchar int vertex_indices\nend_header\n"
        )
        f.write(hdr.encode())
        for v in verts:
            f.write(struct.pack("<6f", *v, 0.0, 0.0, 1.0))
        f.write(struct.pack("<B4i", 4, 0, 1, 2, 3))
    m = load_mesh(le)  # dispatches on suffix
    np.testing.assert_allclose(m["vertices"], verts)
    np.testing.assert_allclose(m["normals"], [[0, 0, 1]] * 4)
    assert m["faces"].tolist() == [[0, 1, 2], [0, 2, 3]]

    be = tmp_path / "be.ply"
    with open(be, "wb") as f:
        hdr = (
            "ply\nformat binary_big_endian 1.0\nelement vertex 3\n"
            + "".join(f"property float {p}\n" for p in ("x", "y", "z"))
            + "element face 1\nproperty list uchar int vertex_indices\nend_header\n"
        )
        f.write(hdr.encode())
        for v in verts[:3]:
            f.write(struct.pack(">3f", *v))
        f.write(struct.pack(">B3i", 3, 0, 1, 2))
    m = load_mesh(be)
    np.testing.assert_allclose(m["vertices"], verts[:3])
    assert m["faces"].tolist() == [[0, 1, 2]]


def test_mitsuba_xml_ply_shape(tmp_path):
    from fireflies_tpu.utils.mitsuba_xml import load_mitsuba_xml

    _write_ascii_ply(tmp_path / "quad.ply")
    (tmp_path / "scene.xml").write_text(
        """<scene version="3.0.0">
        <sensor type="perspective">
          <float name="fov" value="45"/>
          <transform name="to_world"><lookat origin="0,0,3" target="0,0,0" up="0,1,0"/></transform>
        </sensor>
        <shape type="ply" id="mesh-Quad">
          <string name="filename" value="quad.ply"/>
        </shape>
        </scene>"""
    )
    params, meta = load_mitsuba_xml(tmp_path / "scene.xml")
    assert params["mesh-Quad.vertex_positions"].shape == (4, 3)
    assert params["mesh-Quad.faces"].shape == (2, 3)

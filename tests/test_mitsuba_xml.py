import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fireflies_tpu.render import RenderConfig, SceneBridge, render_depth, render_rgb
from fireflies_tpu.utils.mitsuba_xml import load_mitsuba_xml, scene_from_mitsuba_xml

XML = """<scene version="3.0.0">
  <sensor type="perspective">
    <float name="fov" value="50"/>
    <float name="near_clip" value="0.1"/>
    <transform name="to_world">
      <lookat origin="0, 0.8, 2.5" target="0, 0, 0" up="0, 1, 0"/>
    </transform>
    <film type="hdrfilm">
      <integer name="width" value="64"/>
      <integer name="height" value="64"/>
    </film>
  </sensor>

  <shape type="cube" id="mesh-Cube">
    <transform name="to_world">
      <scale value="0.5"/>
      <rotate x="0" y="1" z="0" angle="30"/>
      <translate x="0" y="0" z="0"/>
    </transform>
    <bsdf type="twosided" id="mat-Cube">
      <bsdf type="principled">
        <rgb name="base_color" value="0.8, 0.3, 0.25"/>
        <float name="roughness" value="0.4"/>
      </bsdf>
    </bsdf>
  </shape>

  <shape type="obj" id="mesh-Tri">
    <string name="filename" value="tri.obj"/>
  </shape>

  <emitter type="point" id="emit-Main">
    <point name="position" value="1.5, 2, 2"/>
    <rgb name="intensity" value="12, 12, 12"/>
  </emitter>

  <emitter type="spot" id="emit-Spot">
    <transform name="to_world">
      <lookat origin="0, 0, 2" target="0, 0, 0" up="0, 1, 0"/>
    </transform>
    <rgb name="intensity" value="5, 5, 5"/>
    <float name="cutoff_angle" value="40"/>
  </emitter>
</scene>
"""


@pytest.fixture
def xml_path(tmp_path):
    (tmp_path / "tri.obj").write_text("v -1 -1 -1\nv 1 -1 -1\nv 0 1 -1\nf 1 2 3\n")
    p = tmp_path / "scene.xml"
    p.write_text(XML)
    return p


def test_parse_params(xml_path):
    params, meta = load_mitsuba_xml(xml_path)
    assert meta["camera_fov"] == 50.0
    assert meta["film"] == (64, 64)
    assert params["mesh-Tri.vertex_positions"].shape == (3, 3)
    # Cube transform applied: scale 0.5 then 30deg Y-rotation -> y extent 1,
    # x/z extents grow to cos30 + sin30 = 1.366.
    cube = params["mesh-Cube.vertex_positions"]
    ext = cube.max(0) - cube.min(0)
    assert ext[1] == pytest.approx(1.0, abs=1e-5)
    assert ext[0] == pytest.approx(1.366, abs=1e-3)
    assert float(params["mat-Cube.brdf_0.roughness.value"]) == 0.4
    np.testing.assert_allclose(params["emit-Main.intensity.value"], [12, 12, 12])
    assert float(params["emit-Spot.cutoff_angle"]) == 40.0
    assert meta["light_kinds"]["emit-Spot"] == "spot"


def test_scene_from_xml_renders(xml_path):
    scene, bridge_kwargs, meta = scene_from_mitsuba_xml(xml_path)
    assert scene.mesh("mesh-Cube") is not None
    assert scene.material("mat-Cube") is not None
    assert scene.light("emit-Spot").kind() == "spot"
    # Randomize like the reference would after ingestion.
    scene.mesh("mesh-Cube").rotate_z(-0.5, 0.5)
    bridge = SceneBridge(scene, **bridge_kwargs)
    params = scene.compile()(jax.random.key(0), 0)
    # Material param flowed through: canonical roughness present.
    assert float(params["mat-Cube.roughness"][0]) == pytest.approx(0.4)
    cfg = RenderConfig(width=24, height=24, spp=1, max_bounces=1, tri_chunk=64)
    rs = bridge.assemble(params)
    # The cube's material binding holds.
    assert int(rs.geometry.face_mat.max()) >= 0
    depth = render_depth(rs, cfg)
    assert float((depth > 0).mean()) > 0.02
    img = render_rgb(rs, jax.random.key(0), cfg)
    assert bool(jnp.all(jnp.isfinite(img)))


def test_colormap():
    from fireflies_tpu.utils.colormap import inferno

    img = inferno(np.linspace(0, 1, 16).reshape(4, 4))
    assert img.shape == (4, 4, 3)
    assert img[0, 0].sum() < img[-1, -1].sum()  # dark -> bright


def test_spp_buckets():
    from fireflies_tpu.datagen import spp_buckets

    vals = {spp_buckets(jax.random.key(i)) for i in range(50)}
    assert vals <= {1, 2, 4, 8, 16, 32, 64} and len(vals) > 2


def test_serialized_roundtrip(tmp_path):
    """save_serialized -> load_serialized reproduces verts/faces/uvs/normals
    (Mitsuba .serialized v4 format, utils/io.py)."""
    from fireflies_tpu.utils.io import load_mesh, load_serialized, save_serialized

    rng = np.random.default_rng(0)
    meshes = [
        {
            "name": "a",
            "vertices": rng.normal(size=(17, 3)).astype(np.float32),
            "faces": rng.integers(0, 17, size=(9, 3)).astype(np.int32),
            "uvs": rng.random((17, 2)).astype(np.float32),
            "normals": rng.normal(size=(17, 3)).astype(np.float32),
        },
        {
            "name": "b",
            "vertices": rng.normal(size=(5, 3)).astype(np.float32),
            "faces": np.asarray([[0, 1, 2], [2, 3, 4]], np.int32),
        },
    ]
    p = tmp_path / "mesh.serialized"
    save_serialized(p, meshes)
    for i, m in enumerate(meshes):
        out = load_serialized(p, shape_index=i)
        np.testing.assert_allclose(out["vertices"], m["vertices"], atol=1e-7)
        np.testing.assert_array_equal(out["faces"], m["faces"])
        if "uvs" in m:
            np.testing.assert_allclose(out["uvs"], m["uvs"], atol=1e-7)
            np.testing.assert_allclose(out["normals"], m["normals"], atol=1e-7)
        else:
            assert out["uvs"] is None and out["normals"] is None
    # load_mesh dispatch
    assert load_mesh(p)["vertices"].shape == (17, 3)


def test_serialized_shape_in_xml(tmp_path):
    from fireflies_tpu.utils.io import save_serialized

    tri = {
        "vertices": np.asarray(
            [[-1, -1, -1], [1, -1, -1], [0, 1, -1]], np.float32
        ),
        "faces": np.asarray([[0, 1, 2]], np.int32),
    }
    save_serialized(tmp_path / "tri.serialized", [tri, tri])
    xml = """<scene version="3.0.0">
      <shape type="serialized" id="mesh-S">
        <string name="filename" value="tri.serialized"/>
        <integer name="shape_index" value="1"/>
      </shape>
    </scene>"""
    p = tmp_path / "scene.xml"
    p.write_text(xml)
    params, _meta = load_mitsuba_xml(p)
    np.testing.assert_allclose(
        params["mesh-S.vertex_positions"], tri["vertices"], atol=1e-7
    )


def test_sample_envmap_conventions():
    """+Y hits the top row, -Y the bottom, and -Z the horizontal center
    (Mitsuba equirect convention)."""
    from fireflies_tpu.render.texture import sample_envmap

    h, w = 8, 16
    tex = jnp.arange(h * w * 3, dtype=jnp.float32).reshape(h, w, 3) / (h * w * 3)

    def look(d):
        d = jnp.asarray(d, jnp.float32)
        return sample_envmap(tex, d[0:1], d[1:2], d[2:3])[0]

    top = look([0.0, 1.0, 1e-6])
    bottom = look([0.0, -1.0, 1e-6])
    np.testing.assert_allclose(np.asarray(top), np.asarray(tex[0].mean(0)), atol=np.asarray(tex).max())
    # v monotonicity: +Y row index < -Y row index
    assert float(top[0]) < float(bottom[0])
    # -Z maps to u = 0.5 (horizontal center)
    center = look([0.0, 0.0, -1.0])
    mid = float(tex[tex.shape[0] // 2, w // 2, 0])
    assert abs(float(center[0]) - mid) < float(tex[0, 1, 0] - tex[0, 0, 0]) * w


def test_constant_and_envmap_emitters(tmp_path):
    """constant -> (3,) background; envmap -> (H, W, 3) background rendered
    for escaped rays by direction."""
    from fireflies_tpu.utils.png import write_png

    # Constant emitter.
    xml_c = """<scene version="3.0.0">
      <sensor type="perspective"><float name="fov" value="45"/></sensor>
      <emitter type="constant"><rgb name="radiance" value="0.25, 0.5, 0.75"/></emitter>
      <shape type="rectangle" id="mesh-R"/>
    </scene>"""
    p = tmp_path / "c.xml"
    p.write_text(xml_c)
    scene, kw, meta = scene_from_mitsuba_xml(p)
    np.testing.assert_allclose(kw["background"], [0.25, 0.5, 0.75])

    # Envmap emitter: gradient image, top row dark, bottom bright.
    img = np.zeros((8, 16, 3), np.uint8)
    img[:, :, :] = np.linspace(0, 255, 8, dtype=np.uint8)[:, None, None]
    write_png(str(tmp_path / "env.png"), img)
    xml_e = """<scene version="3.0.0">
      <sensor type="perspective"><float name="fov" value="45"/></sensor>
      <emitter type="envmap">
        <string name="filename" value="env.png"/>
        <float name="scale" value="2.0"/>
      </emitter>
      <shape type="rectangle" id="mesh-R">
        <transform name="to_world"><translate z="-50"/></transform>
      </shape>
    </scene>"""
    p2 = tmp_path / "e.xml"
    p2.write_text(xml_e)
    scene2, kw2, meta2 = scene_from_mitsuba_xml(p2)
    assert kw2["background"].shape == (8, 16, 3)
    bridge = SceneBridge(scene2, **kw2)
    rs = bridge.assemble(scene2.compile()(jax.random.key(0), 0))
    cfg = RenderConfig(width=16, height=16, spp=1, max_bounces=1, tri_chunk=16)
    img_r = render_rgb(rs, jax.random.key(1), cfg)
    img_r = np.asarray(img_r)
    assert np.all(np.isfinite(img_r))
    # Camera looks down -Z: upper film rows see higher +Y directions ->
    # darker envmap rows; scale=2 makes the bottom approach 2.0.
    assert img_r[:4].mean() < img_r[-4:].mean()
    assert img_r.max() > 1.0  # scale applied (> LDR range)

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

"""Native C++ helpers vs Python fallbacks."""

import numpy as np
import pytest

native = pytest.importorskip("fireflies_tpu.native")

from fireflies_tpu.datagen import connected_components as py_cc  # noqa: E402
from fireflies_tpu.render.pallas.intersect_kernel import morton_order as py_morton  # noqa: E402
from fireflies_tpu.utils.io import _load_obj_python  # noqa: E402


def test_native_obj_matches_python(tmp_path):
    p = tmp_path / "mesh.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "f 1/1 2/2 3/3 4/4\n"
    )
    a = native.parse_obj(str(p))
    b = _load_obj_python(str(p))
    np.testing.assert_allclose(a["vertices"], b["vertices"])
    np.testing.assert_array_equal(a["faces"], b["faces"])
    np.testing.assert_allclose(a["uvs"], b["uvs"])
    np.testing.assert_array_equal(a["face_uvs"], b["face_uvs"])


def test_native_obj_negative_indices(tmp_path):
    p = tmp_path / "neg.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    a = native.parse_obj(str(p))
    np.testing.assert_array_equal(a["faces"], [[0, 1, 2]])


def test_native_bridson_spacing():
    n, pts = native.bridson(np.full((60, 60), 6.0, np.float32), k=30, seed=1)
    assert n > 10
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    np.fill_diagonal(d, 1e9)
    assert d.min() >= 6.0 * 0.999
    assert pts[:, 0].max() < 60 and pts[:, 1].max() < 60


def test_native_connected_components_matches_python():
    rng = np.random.default_rng(0)
    mask = rng.uniform(size=(40, 40)) > 0.7
    assert native.connected_components(mask) == py_cc(mask)


def test_native_morton_matches_python():
    rng = np.random.default_rng(1)
    cents = rng.normal(size=(257, 3)).astype(np.float32)
    np.testing.assert_array_equal(native.morton_order(cents), py_morton(cents))

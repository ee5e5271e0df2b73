"""ctypes bindings for the native host-side helpers.

Builds `_libfireflies.so` from src/fireflies_native.cpp on first import (g++,
cached next to this file); every caller has a pure-Python fallback, so import
failures degrade gracefully.  Set FIREFLIES_NO_NATIVE=1 to force the
fallbacks (CI determinism, debugging).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_LIB_PATH = _DIR / "_libfireflies.so"


class _ObjMesh(ctypes.Structure):
    _fields_ = [
        ("vertices", ctypes.POINTER(ctypes.c_float)),
        ("faces", ctypes.POINTER(ctypes.c_int32)),
        ("uvs", ctypes.POINTER(ctypes.c_float)),
        ("face_uvs", ctypes.POINTER(ctypes.c_int32)),
        ("normals", ctypes.POINTER(ctypes.c_float)),
        ("n_vertices", ctypes.c_int64),
        ("n_faces", ctypes.c_int64),
        ("n_uvs", ctypes.c_int64),
        ("n_normals", ctypes.c_int64),
        ("has_face_uvs", ctypes.c_int32),
    ]


def _build() -> None:
    subprocess.run(
        ["make", "-s", "-C", str(_DIR)],
        check=True,
        capture_output=True,
    )


def _load() -> ctypes.CDLL:
    if os.environ.get("FIREFLIES_NO_NATIVE"):
        raise RuntimeError("native disabled via FIREFLIES_NO_NATIVE")
    src = _DIR / "src" / "fireflies_native.cpp"
    if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < src.stat().st_mtime:
        _build()
    lib = ctypes.CDLL(str(_LIB_PATH))

    lib.ff_parse_obj.argtypes = [ctypes.c_char_p]
    lib.ff_parse_obj.restype = ctypes.POINTER(_ObjMesh)
    lib.ff_free_obj.argtypes = [ctypes.POINTER(_ObjMesh)]
    lib.ff_free_obj.restype = None

    lib.ff_bridson.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    lib.ff_bridson.restype = ctypes.c_int64

    lib.ff_connected_components.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64
    ]
    lib.ff_connected_components.restype = ctypes.c_int32

    lib.ff_morton_order.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.ff_morton_order.restype = None
    return lib


_lib = _load()  # raises on failure; callers catch and fall back


def parse_obj(path: str) -> dict:
    mesh_ptr = _lib.ff_parse_obj(path.encode())
    if not mesh_ptr:
        raise FileNotFoundError(path)
    m = mesh_ptr.contents
    try:
        def arr(ptr, n, comps, dtype):
            if not ptr or n == 0:
                return None
            return np.ctypeslib.as_array(ptr, shape=(n * comps,)).reshape(n, comps).astype(dtype).copy()

        out = {
            "vertices": arr(m.vertices, m.n_vertices, 3, np.float32),
            "faces": arr(m.faces, m.n_faces, 3, np.int32),
            "uvs": arr(m.uvs, m.n_uvs, 2, np.float32),
            "face_uvs": arr(m.face_uvs, m.n_faces, 3, np.int32) if m.has_face_uvs else None,
            "normals": arr(m.normals, m.n_normals, 3, np.float32),
        }
        if out["vertices"] is None:
            out["vertices"] = np.zeros((0, 3), np.float32)
        if out["faces"] is None:
            out["faces"] = np.zeros((0, 3), np.int32)
        return out
    finally:
        _lib.ff_free_obj(mesh_ptr)


def bridson(radius_map: np.ndarray, k: int = 30, seed: int = 0):
    radius_map = np.ascontiguousarray(radius_map, np.float32)
    h, w = radius_map.shape
    max_points = max(int(4 * h * w / max(float(radius_map.min()) ** 2, 1e-6)), 1024)
    out = np.empty((max_points, 2), np.float32)
    n = _lib.ff_bridson(
        radius_map.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w, k, seed,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_points,
    )
    return int(n), out[:n].astype(np.float64)


def connected_components(mask: np.ndarray) -> int:
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    return int(
        _lib.ff_connected_components(
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w
        )
    )


def morton_order(centroids: np.ndarray) -> np.ndarray:
    centroids = np.ascontiguousarray(centroids, np.float32)
    n = centroids.shape[0]
    out = np.empty((n,), np.int32)
    _lib.ff_morton_order(
        centroids.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out

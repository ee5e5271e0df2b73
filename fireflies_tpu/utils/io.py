"""Host-side IO: YAML configs, OBJ meshes, Blender NURBS, projection matrices.

Replaces the reference's pywavefront / geomdl / yaml usage
(fireflies/utils/io.py, fireflies/entity/mesh.py:167-181) with self-contained
parsers.  A native C++ OBJ parser (fireflies_tpu.native) is used when built;
the numpy fallback is always available.
"""

from __future__ import annotations

import math
import os
from pathlib import Path

import numpy as np
import yaml

import jax.numpy as jnp

from fireflies_tpu.utils.nurbs import NURBSCurve


def read_config_yaml(file_path: str) -> dict:
    """Reference read_config_yaml (utils/io.py:76-77)."""
    return yaml.safe_load(Path(file_path).read_text())


def write_yaml(data: dict, file_path: str) -> None:
    Path(file_path).write_text(yaml.safe_dump(data))


# ---------------------------------------------------------------------------
# Projection matrix
# ---------------------------------------------------------------------------


def build_projection_matrix(fov: float, near_clip: float, far_clip: float) -> jnp.ndarray:
    """Perspective calibration matrix K (4x4), pytorch3d convention.

    Mirrors the reference (utils/io.py:81-140): fov in degrees, square pixels,
    z_sign = -1 (camera looks down -Z), NDC z mapped to [0, 1].
    """
    fov_rad = (math.pi / 180.0) * float(fov)
    tan_half = math.tan(fov_rad / 2.0)
    k = np.zeros((4, 4), np.float32)
    k[0, 0] = 1.0 / tan_half
    k[1, 1] = 1.0 / tan_half
    z_sign = -1.0
    k[3, 2] = z_sign
    k[2, 2] = z_sign * far_clip / (far_clip - near_clip)
    k[2, 3] = -(far_clip * near_clip) / (far_clip - near_clip)
    # Returned as host numpy: this matrix is builder state; device copies
    # captured in jit closures degrade the axon tunnel.
    return k


# ---------------------------------------------------------------------------
# OBJ meshes
# ---------------------------------------------------------------------------


def load_obj(path: str | os.PathLike) -> dict:
    """Minimal OBJ loader.

    Returns dict with:
      vertices: (V, 3) float32
      faces: (F, 3) int32 (quads and n-gons fan-triangulated)
      uvs: (T, 2) float32 or None
      face_uvs: (F, 3) int32 indices into uvs, or None
      normals: (N, 3) float32 or None

    Replaces the reference's pywavefront usage (entity/mesh.py:173).
    """
    try:
        from fireflies_tpu.native import parse_obj as native_parse_obj  # noqa: PLC0415

        return native_parse_obj(str(path))
    except Exception:
        pass
    return _load_obj_python(path)


def _load_obj_python(path) -> dict:
    vertices: list[list[float]] = []
    uvs: list[list[float]] = []
    normals: list[list[float]] = []
    faces: list[list[int]] = []
    face_uvs: list[list[int]] = []
    has_uv_faces = True

    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                vertices.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("vt "):
                parts = line.split()
                uvs.append([float(parts[1]), float(parts[2])])
            elif line.startswith("vn "):
                parts = line.split()
                normals.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("f "):
                parts = line.split()[1:]
                vi, ti = [], []
                for p in parts:
                    comps = p.split("/")
                    vi.append(int(comps[0]) - 1 if int(comps[0]) > 0 else len(vertices) + int(comps[0]))
                    if len(comps) > 1 and comps[1]:
                        ti.append(int(comps[1]) - 1)
                    else:
                        ti.append(-1)
                        has_uv_faces = False
                # Fan triangulation.
                for j in range(1, len(vi) - 1):
                    faces.append([vi[0], vi[j], vi[j + 1]])
                    face_uvs.append([ti[0], ti[j], ti[j + 1]])

    return {
        "vertices": np.asarray(vertices, np.float32),
        "faces": np.asarray(faces, np.int32).reshape(-1, 3),
        "uvs": np.asarray(uvs, np.float32) if uvs else None,
        "face_uvs": (
            np.asarray(face_uvs, np.int32).reshape(-1, 3) if uvs and has_uv_faces else None
        ),
        "normals": np.asarray(normals, np.float32) if normals else None,
    }


def save_obj(path: str | os.PathLike, vertices, faces) -> None:
    """Write a minimal OBJ (debug / asset authoring)."""
    vertices = np.asarray(vertices)
    faces = np.asarray(faces)
    with open(path, "w") as f:
        for v in vertices:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for face in faces:
            f.write(f"f {face[0] + 1} {face[1] + 1} {face[2] + 1}\n")


def load_obj_sequence(directory: str | os.PathLike) -> np.ndarray:
    """Load a sorted directory of OBJ frames into a (F, V, 3) vertex stack.

    Reference: fireflies/entity/mesh.py:167-181 (load_animation).  All frames
    must share topology; the first frame defines it.
    """
    paths = sorted(
        p for p in Path(directory).iterdir() if p.suffix.lower() == ".obj"
    )
    if not paths:
        raise FileNotFoundError(f"no .obj files in {directory}")
    frames = [load_obj(p)["vertices"] for p in paths]
    v0 = frames[0].shape[0]
    for i, fr in enumerate(frames):
        if fr.shape[0] != v0:
            raise ValueError(f"frame {paths[i]} has {fr.shape[0]} verts, expected {v0}")
    return np.stack(frames)


# ---------------------------------------------------------------------------
# Blender NURBS export ("v"/"deg"/"parm u" line format)
# ---------------------------------------------------------------------------


def import_blender_nurbs_obj(path: str | os.PathLike) -> NURBSCurve:
    """Parse Blender's NURBS-curve OBJ export (reference utils/io.py:142-177)."""
    control_points: list[list[float]] = []
    degree = None
    knots = None
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                control_points.append([float(x) for x in line[2:].split()])
            elif line.startswith("deg "):
                degree = int(line[4:].strip())
            elif line.startswith("parm u "):
                knots = [float(x) for x in line[7:].split()]
    if degree is None or knots is None or not control_points:
        raise ValueError(f"{path} is not a Blender NURBS OBJ export")
    cp = np.asarray(control_points, np.float32)[:, :3]
    return NURBSCurve.create(cp, knots, degree)

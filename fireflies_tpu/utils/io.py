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


_PLY_DTYPES = {
    "char": "i1", "int8": "i1", "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2", "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4", "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
}


def load_ply(path: str | os.PathLike) -> dict:
    """Stanford PLY loader (ascii + binary little/big-endian).

    Mitsuba scenes commonly reference `.ply` shapes (shape type "ply",
    mirrored by utils/mitsuba_xml.py); the reference loads them through
    Mitsuba's own plugins.  Returns the same dict shape as load_obj:
    vertices (V, 3) f32, faces (F, 3) i32 (n-gons fan-triangulated),
    uvs (V, 2) f32 or None (from s/t | u/v | texture_u/v vertex props),
    normals (V, 3) f32 or None.  face_uvs is None (PLY uvs are per-vertex).
    """
    with open(path, "rb") as f:
        magic = f.readline().strip()
        if magic != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        elements: list[tuple[str, int, list]] = []  # (name, count, props)
        while True:
            line = f.readline()
            if not line:
                raise ValueError(f"{path}: unterminated PLY header")
            tokens = line.decode("ascii", "replace").strip().split()
            if not tokens or tokens[0] == "comment":
                continue
            if tokens[0] == "format":
                fmt = tokens[1]
            elif tokens[0] == "element":
                elements.append((tokens[1], int(tokens[2]), []))
            elif tokens[0] == "property":
                if tokens[1] == "list":
                    elements[-1][2].append(
                        ("list", _PLY_DTYPES[tokens[2]], _PLY_DTYPES[tokens[3]],
                         tokens[4])
                    )
                else:
                    elements[-1][2].append(("scalar", _PLY_DTYPES[tokens[1]], tokens[2]))
            elif tokens[0] == "end_header":
                break
        if fmt is None:
            raise ValueError(f"{path}: PLY header missing format")
        endian = {"binary_little_endian": "<", "binary_big_endian": ">"}.get(fmt)

        data: dict[str, dict[str, np.ndarray] | list] = {}
        for name, count, props in elements:
            if endian is None:  # ascii
                rows = [f.readline().split() for _ in range(count)]
                cols: dict[str, np.ndarray] = {}
                lists: list[list[int]] = []
                for p in props:
                    if p[0] == "list":
                        lists = [
                            [float(x) for x in row[1 : 1 + int(row[0])]]
                            for row in rows
                        ]
                    else:
                        idx = sum(1 for q in props[: props.index(p)] if q[0] == "scalar")
                        cols[p[2]] = np.array(
                            [float(r[idx]) for r in rows], np.dtype(p[1])
                        )
                data[name] = {"cols": cols, "lists": lists}
            elif all(p[0] == "scalar" for p in props):
                dtype = np.dtype([(p[2], endian + p[1]) for p in props])
                arr = np.frombuffer(f.read(dtype.itemsize * count), dtype=dtype)
                data[name] = {"cols": {p[2]: arr[p[2]] for p in props}, "lists": []}
            else:
                # Mixed/list properties: parse row by row (faces are small).
                lists = []
                for _ in range(count):
                    for p in props:
                        if p[0] == "list":
                            n = int(
                                np.frombuffer(
                                    f.read(np.dtype(p[1]).itemsize),
                                    dtype=endian + p[1],
                                )[0]
                            )
                            item = np.dtype(p[2]).itemsize
                            vals = np.frombuffer(
                                f.read(item * n), dtype=endian + p[2]
                            )
                            lists.append([int(v) for v in vals])
                        else:
                            f.read(np.dtype(p[1]).itemsize)
                data[name] = {"cols": {}, "lists": lists}

    if "vertex" not in data:
        raise ValueError(f"{path}: PLY has no vertex element")
    vcols = data["vertex"]["cols"]
    vertices = np.stack(
        [np.asarray(vcols[a], np.float32) for a in ("x", "y", "z")], axis=-1
    )
    normals = None
    if all(a in vcols for a in ("nx", "ny", "nz")):
        normals = np.stack(
            [np.asarray(vcols[a], np.float32) for a in ("nx", "ny", "nz")], -1
        )
    uvs = None
    for ua, va in (("s", "t"), ("u", "v"), ("texture_u", "texture_v")):
        if ua in vcols and va in vcols:
            uvs = np.stack(
                [np.asarray(vcols[ua], np.float32), np.asarray(vcols[va], np.float32)],
                -1,
            )
            break
    tris: list[list[int]] = []
    for poly in data.get("face", {"lists": []})["lists"]:
        poly = [int(i) for i in poly]
        for k in range(1, len(poly) - 1):
            tris.append([poly[0], poly[k], poly[k + 1]])
    faces = (
        np.asarray(tris, np.int32) if tris else np.zeros((0, 3), np.int32)
    )
    return {
        "vertices": vertices,
        "faces": faces,
        "uvs": uvs,
        "face_uvs": None,
        "normals": normals,
    }


_SERIALIZED_MAGIC = 0x041C
# Mitsuba serialized-mesh flag bits (public format spec, Mitsuba docs
# "Serialized mesh loader (serialized)").
_MTS_HAS_NORMALS = 0x0001
_MTS_HAS_TEXCOORDS = 0x0002
_MTS_HAS_COLORS = 0x0008
_MTS_SINGLE_PRECISION = 0x1000
_MTS_DOUBLE_PRECISION = 0x2000


def load_serialized(path: str | os.PathLike, shape_index: int = 0) -> dict:
    """Mitsuba `.serialized` mesh loader (format 0x041C, versions 3/4).

    Mitsuba scene XMLs in the wild (and Blender's Mitsuba exporter, which
    the reference's README workflow relies on) commonly reference
    `<shape type="serialized">` meshes; the reference loads them through
    Mitsuba's C++ plugin (SURVEY.md L0).  Layout (public spec): a uint16
    magic + uint16 version header per shape, each shape's body a zlib
    stream; an offset dictionary (uint32 in v3, uint64 in v4) and a uint32
    shape count close the file.  The inflated body: uint32 flags, a
    null-terminated name (v3+), uint64 vertex/triangle counts, then
    positions / normals / texcoords / colors / face indices per the flags.

    Returns the same dict shape as load_obj/load_ply.
    """
    import struct
    import zlib

    raw = Path(path).read_bytes()
    if len(raw) < 8:
        raise ValueError(f"{path}: truncated serialized file")
    magic, version = struct.unpack_from("<HH", raw, 0)
    if magic != _SERIALIZED_MAGIC:
        raise ValueError(f"{path}: bad magic 0x{magic:04X} (not .serialized)")
    if version not in (3, 4):
        raise ValueError(f"{path}: unsupported serialized version {version}")
    (count,) = struct.unpack_from("<I", raw, len(raw) - 4)
    osize = 8 if version >= 4 else 4
    table_at = len(raw) - 4 - osize * count
    if count == 0 or table_at < 4:
        raise ValueError(f"{path}: corrupt shape dictionary")
    offsets = struct.unpack_from(
        f"<{count}{'Q' if version >= 4 else 'I'}", raw, table_at
    )
    if not 0 <= shape_index < count:
        raise IndexError(f"{path}: shape_index {shape_index} of {count}")
    start = offsets[shape_index] + 4  # skip the per-shape magic+version
    end = offsets[shape_index + 1] if shape_index + 1 < count else table_at
    body = zlib.decompress(raw[start:end])

    pos = 0
    (flags,) = struct.unpack_from("<I", body, pos)
    pos += 4
    if version >= 3:  # null-terminated shape name
        pos = body.index(b"\0", pos) + 1
    n_verts, n_tris = struct.unpack_from("<QQ", body, pos)
    pos += 16
    fdt = np.dtype("<f8") if flags & _MTS_DOUBLE_PRECISION else np.dtype("<f4")

    def take(n, dt):
        nonlocal pos
        arr = np.frombuffer(body, dt, count=n, offset=pos)
        pos += n * dt.itemsize
        return arr

    vertices = take(3 * n_verts, fdt).reshape(-1, 3).astype(np.float32)
    normals = (
        take(3 * n_verts, fdt).reshape(-1, 3).astype(np.float32)
        if flags & _MTS_HAS_NORMALS
        else None
    )
    uvs = (
        take(2 * n_verts, fdt).reshape(-1, 2).astype(np.float32)
        if flags & _MTS_HAS_TEXCOORDS
        else None
    )
    if flags & _MTS_HAS_COLORS:
        take(3 * n_verts, fdt)  # vertex colors: parsed, unused
    idt = np.dtype("<u8") if n_verts > 0xFFFFFFFF else np.dtype("<u4")
    faces = take(3 * n_tris, idt).reshape(-1, 3).astype(np.int32)
    return {
        "vertices": vertices,
        "faces": faces,
        "uvs": uvs,
        "face_uvs": None,
        "normals": normals,
    }


def save_serialized(path: str | os.PathLike, meshes: list[dict]) -> None:
    """Write meshes (dicts with vertices/faces[/uvs/normals]) as a Mitsuba
    `.serialized` v4 file — the OBJ->serialized converter direction, so
    scenes authored here can feed a real Mitsuba parity run."""
    import struct
    import zlib

    blobs = []
    for m in meshes:
        v = np.ascontiguousarray(m["vertices"], "<f4")
        f = np.ascontiguousarray(m["faces"], "<u4")
        uvs = m.get("uvs")
        normals = m.get("normals")
        flags = _MTS_SINGLE_PRECISION
        if normals is not None:
            flags |= _MTS_HAS_NORMALS
        if uvs is not None:
            flags |= _MTS_HAS_TEXCOORDS
        body = struct.pack("<I", flags)
        body += (str(m.get("name", "mesh")).encode() + b"\0")
        body += struct.pack("<QQ", v.shape[0], f.shape[0])
        body += v.tobytes()
        if normals is not None:
            body += np.ascontiguousarray(normals, "<f4").tobytes()
        if uvs is not None:
            body += np.ascontiguousarray(uvs, "<f4").tobytes()
        body += f.tobytes()
        blobs.append(struct.pack("<HH", _SERIALIZED_MAGIC, 4) + zlib.compress(body))

    out = b""
    offsets = []
    for blob in blobs:
        offsets.append(len(out))
        out += blob
    out += struct.pack(f"<{len(blobs)}Q", *offsets)
    out += struct.pack("<I", len(blobs))
    Path(path).write_bytes(out)


def load_mesh(path: str | os.PathLike, shape_index: int = 0) -> dict:
    """Format-dispatching mesh loader (.obj / .ply / .serialized)."""
    suffix = Path(path).suffix.lower()
    if suffix == ".ply":
        return load_ply(path)
    if suffix == ".serialized":
        return load_serialized(path, shape_index=shape_index)
    return load_obj(path)


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

"""Scene -> renderer bridge.

The functional analog of Mitsuba's `params.update()` + scene-graph rebuild
(reference scene.py:384): `SceneBridge` precomputes the static topology
(face/material/light tables) from a `fireflies_tpu.Scene` once, and
`assemble(params)` turns each randomized flat param dict into a `RenderScene`
pytree — pure, jit/vmap-safe, differentiable.

Typical use:

    scene = ff.Scene(); ...build & randomize spec...
    bridge = SceneBridge(scene, camera_fov=45.0)
    randomize = scene.compile()
    def render_variant(key, step):
        return render_rgb(bridge.assemble(randomize(key, step)), key, config)
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from fireflies_tpu.render.types import (
    LIGHT_POINT,
    LIGHT_SPOT,
    Camera,
    Geometry,
    Lights,
    Materials,
    Projector,
    RenderScene,
)
from fireflies_tpu.scene import Scene

Array = jax.Array

_KIND_CODES = {"point": LIGHT_POINT, "spot": LIGHT_SPOT, "projector": LIGHT_SPOT}

_MATERIAL_FIELDS = (
    "base_color roughness metallic specular spec_tint clearcoat clearcoat_gloss "
    "sheen sheen_tint anisotropic spec_trans flatness ior thin emission"
).split()


def _chw_to_hwc(tex: Array) -> Array:
    """Accept (3, H, W) (NoiseTextureLerpSampler convention) or (H, W, 3)."""
    if tex.ndim == 3 and tex.shape[0] == 3 and tex.shape[-1] != 3:
        return jnp.moveaxis(tex, 0, -1)
    return tex


class SceneBridge:
    def __init__(
        self,
        scene: Scene,
        camera_fov: float = 45.0,
        camera_near: float = 0.01,
        camera_far: float = 1000.0,
        projector_fov: float = 30.0,
        projector_scale: float = 1.0,
        projector_texture=None,
        projector_aperture=None,
        background=None,
        background_to_world=None,
    ):
        self._scene = scene
        self._camera_fov = float(camera_fov)
        self._camera_near = float(camera_near)
        self._camera_far = float(camera_far)
        self._projector_fov = float(projector_fov)
        self._projector_scale = float(projector_scale)
        self._projector_aperture = (
            float(projector_aperture) if projector_aperture is not None else None
        )
        self._projector_texture = (
            np.asarray(projector_texture, np.float32)
            if projector_texture is not None
            else None
        )
        # Host numpy, NOT jnp: builder-held device arrays captured by jitted
        # closures permanently degrade dispatch on the axon tunnel
        # (see sampling.base._as_f32).
        self._background = (
            np.asarray(background, np.float32) if background is not None else None
        )
        self._background_to_world = (
            np.asarray(background_to_world, np.float32)
            if background_to_world is not None
            else None
        )

        # ---- static topology ------------------------------------------------
        self._mesh_names = [m.name() for m in scene.meshes()]
        mat_index = {m.name(): i for i, m in enumerate(scene.materials())}
        binding = scene.mesh_material_binding()

        faces_list, face_mesh, face_mat, uvs_list = [], [], [], []
        offset = 0
        any_uv = any(m.uvs() is not None for m in scene.meshes())
        for mi, mesh in enumerate(scene.meshes()):
            f = mesh.faces()
            if f is None:
                raise ValueError(f"mesh {mesh.name()} has no faces")
            faces_list.append(f + offset)
            face_mesh.append(np.full(len(f), mi, np.int32))
            mat_name = binding.get(mesh.name())
            mat_id = mat_index.get(mat_name, 0) if mat_name else 0
            face_mat.append(np.full(len(f), mat_id, np.int32))
            if any_uv:
                uv = mesh.uvs()
                if uv is None or uv.shape[0] != mesh.num_vertices():
                    uv = np.zeros((mesh.num_vertices(), 2), np.float32)
                uvs_list.append(uv)
            offset += mesh.num_vertices()

        self._faces = np.concatenate(faces_list).astype(np.int32)
        self._face_mesh = np.concatenate(face_mesh)
        self._face_mat = np.concatenate(face_mat)
        self._uvs = np.concatenate(uvs_list).astype(np.float32) if any_uv else None

        # Smooth-shading vertex mask: 1.0 on vertices of meshes flagged
        # smooth (Mesh(..., smooth=True) / set_smooth()).  Vertex normals
        # are recomputed per assembled variant from the randomized vertices;
        # zeroed rows (flat meshes) fall back to the geometric normal in
        # hit_attributes (mixed flat/smooth geometry in one flat Geometry).
        smooth_rows = []
        for mesh in scene.meshes():
            is_smooth = bool(getattr(mesh, "smooth", lambda: False)())
            smooth_rows.append(
                np.full(mesh.num_vertices(), 1.0 if is_smooth else 0.0, np.float32)
            )
        mask = np.concatenate(smooth_rows) if smooth_rows else np.zeros(0, np.float32)
        self._smooth_mask = mask if mask.any() else None

        # Morton-order faces by rest-pose centroid so the Pallas kernels'
        # consecutive-face clusters are spatially tight (static topology:
        # ordering survives randomization).
        rest_verts = np.concatenate(
            [m.get_vertices() + m._centroid[None, :] for m in scene.meshes()]
        )
        centroids = rest_verts[self._faces].mean(axis=1)
        try:
            from fireflies_tpu.native import morton_order  # noqa: PLC0415
        except Exception:
            from fireflies_tpu.render.pallas.intersect_kernel import (  # noqa: PLC0415
                morton_order,
            )
        # Sort within each mesh (not across): different meshes often occupy
        # interleaved space (e.g. a tube enclosing the folds) and a global
        # curve would mix them into loose clusters.
        order = np.arange(len(self._faces))
        for mi in range(len(scene.meshes())):
            sel = np.where(self._face_mesh == mi)[0]
            if len(sel) > 1:
                order[sel] = sel[morton_order(centroids[sel])]
        self._faces = self._faces[order]
        self._face_mesh = self._face_mesh[order]
        self._face_mat = self._face_mat[order]

        # Area-light face set: faces bound to materials whose *default*
        # emission is nonzero (static membership, like Mitsuba's declared
        # area emitters; runtime randomization may change values).
        emissive_mats = {
            i
            for i, m in enumerate(scene.materials())
            if np.any(np.asarray(m.params().get("emission", 0.0), np.float32) > 0)
        }
        if emissive_mats:
            sel = np.isin(self._face_mat, sorted(emissive_mats))
            self._emissive_faces = np.where(sel)[0].astype(np.int32)
        else:
            self._emissive_faces = None

        # Which materials carry textures (static or sampled).
        self._n_materials = max(len(scene.materials()), 1)
        self._texture_mats = [
            i
            for i, m in enumerate(scene.materials())
            if m.texture() is not None
            or any("base_color.data" in k for k in m.vec3_attributes())
        ]
        # Scene-static BSDF lobe flags: an optional lobe is active iff ANY
        # material's base value for its driving field is nonzero OR the
        # field is randomized by a registered sampler (conservative —
        # sampler ranges are not inspected).  bsdf.evaluate_v/sample_v/pdf_v
        # skip the math for absent lobes at trace time; the vocalfold
        # workload (diffuse + GGX only) drops the glass/thin/clearcoat/
        # sheen/aniso chains from the hot path.
        from fireflies_tpu.scene import canonical_param  # noqa: PLC0415

        def _lobe_active(field: str) -> bool:
            for m in scene.materials():
                if np.any(np.asarray(m.params().get(field, 0.0), np.float32) != 0):
                    return True
                for attr_key in list(m.float_attributes()) + list(
                    m.vec3_attributes()
                ):
                    if attr_key == field or canonical_param(attr_key) == field:
                        return True
            return False

        _lobe_fields = {
            "trans": "spec_trans",
            "clearcoat": "clearcoat",
            "sheen": "sheen",
            "aniso": "anisotropic",
            "flatness": "flatness",
        }
        self._lobe_flags = frozenset(
            lobe for lobe, field in _lobe_fields.items() if _lobe_active(field)
        )

        # Host numpy (anti-poisoning, see _background above).
        self._roughness_texs = {
            i: np.asarray(m.roughness_texture(), np.float32)
            for i, m in enumerate(scene.materials())
            if m.roughness_texture() is not None
        }
        self._normal_texs = {
            i: np.asarray(m.normal_texture(), np.float32)
            for i, m in enumerate(scene.materials())
            if m.normal_texture() is not None
        }

    # ------------------------------------------------------------------

    def assemble(self, params: dict[str, Array]) -> RenderScene:
        scene = self._scene

        verts = jnp.concatenate(
            [params[name + ".vertex_positions"] for name in self._mesh_names]
        )
        normals = None
        if self._smooth_mask is not None:
            from fireflies_tpu.render.types import (  # noqa: PLC0415
                compute_vertex_normals,
            )

            normals = (
                compute_vertex_normals(verts, jnp.asarray(self._faces))
                * jnp.asarray(self._smooth_mask)[:, None]
            )
        geometry = Geometry(
            vertices=verts,
            faces=jnp.asarray(self._faces),
            normals=normals,
            face_mat=jnp.asarray(self._face_mat),
            face_mesh=jnp.asarray(self._face_mesh),
            uvs=jnp.asarray(self._uvs) if self._uvs is not None else None,
            emissive_faces=(
                jnp.asarray(self._emissive_faces)
                if self._emissive_faces is not None
                else None
            ),
        )

        # ---- materials ------------------------------------------------------
        mats = scene.materials()
        if mats:
            fields = {}
            for field in _MATERIAL_FIELDS:
                rows = []
                for m in mats:
                    val = params[m.name() + "." + field]
                    val = jnp.asarray(val, jnp.float32)
                    want_vec = field in ("base_color", "emission")
                    if want_vec:
                        rows.append(jnp.broadcast_to(val.reshape(-1)[:3], (3,)) if val.size >= 3 else jnp.full((3,), val.reshape(()), jnp.float32))
                    else:
                        rows.append(val.reshape(-1)[0])
                fields[field] = jnp.stack(rows)
            materials = Materials(**fields, flags=self._lobe_flags)
            if self._texture_mats:
                tex_rows, has_tex = [], []
                tex_shape = None
                for i, m in enumerate(mats):
                    # Accept both plain and Mitsuba-nested texture keys
                    # ("mat-X.base_color.data", "mat-X.brdf_0.base_color.data").
                    prefix = m.name() + "."
                    key = next(
                        (
                            k
                            for k in params
                            if k.startswith(prefix) and k.endswith("base_color.data")
                        ),
                        None,
                    )
                    if i in self._texture_mats and key is not None:
                        t = _chw_to_hwc(jnp.asarray(params[key], jnp.float32))
                        tex_shape = t.shape
                        tex_rows.append(t)
                        has_tex.append(True)
                    else:
                        tex_rows.append(None)
                        has_tex.append(False)
                assert tex_shape is not None
                tex_rows = [
                    t if t is not None else jnp.zeros(tex_shape, jnp.float32)
                    for t in tex_rows
                ]
                materials = materials.replace(
                    textures=jnp.stack(tex_rows), has_texture=jnp.asarray(has_tex)
                )
            # Roughness / normal maps: static from the Material entities,
            # overridable per step via "<mat>.roughness.data" /
            # "<mat>.normalmap.data" params (Mitsuba-style keys).
            for attr, static_texs, field, flag, chans in (
                ("roughness.data", self._roughness_texs, "roughness_tex",
                 "has_roughness_tex", 1),
                ("normalmap.data", self._normal_texs, "normal_tex",
                 "has_normal_tex", 3),
            ):
                rows, has, shape = [], [], None
                for i, m in enumerate(mats):
                    val = params.get(m.name() + "." + attr)
                    if val is None and i in static_texs:
                        val = static_texs[i]
                    if val is not None:
                        t = jnp.asarray(val, jnp.float32)
                        if chans == 1 and t.ndim == 2:
                            t = t[..., None]
                        elif chans == 3:
                            t = _chw_to_hwc(t)
                        shape = t.shape
                        rows.append(t)
                        has.append(True)
                    else:
                        rows.append(None)
                        has.append(False)
                if shape is not None:
                    rows = [
                        r if r is not None else jnp.zeros(shape, jnp.float32)
                        for r in rows
                    ]
                    materials = materials.replace(
                        **{field: jnp.stack(rows), flag: jnp.asarray(has)}
                    )
        else:
            materials = Materials.default(1)

        # ---- lights ---------------------------------------------------------
        light_ents = scene.lights()
        if light_ents:
            kinds, to_worlds, intensities, cutoffs, beams = [], [], [], [], []
            for li in light_ents:
                name = li.name()
                kinds.append(_KIND_CODES.get(li.kind(), LIGHT_POINT))
                to_worlds.append(params[name + ".to_world"])
                intensity = params.get(name + ".intensity")
                if intensity is None:
                    intensity = jnp.asarray(
                        li.defaults().get("intensity", (1.0, 1.0, 1.0)), jnp.float32
                    )
                intensities.append(jnp.asarray(intensity, jnp.float32).reshape(-1)[:3])
                cutoff_deg = params.get(name + ".cutoff_angle")
                if cutoff_deg is None:
                    cutoff_deg = jnp.asarray(
                        li.defaults().get("cutoff_angle", 20.0), jnp.float32
                    )
                cutoff_deg = jnp.asarray(cutoff_deg, jnp.float32).reshape(())
                beam_deg = jnp.asarray(
                    li.defaults().get("beam_width", None) or cutoff_deg * 0.75,
                    jnp.float32,
                )
                cutoffs.append(jnp.cos(jnp.deg2rad(cutoff_deg)))
                beams.append(jnp.cos(jnp.deg2rad(beam_deg)))
            # Soft-shadow aperture radii: statically present only when some
            # light declares one (defaults or a randomized `radius` key) —
            # absent, NEE keeps the fast shared-origin occlusion kernel.
            has_radius = any(
                params.get(li.name() + ".radius") is not None
                or li.defaults().get("radius") is not None
                for li in light_ents
            )
            radii = None
            if has_radius:
                radii = jnp.stack([
                    jnp.asarray(
                        params.get(
                            li.name() + ".radius",
                            li.defaults().get("radius", 0.0),
                        ),
                        jnp.float32,
                    ).reshape(())
                    for li in light_ents
                ])
            lights = Lights(
                kinds=jnp.asarray(kinds, jnp.int32),
                to_world=jnp.stack(to_worlds),
                intensity=jnp.stack(intensities),
                cutoff_cos=jnp.stack(cutoffs),
                beam_cos=jnp.stack(beams),
                active=jnp.ones((len(light_ents),), bool),
                radius=radii,
            )
        else:
            lights = Lights.empty()

        # ---- camera ---------------------------------------------------------
        cam_ent = scene.camera()
        if cam_ent is None:
            raise ValueError("scene has no camera")
        cam_name = cam_ent.name()
        fov = params.get(cam_name + ".fov", jnp.asarray(self._camera_fov, jnp.float32))
        camera = Camera.create(
            params[cam_name + ".to_world"],
            fov=jnp.asarray(fov, jnp.float32).reshape(-1)[0],
            near=self._camera_near,
            far=self._camera_far,
        )

        # ---- projector ------------------------------------------------------
        projector: Optional[Projector] = None
        proj_ent = scene.projector()
        if proj_ent is not None:
            pname = proj_ent.name()
            beams = params.get("tex.beams")
            if beams is not None:
                # Analytic beam-splat pattern (see render/types.Projector):
                # "tex.beams" is (K, 2) projector-NDC beam coordinates;
                # optional "tex.beam_sigma" (squared-pixel units of
                # "tex.beam_hw", default (256, 256)) and "tex.beam_color".
                projector = Projector.create(
                    params[pname + ".to_world"],
                    texture=None,
                    fov=jnp.asarray(
                        params.get(
                            pname + ".fov",
                            jnp.asarray(self._projector_fov, jnp.float32),
                        ),
                        jnp.float32,
                    ).reshape(-1)[0],
                    near=self._camera_near,
                    far=self._camera_far,
                    scale=self._projector_scale,
                    aperture=self._projector_aperture,
                    beams_ndc=beams,
                    beam_sigma=params.get("tex.beam_sigma", 10.0),
                    beam_color=params.get("tex.beam_color", (0.0, 1.0, 0.0)),
                    beam_hw=params.get("tex.beam_hw", (256, 256)),
                )
            else:
                tex = params.get("tex.data", params.get(pname + ".irradiance.data"))
                if tex is None:
                    if self._projector_texture is not None:
                        tex = jnp.asarray(self._projector_texture)
                    else:
                        tex = jnp.ones((8, 8, 3), jnp.float32)
                tex = _chw_to_hwc(jnp.asarray(tex, jnp.float32))
                pfov = params.get(pname + ".fov", jnp.asarray(self._projector_fov, jnp.float32))
                projector = Projector.create(
                    params[pname + ".to_world"],
                    texture=tex,
                    fov=jnp.asarray(pfov, jnp.float32).reshape(-1)[0],
                    near=self._camera_near,
                    far=self._camera_far,
                    scale=self._projector_scale,
                    aperture=self._projector_aperture,
                )

        return RenderScene(
            geometry=geometry,
            materials=materials,
            lights=lights,
            camera=camera,
            projector=projector,
            background=self._background,
            background_to_world=self._background_to_world,
        )

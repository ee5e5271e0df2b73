"""Scene: the core randomization API.

Mirrors the reference's pythonic surface (fireflies/scene.py): build a scene,
grab entities by name (`mesh()/light()/material()`), attach randomization
intervals and samplers, switch `train()/eval()`, then `randomize()`.

The TPU-native difference: `randomize()` does not mutate a renderer's state.
`Scene.compile()` returns a pure function

    randomize_params(key, step) -> {param_key: Array}

— the functional equivalent of the reference's "write randomized values back
into the Mitsuba parameter dict and call params.update()" (scene.py:360-384).
The emitted dict is a flat pytree keyed with Mitsuba-style names
("<mesh>.vertex_positions", "<cam>.to_world", "<mat>.roughness", ...), so the
whole pipeline jits, vmaps across variants, and differentiates.

Scene construction:
  * programmatic: Scene() + add_mesh/add_light/add_material/add_camera/...
  * ingestion: Scene.from_params(flat_dict) classifies keys by the same
    name-prefix conventions as the reference (scene.py:13-18,92-116).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from fireflies_tpu import sampling
from fireflies_tpu.emitter import Light
from fireflies_tpu.entity import Curve, Mesh, Transformable
from fireflies_tpu.material import PRINCIPLED_DEFAULTS, Material
from fireflies_tpu.utils import math as ffmath

Array = jax.Array

MESH_KEYS = ["mesh", "ply"]
CAM_KEYS = ["camera", "perspective", "perspectivecamera"]
PROJ_KEYS = ["projector"]
MAT_KEYS = ["mat", "bsdf", "brdf"]
LIGHT_KEYS = ["light", "spot", "emit"]
TEX_KEYS = ["tex"]

# Canonical principled parameter names the renderer understands.
_CANONICAL_PARAMS = set(PRINCIPLED_DEFAULTS) | {"intensity", "x_fov", "fov", "cutoff_angle"}


def canonical_param(key: str) -> Optional[str]:
    """Extract the canonical parameter name from a (possibly Mitsuba-style
    nested) attribute key, e.g. 'brdf_0.roughness.value' -> 'roughness'.

    Keys ending in '.data' are TEXTURES (e.g. 'brdf_0.base_color.data',
    main.py:132-136) — never alias them onto the scalar/vec3 field."""
    if key.split(".")[-1] == "data":
        return None
    for part in key.split("."):
        if part in _CANONICAL_PARAMS:
            return "fov" if part == "x_fov" else part
    return None


class Scene:
    def __init__(self):
        self._meshes: list[Mesh] = []
        self._lights: list[Light] = []
        self._materials: list[Material] = []
        self._curves: list[Curve] = []
        self._camera: Optional[Transformable] = None
        self._projector: Optional[Transformable] = None
        self._train = True
        self._eval_step = 0  # host-side sweep counter for the convenience API
        # mesh name -> material name (render binding)
        self._mesh_material: dict[str, str] = {}

    # ------------------------------------------------------------------
    # Construction
    # ------------------------------------------------------------------

    def add_mesh(self, mesh: Mesh, material: str | None = None) -> Mesh:
        self._meshes.append(mesh)
        if material is not None:
            self._mesh_material[mesh.name()] = material
        return mesh

    def add_light(self, light: Light) -> Light:
        self._lights.append(light)
        return light

    def add_material(self, material: Material) -> Material:
        self._materials.append(material)
        return material

    def add_curve(self, curve: Curve) -> Curve:
        self._curves.append(curve)
        return curve

    def load_curve(self, path: str, name: str = "Curve", interp_delta: float = 0.01) -> Curve:
        """Import a Blender NURBS OBJ export as a Curve entity (reference
        scene.py:239-241, fixed — upstream appends to a nonexistent attr)."""
        from fireflies_tpu.utils.io import import_blender_nurbs_obj  # noqa: PLC0415

        curve = Curve(name, import_blender_nurbs_obj(path), interp_delta=interp_delta)
        return self.add_curve(curve)

    def set_camera(self, camera: Transformable) -> Transformable:
        self._camera = camera
        return camera

    def set_projector(self, projector: Transformable) -> Transformable:
        self._projector = projector
        return projector

    def bind_material(self, mesh_name: str, material_name: str) -> None:
        self._mesh_material[mesh_name] = material_name

    def mesh_material_binding(self) -> dict[str, str]:
        return dict(self._mesh_material)

    @classmethod
    def from_params(cls, params: dict) -> "Scene":
        """Ingest a flat parameter dict with Mitsuba-style keys.

        The functional twin of the reference's `Scene(mi.traverse(scene))`
        (scene.py:92-116): top-level key prefixes decide entity type; float /
        length-3 leaves are auto-registered as (initially constant) attribute
        samplers; `<mesh>.vertex_positions` defines geometry with the centroid
        split out (scene.py:118-132).
        """
        scene = cls()
        base_keys = sorted({k.split(".")[0] for k in params})

        def sub_items(base):
            for k, v in params.items():
                if k.startswith(base + "."):
                    yield ".".join(k.split(".")[1:]), v

        for base in base_keys:
            low = base.lower()
            if any(m in low for m in MESH_KEYS):
                verts = np.asarray(params[base + ".vertex_positions"], np.float32).reshape(-1, 3)
                centroid = verts.mean(axis=0)
                faces = params.get(base + ".faces")
                mesh = Mesh(base, verts - centroid, faces)
                mesh.set_centroid(centroid)
                scene.add_mesh(mesh)
            elif any(m in low for m in CAM_KEYS):
                cam = Transformable(base)
                if base + ".to_world" in params:
                    cam.set_world(np.asarray(params[base + ".to_world"]))
                _register_leaf_attrs(cam, sub_items(base))
                cam.set_randomizable(False)
                if scene.camera() is None:
                    scene.set_camera(cam)
                else:
                    # The reference's scenes carry the laser projector as the
                    # SECOND perspective sensor ("PerspectiveCamera_1",
                    # laser_estimation.py:256-268).
                    scene.set_projector(cam)
            elif any(m in low for m in PROJ_KEYS):
                proj = Transformable(base)
                if base + ".to_world" in params:
                    proj.set_world(np.asarray(params[base + ".to_world"]))
                _register_leaf_attrs(proj, sub_items(base))
                proj.set_randomizable(False)
                scene.set_projector(proj)
            elif any(m in low for m in LIGHT_KEYS):
                light = Light(base)
                if base + ".to_world" in params:
                    light.set_world(np.asarray(params[base + ".to_world"]))
                _register_leaf_attrs(light, sub_items(base))
                light.set_randomizable(False)
                scene.add_light(light)
            elif any(m in low for m in MAT_KEYS):
                mat = Material(base)
                _register_leaf_attrs(mat, sub_items(base))
                mat.set_randomizable(False)
                scene.add_material(mat)
        return scene

    # ------------------------------------------------------------------
    # Getters (reference scene.py:43-90)
    # ------------------------------------------------------------------

    def meshes(self) -> list[Mesh]:
        return self._meshes

    def mesh_at(self, index: int) -> Mesh:
        return self._meshes[index]

    def mesh(self, name: str) -> Optional[Mesh]:
        return next((m for m in self._meshes if m.name() == name), None)

    get_mesh = mesh

    def lights(self) -> list[Light]:
        return self._lights

    def light_at(self, index: int) -> Light:
        return self._lights[index]

    def light(self, name: str) -> Optional[Light]:
        return next((l for l in self._lights if l.name() == name), None)

    get_light = light

    def materials(self) -> list[Material]:
        return self._materials

    def material_at(self, index: int) -> Material:
        return self._materials[index]

    def material(self, name: str) -> Optional[Material]:
        return next((m for m in self._materials if m.name() == name), None)

    get_material = material

    def camera(self) -> Optional[Transformable]:
        return self._camera

    def projector(self) -> Optional[Transformable]:
        return self._projector

    def curves(self) -> list[Curve]:
        return self._curves

    # ------------------------------------------------------------------
    # Mode
    # ------------------------------------------------------------------

    def train(self) -> None:
        self._train = True

    def eval(self) -> None:
        self._train = False
        self._eval_step = 0

    def is_training(self) -> bool:
        return self._train

    # ------------------------------------------------------------------
    # Compilation to a pure randomize function
    # ------------------------------------------------------------------

    def _all_transformables(self) -> list[Transformable]:
        ents: list[Transformable] = []
        ents.extend(self._curves)
        ents.extend(self._meshes)
        ents.extend(self._lights)
        if self._camera is not None:
            ents.append(self._camera)
        if self._projector is not None:
            ents.append(self._projector)
        ents.extend(self._materials)
        return ents

    def compile(self) -> Callable[[Array, Array], dict[str, Array]]:
        """Build the pure randomize function for the current train/eval mode.

        Returns randomize_params(key, step) -> flat {param_key: Array} with:
          <mesh>.vertex_positions  (V, 3) world-space randomized vertices
          <mesh>.to_world          (4, 4)
          <cam|proj|light>.to_world, plus canonical attrs ("<name>.fov", ...)
          <mat>.<param>            every principled param (sampled or default)
          <mat>.base_color.data    texture, when attached/sampled
        Entity order and parent links are baked at compile time; re-call after
        changing the spec (adding samplers invalidates compiled closures).
        """
        train = self._train
        entities = self._all_transformables()
        index_of = {id(e): i for i, e in enumerate(entities)}

        meshes = list(self._meshes)
        lights = list(self._lights)
        materials = list(self._materials)
        camera = self._camera
        projector = self._projector

        def randomize_params(key: Array, step: Array | int = 0) -> dict[str, Array]:
            step = jnp.asarray(step, jnp.int32)
            worlds: dict[int, Array] = {}

            def world_of(ent: Transformable) -> Array:
                eid = id(ent)
                if eid in worlds:
                    return worlds[eid]
                ekey = jax.random.fold_in(key, index_of[eid])
                own = ent.sample_own_world(ekey, step, train)
                parent = ent.parent()
                w = world_of(parent) @ own if parent is not None else own
                worlds[eid] = w
                return w

            params: dict[str, Array] = {}

            for mesh in meshes:
                w = world_of(mesh)
                vkey = jax.random.fold_in(jax.random.fold_in(key, index_of[id(mesh)]), 7919)
                local = mesh.sample_local_vertices(vkey, step, train)
                params[mesh.name() + ".vertex_positions"] = ffmath.transform_points(local, w)
                params[mesh.name() + ".to_world"] = w

            def emit_attrs(ent: Transformable) -> None:
                akey = jax.random.fold_in(jax.random.fold_in(key, index_of[id(ent)]), 104729)
                for attr_key, value in ent.sample_attributes(akey, step, train).items():
                    params[ent.name() + "." + attr_key] = value
                    canon = canonical_param(attr_key)
                    if canon is not None and canon != attr_key:
                        params[ent.name() + "." + canon] = value

            for light in lights:
                params[light.name() + ".to_world"] = world_of(light)
                for dkey, dval in light.defaults().items():
                    params[light.name() + "." + dkey] = jnp.asarray(dval, jnp.float32)
                emit_attrs(light)

            for ent in (camera, projector):
                if ent is not None:
                    params[ent.name() + ".to_world"] = world_of(ent)
                    emit_attrs(ent)

            for mat in materials:
                # Defaults first, then sampled attrs override via canonical names.
                for pname, pval in mat.params().items():
                    params[mat.name() + "." + pname] = jnp.asarray(pval, jnp.float32)
                if mat.texture() is not None:
                    params[mat.name() + ".base_color.data"] = jnp.asarray(
                        mat.texture(), jnp.float32
                    )
                emit_attrs(mat)

            return params

        return randomize_params

    # ------------------------------------------------------------------
    # Convenience host-side API (mirrors the reference's stateful loop)
    # ------------------------------------------------------------------

    def randomize(self, key: Array | int | None = None) -> dict[str, Array]:
        """One randomized parameter set.

        Train mode consumes `key` (int seeds accepted); eval mode advances the
        host-side sweep counter like the reference's stateful samplers.
        For jit/vmap pipelines use `compile()` directly.
        """
        if isinstance(key, int):
            key = jax.random.key(key)
        if key is None:
            key = jax.random.key(self._eval_step if not self._train else np.random.randint(2**31))
        fn = self.compile()
        step = self._eval_step
        if not self._train:
            self._eval_step += 1
        return fn(key, step)

    def randomize_batch(self, keys: Array, steps: Array | None = None) -> dict[str, Array]:
        """vmap over variants: keys (B,), optional steps (B,)."""
        fn = self.compile()
        if steps is None:
            steps = jnp.zeros(keys.shape[0], jnp.int32)
        return jax.vmap(fn)(keys, steps)


def _register_leaf_attrs(ent: Transformable, items) -> None:
    """Auto-register float / vec3 leaves as constant samplers, like the
    reference's load_light/load_material (scene.py:150-201)."""
    for key, value in items:
        if key in ("to_world", "vertex_positions", "faces"):
            continue
        arr = np.asarray(value, np.float32)
        if arr.ndim == 0 or arr.size == 1:
            ent._float_attributes[key] = sampling.ConstantSampler.of(float(arr))
        elif arr.size == 3:
            ent._vec3_attributes[key] = sampling.ConstantSampler.of(arr.reshape(3))
        # Larger tensors (textures) are static data; renderer-side concern.

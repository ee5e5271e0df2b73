"""Materials.

Reference: fireflies/material/base.py — Material is a Transformable whose
randomize() touches only float/vec3 attribute dicts (no pose), with warning
decorators guarding spatial misuse (material/base.py:22-91).

Here Material also records the BSDF model and default parameter values so the
renderer can assemble its material table.  Principled-BSDF parameter names
follow the reference workload (main.py:99-107): base_color, roughness,
metallic, specular, clearcoat, clearcoat_gloss, sheen, anisotropic,
spec_trans, flatness (+ optional base_color texture and emission).
"""

from __future__ import annotations

from fireflies_tpu.entity.transformable import Transformable
from fireflies_tpu.utils import warnings as ffwarn

PRINCIPLED_DEFAULTS: dict[str, object] = {
    "base_color": (0.8, 0.8, 0.8),
    "roughness": 0.5,
    "metallic": 0.0,
    "specular": 0.5,
    "spec_tint": 0.0,
    "clearcoat": 0.0,
    "clearcoat_gloss": 1.0,
    "sheen": 0.0,
    "sheen_tint": 0.5,
    "anisotropic": 0.0,
    "spec_trans": 0.0,
    "flatness": 0.0,
    "ior": 1.5,
    "thin": 0.0,
    "emission": (0.0, 0.0, 0.0),
}


class Material(Transformable):
    def __init__(self, name: str, bsdf: str = "principled", **params):
        super().__init__(name)
        self._bsdf = bsdf
        self._params: dict[str, object] = dict(PRINCIPLED_DEFAULTS)
        self._params.update(params)
        self._texture = None  # optional (H, W, 3) base-color texture

    def bsdf(self) -> str:
        return self._bsdf

    def params(self) -> dict:
        return self._params

    def set_param(self, key: str, value) -> None:
        self._params[key] = value

    def set_texture(self, texture) -> None:
        """Attach a base-color texture (H, W, 3) — the reference's
        'brdf_0.base_color.data' (main.py:127-136)."""
        self._texture = texture

    def texture(self):
        return self._texture

    def set_roughness_texture(self, texture) -> None:
        """Attach a roughness map (H, W) in [0, 1] — Mitsuba's textured
        `roughness` on the principled BSDF."""
        self._roughness_texture = texture

    def roughness_texture(self):
        return getattr(self, "_roughness_texture", None)

    def set_normal_texture(self, texture) -> None:
        """Attach a tangent-space normal map (H, W, 3), RGB in [0, 1]
        (n = 2 rgb - 1) — Mitsuba's `normalmap` BSDF wrapper.  The mesh
        needs UVs (the tangent frame comes from them)."""
        self._normal_texture = texture

    def normal_texture(self):
        return getattr(self, "_normal_texture", None)

    # Spatial ops are meaningless on materials; warn like the reference
    # (material/base.py:29-91, implementing the intent of its broken
    # translation/world decorators).
    @ffwarn.rotation_assignment_warning
    def rotate_x(self, *a):
        return super().rotate_x(*a)

    @ffwarn.rotation_assignment_warning
    def rotate_y(self, *a):
        return super().rotate_y(*a)

    @ffwarn.rotation_assignment_warning
    def rotate_z(self, *a):
        return super().rotate_z(*a)

    @ffwarn.rotation_assignment_warning
    def rotate(self, *a):
        return super().rotate(*a)

    @ffwarn.translation_assignment_warning
    def translate_x(self, *a):
        return super().translate_x(*a)

    @ffwarn.translation_assignment_warning
    def translate_y(self, *a):
        return super().translate_y(*a)

    @ffwarn.translation_assignment_warning
    def translate_z(self, *a):
        return super().translate_z(*a)

    @ffwarn.translation_assignment_warning
    def translate(self, *a):
        return super().translate(*a)

    @ffwarn.relative_assignment_warning
    def set_parent(self, *a):
        return super().set_parent(*a)

    @ffwarn.world_assignment_warning
    def set_world(self, *a):
        return super().set_world(*a)


__all__ = ["Material", "PRINCIPLED_DEFAULTS"]

"""Emitters.

Reference: fireflies/emitter/base.py — Light is a trivial Transformable
subclass whose params (intensity etc.) randomize via the inherited attribute
sampler dicts.  Here it also carries the static emitter type so the renderer
can build its light table.
"""

from __future__ import annotations

from fireflies_tpu.entity.transformable import Transformable


class Light(Transformable):
    """A randomizable emitter.

    kind: "point" | "spot" | "area" | "projector" | "constant"
    Static defaults (intensity, cutoff...) live in `defaults`; any of them can
    be overridden with add_float_key / add_vec3_key samplers.
    """

    def __init__(self, name: str, kind: str = "point", **defaults):
        super().__init__(name)
        self._kind = kind
        self._defaults = dict(defaults)

    def kind(self) -> str:
        return self._kind

    def defaults(self) -> dict:
        return self._defaults


__all__ = ["Light"]

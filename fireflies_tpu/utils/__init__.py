from fireflies_tpu.utils import intersections, math  # noqa: F401

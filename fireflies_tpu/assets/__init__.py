from fireflies_tpu.assets import procedural, scenes  # noqa: F401

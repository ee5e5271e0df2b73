from fireflies_tpu.render.pallas.intersect_kernel import (  # noqa: F401
    intersect_pallas,
    intersect_pallas_shared,
    morton_order,
    pack_dirs,
    pack_rays,
    pack_triangles,
    pack_triangles_woop,
)
from fireflies_tpu.render.pallas.intersect_stream import intersect_pallas_streamed  # noqa: F401
from fireflies_tpu.render.pallas.intersect_stream import intersect_pallas_streamed_general  # noqa: F401

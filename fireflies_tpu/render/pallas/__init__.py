from fireflies_tpu.render.pallas.intersect_kernel import (  # noqa: F401
    intersect_pallas,
    intersect_pallas_shared,
    morton_order,
    pack_dirs,
    pack_rays,
    pack_triangles,
    pack_triangles_woop,
)

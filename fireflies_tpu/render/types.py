"""Renderer data model: scenes as flat pytrees of arrays.

This is the TPU-native replacement for Mitsuba's C++ scene graph (reference
L0, SURVEY.md §1): geometry / material / light tables that jit, vmap and
differentiate.  The randomization layer emits a flat param dict
(fireflies_tpu.scene); `fireflies_tpu.render.bridge` assembles these
structures from it every step — the functional analog of
`mitsuba_params.update()` (reference scene.py:384).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array

LIGHT_POINT = 0
LIGHT_SPOT = 1
LIGHT_PROJECTOR = 2
LIGHT_AREA = 3


class Camera(struct.PyTreeNode):
    """Perspective sensor: camera-to-world pose, x-fov (degrees), clips.

    Convention: camera space looks down -Z, +Y up, square pixels
    (matches the reference projection matrix, utils/io.py:81-140).
    """

    to_world: Array  # (4, 4)
    fov: Array  # () degrees, horizontal
    near: Array  # ()
    far: Array  # ()

    @classmethod
    def create(cls, to_world, fov=45.0, near=0.01, far=1000.0) -> "Camera":
        return cls(
            to_world=jnp.asarray(to_world, jnp.float32),
            fov=jnp.asarray(fov, jnp.float32).reshape(()),
            near=jnp.asarray(near, jnp.float32).reshape(()),
            far=jnp.asarray(far, jnp.float32).reshape(()),
        )


class Projector(struct.PyTreeNode):
    """Textured spotlight — the structured-light source.

    Mitsuba equivalent: `projector` emitter with "tex.data" irradiance
    texture (reference main.py:64-77).  `texture` is (Ht, Wt, 3) and fully
    differentiable: gradients flow from rendered images back to the pattern.

    ANALYTIC BEAM MODE: when `beams_ndc` is set (and texture may be None),
    the emitter evaluates the laser pattern's Gaussian splats directly at
    the projector-plane coordinate of each shading point — the continuous
    field `sum_k exp(-((d_px^2)/sigma)^2)` whose rasterization the texture
    route samples (graphics/rasterization.py falloff, reference
    raster.py:31-35).  This skips the per-bounce texture gather (TPU
    gathers are per-row bound, ~23 ms per 4M rays) AND the pattern's
    rasterization + bilinear discretization, so beam-direction gradients
    are exact.  `beam_hw` fixes the pixel metric so sigma means the same
    squared-pixel units as the texture route at that resolution.
    """

    to_world: Array  # (4, 4)
    fov: Array  # () degrees
    near: Array
    far: Array
    texture: Optional[Array]  # (Ht, Wt, 3); None in analytic beam mode
    scale: Array  # () intensity scale
    # Optional soft-shadow aperture radius (): see Lights.radius.
    aperture: Optional[Array] = None
    # Analytic beam mode (all set together): (K, 2) projector-NDC beam
    # coordinates, () splat sigma in squared-pixel units, (3,) beam color.
    beams_ndc: Optional[Array] = None
    beam_sigma: Optional[Array] = None
    beam_color: Optional[Array] = None
    # Static pixel metric (H, W) the sigma is expressed in.
    beam_hw: Optional[tuple] = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(
        cls, to_world, texture, fov=30.0, near=0.01, far=1000.0, scale=1.0,
        aperture=None, beams_ndc=None, beam_sigma=10.0,
        beam_color=(0.0, 1.0, 0.0), beam_hw=(256, 256),
    ):
        analytic = beams_ndc is not None
        return cls(
            to_world=jnp.asarray(to_world, jnp.float32),
            fov=jnp.asarray(fov, jnp.float32).reshape(()),
            near=jnp.asarray(near, jnp.float32).reshape(()),
            far=jnp.asarray(far, jnp.float32).reshape(()),
            texture=(
                jnp.asarray(texture, jnp.float32) if texture is not None else None
            ),
            scale=jnp.asarray(scale, jnp.float32).reshape(()),
            aperture=(
                jnp.asarray(aperture, jnp.float32).reshape(())
                if aperture is not None
                else None
            ),
            beams_ndc=(
                jnp.asarray(beams_ndc, jnp.float32) if analytic else None
            ),
            beam_sigma=(
                jnp.asarray(beam_sigma, jnp.float32).reshape(()) if analytic else None
            ),
            beam_color=(
                jnp.asarray(beam_color, jnp.float32).reshape(3) if analytic else None
            ),
            beam_hw=(int(beam_hw[0]), int(beam_hw[1])) if analytic else None,
        )


class Lights(struct.PyTreeNode):
    """Fixed-slot light table (static L; masked).

    kinds: LIGHT_POINT / LIGHT_SPOT (area lights ride emissive materials).
    Spot falloff follows Mitsuba's spot emitter: full intensity inside
    `beam_cos`, smooth falloff to `cutoff_cos`, zero outside.
    """

    kinds: Array  # (L,) int32
    to_world: Array  # (L, 4, 4)
    intensity: Array  # (L, 3)
    cutoff_cos: Array  # (L,)
    beam_cos: Array  # (L,)
    active: Array  # (L,) bool
    # Optional soft-shadow aperture radii (L,): when present, NEE visibility
    # is averaged over a disk of this radius around each emitter (disk in
    # the light's local XY plane), giving penumbrae while radiance keeps the
    # delta model.  None (default) keeps exact hard shadows AND the fast
    # shared-origin occlusion kernel; radius 0 with the field present is
    # also hard but pays the general-kernel occlusion cost.
    radius: Optional[Array] = None

    @property
    def count(self) -> int:
        return self.kinds.shape[0]

    @property
    def positions(self) -> Array:
        return self.to_world[:, :3, 3]

    @classmethod
    def empty(cls) -> "Lights":
        return cls(
            kinds=jnp.zeros((0,), jnp.int32),
            to_world=jnp.zeros((0, 4, 4), jnp.float32),
            intensity=jnp.zeros((0, 3), jnp.float32),
            cutoff_cos=jnp.zeros((0,), jnp.float32),
            beam_cos=jnp.zeros((0,), jnp.float32),
            active=jnp.zeros((0,), bool),
        )


class Materials(struct.PyTreeNode):
    """Principled-BSDF parameter table, one row per material.

    Fields follow the reference workload's randomized params (main.py:99-107)
    plus base_color/emission; `textures` is an optional stacked
    (M, Ht, Wt, 3) base-color texture array with `has_texture` mask.
    """

    base_color: Array  # (M, 3)
    roughness: Array  # (M,)
    metallic: Array
    specular: Array
    spec_tint: Array
    clearcoat: Array
    clearcoat_gloss: Array
    sheen: Array
    sheen_tint: Array
    anisotropic: Array
    spec_trans: Array
    flatness: Array
    ior: Array
    # thin = 1 switches spec_trans to the thin-sheet diffuse transmission
    # lobe (Disney-thin / Mitsuba `principledthin`); thin = 0 (default,
    # Mitsuba `principled` parity) does microfacet rough-dielectric
    # refraction with `ior`.
    thin: Array
    emission: Array  # (M, 3)
    textures: Optional[Array] = None  # (M, Ht, Wt, 3) base-color
    has_texture: Optional[Array] = None  # (M,) bool
    # Optional roughness map stack, (M, Hr, Wr, 1) in [0, 1] — overrides the
    # scalar `roughness` where has_roughness_tex (Mitsuba principled
    # accepts textured roughness the same way).
    roughness_tex: Optional[Array] = None
    has_roughness_tex: Optional[Array] = None  # (M,) bool
    # Optional tangent-space normal map stack, (M, Hn, Wn, 3) RGB in [0, 1]
    # (n = 2 rgb - 1) — Mitsuba's `normalmap` BSDF wrapper.  Requires mesh
    # UVs (the shading frame tangent comes from hit_attributes).
    normal_tex: Optional[Array] = None
    has_normal_tex: Optional[Array] = None  # (M,) bool
    # Scene-static lobe specialization (pytree AUX data, not traced): the
    # set of optional principled lobes any material in this table can
    # activate — among {"trans", "clearcoat", "sheen", "aniso", "flatness"}.
    # None (default) = conservative, all lobes on.  The bridge computes it
    # from base values + registered samplers; bsdf.evaluate_v / sample_v /
    # pdf_v skip the math for absent lobes at trace time (a skipped lobe's
    # weight is identically zero, so results are unchanged).
    flags: Optional[frozenset] = struct.field(pytree_node=False, default=None)

    @property
    def count(self) -> int:
        return self.base_color.shape[0]

    @classmethod
    def default(cls, count: int = 1) -> "Materials":
        ones = jnp.ones((count,), jnp.float32)
        return cls(
            base_color=jnp.full((count, 3), 0.8, jnp.float32),
            roughness=ones * 0.5,
            metallic=ones * 0.0,
            specular=ones * 0.5,
            spec_tint=ones * 0.0,
            clearcoat=ones * 0.0,
            clearcoat_gloss=ones * 1.0,
            sheen=ones * 0.0,
            sheen_tint=ones * 0.5,
            anisotropic=ones * 0.0,
            spec_trans=ones * 0.0,
            flatness=ones * 0.0,
            ior=ones * 1.5,
            thin=ones * 0.0,
            emission=jnp.zeros((count, 3), jnp.float32),
        )


class Geometry(struct.PyTreeNode):
    """Triangle soup with per-face material/mesh ids.

    vertices are *world-space* (the randomize step bakes entity transforms,
    like the reference writes world-space verts into Mitsuba, scene.py:243-251).
    """

    vertices: Array  # (V, 3)
    faces: Array  # (F, 3) int32
    face_mat: Array  # (F,) int32
    face_mesh: Array  # (F,) int32
    uvs: Optional[Array] = None  # (V, 2)
    # Faces bound to materials with (statically) nonzero default emission —
    # the area-light sample set for NEE.  Emission *values* may still be
    # randomized at runtime; membership is static (Mitsuba area emitters are
    # likewise declared, not discovered).
    emissive_faces: Optional[Array] = None  # (E,) int32
    # Optional vertex normals (V, 3) for smooth (Phong-interpolated)
    # shading — Mitsuba meshes interpolate vertex normals unless
    # face_normals=true (reference scenes inherit that default).  All-zero
    # rows mark flat-shaded vertices: hit attributes fall back to the
    # geometric normal where the interpolated normal is ~zero.
    normals: Optional[Array] = None  # (V, 3)

    @property
    def num_faces(self) -> int:
        return self.faces.shape[0]

    @property
    def num_meshes(self) -> Array:
        return jnp.max(self.face_mesh) + 1

    def triangle_corners(self):
        """(v0, e1, e2) arrays of shape (F, 3) for Möller-Trumbore."""
        v0 = self.vertices[self.faces[:, 0]]
        v1 = self.vertices[self.faces[:, 1]]
        v2 = self.vertices[self.faces[:, 2]]
        return v0, v1 - v0, v2 - v0


def compute_vertex_normals(vertices: Array, faces: Array) -> Array:
    """Area-weighted unit vertex normals, differentiable w.r.t. vertices.

    The standard smooth-shading normals Mitsuba computes when a mesh has
    no authored normals and face_normals=false: each face's (unnormalized,
    hence area-weighted) geometric normal scatter-adds onto its three
    corners.  Runs once per assembled variant (not per bounce).
    """
    v0 = vertices[faces[:, 0]]
    v1 = vertices[faces[:, 1]]
    v2 = vertices[faces[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)  # |fn| = 2 * area
    vn = (
        jnp.zeros_like(vertices)
        .at[faces[:, 0]].add(fn)
        .at[faces[:, 1]].add(fn)
        .at[faces[:, 2]].add(fn)
    )
    # rsqrt with a max-guarded radicand: sqrt-norm at the exactly-zero rows
    # (unreferenced vertices) has a NaN cotangent otherwise (see the
    # where-guarded-reciprocal VJP trap in vec3.Vec3.normalized).
    n2 = jnp.sum(vn * vn, axis=-1, keepdims=True)
    return vn * jax.lax.rsqrt(jnp.maximum(n2, 1e-24)) * (n2 > 1e-24)


class RenderScene(struct.PyTreeNode):
    geometry: Geometry
    materials: Materials
    lights: Lights
    camera: Camera
    projector: Optional[Projector] = None
    # Escape radiance: (3,) constant sky (Mitsuba `constant` emitter) or an
    # (H, W, 3) equirectangular environment map (Mitsuba `envmap`), sampled
    # by ray direction via texture.sample_envmap.
    background: Optional[Array] = None
    # Optional envmap orientation (4x4, rotation part used): directions are
    # pulled back into the envmap's local frame before lookup.
    background_to_world: Optional[Array] = None


class Hit(struct.PyTreeNode):
    """Intersection result (non-differentiable traversal output).

    nx/ny/nz/mat are OPTIONAL kernel-emitted shading attributes (see
    RenderConfig.static_geometry): the winning triangle's unnormalized
    plane normal — the Woop transform's third row, already live in the
    intersection inner loop — and its material id, carried through the
    best-hit selects.  They replace the per-row-bound packed face-table
    gather (~per-row cost regardless of width; two 16M-row gathers per
    step at the reference workload) when geometry gradients aren't
    needed.  None unless the traversal was asked for them."""

    t: Array  # (N,)
    prim: Array  # (N,) int32, -1 on miss
    u: Array  # (N,) barycentric
    v: Array  # (N,)
    valid: Array  # (N,) bool
    nx: Optional[Array] = None  # (N,) unnormalized plane normal (detached)
    ny: Optional[Array] = None
    nz: Optional[Array] = None
    mat: Optional[Array] = None  # (N,) int32 material id


class RenderConfig(struct.PyTreeNode):
    """Static render settings (hashable; changing them retraces)."""

    width: int = struct.field(pytree_node=False, default=256)
    height: int = struct.field(pytree_node=False, default=256)
    spp: int = struct.field(pytree_node=False, default=4)
    max_bounces: int = struct.field(pytree_node=False, default=2)
    ray_chunk: int = struct.field(pytree_node=False, default=0)  # 0 = no chunking
    tri_chunk: int = struct.field(pytree_node=False, default=512)
    backend: str = struct.field(pytree_node=False, default="auto")  # jax | pallas | auto
    # EXPERIMENTAL: warped-area reparameterization of primary rays
    # (render/reparam.py) — adds silhouette/visibility gradients to
    # render_rgb at ~3x reparam_k_aux extra primary traversals per sample.
    reparam: bool = struct.field(pytree_node=False, default=False)
    reparam_k_aux: int = struct.field(pytree_node=False, default=8)
    # Rays per warp chunk (0 = whole film at once).  The warp's transient
    # footprint is ~160 KiB/ray, so full 512^2 films MUST be chunked on a
    # 16 GiB chip; lax.map over chunks is exactly equivalent (row-wise warp,
    # shared constellation) and also cuts the reparam compile time.
    reparam_chunk: int = struct.field(pytree_node=False, default=0)
    reparam_radius: float = struct.field(pytree_node=False, default=0.05)
    # Warped-area reparameterization of the first BSDF-sampled (indirect)
    # bounce: silhouettes of occluders as seen from the primary hit become
    # differentiable (DirectionDomain in render/reparam.py).  Only active
    # together with `reparam`; costs ~3x reparam_k_aux extra secondary
    # traversals per sample.
    reparam_indirect: bool = struct.field(pytree_node=False, default=False)
    # Gnomonic aux-disk radius (tangent units) for the direction warp.
    # SMALL radii are the low-bias regime: the captured boundary flux is
    # radius-dependent (r5 characterization vs a deterministic quadrature
    # reference on the blocker scene, tests/test_reparam_indirect.py:
    # r=0.15 -> -28%, 0.10 -> -14%, 0.05 -> +1% +- 7%); variance grows
    # only ~2x from 0.15 to 0.05, so 0.05 is the default.
    reparam_ind_radius: float = struct.field(pytree_node=False, default=0.05)
    # How many BSDF-sampled bounces get the direction warp: 1 covers
    # one-bounce indirect silhouettes (the common case), higher values
    # reparameterize deeper vertices too (each adds ~3x reparam_k_aux
    # secondary traversals at that bounce).
    reparam_ind_bounces: int = struct.field(pytree_node=False, default=1)
    # Envmap next-event estimation: importance-sample an (H, W, 3) envmap
    # background (luminance x sin(theta) distribution) as an NEE emitter
    # with power-heuristic MIS against BSDF sampling; BSDF-sampled escapes
    # keep contributing with the complementary MIS weight.  Matches
    # Mitsuba's emitter sampling; without it an envmap is escape-only and
    # small bright regions explode variance.  No effect on scenes without
    # an (H, W, 3) envmap.
    env_nee: bool = struct.field(pytree_node=False, default=True)
    # Tile-coherent bounce sampling ("coherent path tracing", Sadeghi et
    # al. 2009, redesigned for the TPU kernels): every 2048-ray kernel
    # tile SHARES one BSDF sample draw per bounce, so a tile's bounce
    # directions spread only by its normal variation — the tile-culled
    # intersection kernels' direction boxes then actually prune (iid
    # hemisphere draws make every tile's box span the sphere).  Each
    # pixel's draw is still marginally U(0,1): per-pixel estimates stay
    # unbiased, converge at the iid rate across spp, and only the NOISE
    # CORRELATION changes (tile-blocky instead of white at low spp).
    # Requires tile-major ray order (the render_rgb path).
    coherent_bounce: bool = struct.field(pytree_node=False, default=False)
    # Share the FIRST path vertex across spp samples: primary closest hit,
    # attributes, and all vertex-0 NEE (including its occlusion kernels)
    # are computed once per render instead of once per spp sample — only
    # the BSDF bounce draw and the remaining vertices stay per-sample.
    # Vertex-0 work is spp-invariant for delta emitters under a fixed
    # camera, so estimates stay unbiased; what changes is the noise
    # decomposition (one shared pixel jitter -> spp no longer averages
    # antialiasing or vertex-0 penumbra noise).  Ignored with reparam
    # (boundary gradients need fresh primary samples) and ray_chunk.
    shared_primary: bool = struct.field(pytree_node=False, default=False)
    # Static-geometry fast path: hit attributes (position, geometric
    # normal, material id) come straight from the intersection kernels
    # instead of the differentiable face-table re-derivation, skipping the
    # per-row-bound packed gather at every path vertex (the largest
    # non-kernel cost at the reference workload shape).  Gradients w.r.t.
    # VERTICES are zero in this mode — matching Dr.Jit semantics when only
    # emitter/material params are attached (the reference's pattern
    # optimization attaches the laser texture only,
    # /root/reference/optimize_laser.py); leave False for pose/shape
    # optimization.  Automatically falls back to the gather path when the
    # scene needs interpolated quantities the kernels don't carry
    # (smooth vertex normals, surface textures, anisotropic tangents).
    static_geometry: bool = struct.field(pytree_node=False, default=False)

"""Shared integrator pieces: render config, self-intersection offset,
hit shading (hit record -> full surface interaction).

References: Shaders/RayTracingCommon.inc.hlsl:22-36 (Waechter-Binder
integer-ulp ray-origin offset), Shaders/HitShader.inc.hlsl (barycentric
interpolation with degenerate-tangent orthonormalization fallback,
material fetch with instance override, checkerboard roughness texture),
RayTracingCommon.inc.hlsl:88-116 (HitInfoToIntersection world transform).
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..core.constants import (
    INSTANCE_MATERIAL_OVERRIDE_NONE,
    MATERIAL_FLAG_ALBEDO_TEXTURE,
    MATERIAL_FLAG_INTERNAL_SCATTERING_MASK,
    MATERIAL_FLAG_INTERNAL_SCATTERING_SHIFT,
    MATERIAL_FLAG_IS_TWOSIDED,
    MATERIAL_FLAG_MULTISCATTERING,
    MATERIAL_FLAG_ROUGHNESS_TEXTURE,
    MATERIAL_FLAG_TYPE_MASK,
)
from ..core.types import Intersection, transform_point, transform_vector

F32 = jnp.float32
I32 = jnp.int32
U32 = jnp.uint32


@dataclass(frozen=True)
class RenderConfig:
    """Static kernel-specialization knobs — the analogue of the reference's
    per-scene shader #defines (MegakernelPathTracer.cpp:270-337). Hashable,
    passed as a static jit argument; changing any field recompiles, exactly
    like the reference's lazy shader recompile."""

    width: int
    height: int
    max_bounce: int = 4
    stack_size: int = 32
    light_count: int = 0
    env_light_index: int = -1           # -1 = none
    has_env_texture: bool = False
    light_visible: bool = True          # env/mesh lights visible to camera
    use_vndf: bool = True
    traversal_backend: str = "auto"     # auto|jax|brute|pallas|pallas_cluster
    filter_type: str = "box"            # film reconstruction filter
    filter_radius: float = 0.5
    any_hit: bool = False               # alpha-tested transparency
    any_hit_texture: bool = False       # opacity textures in the test
    sort_bounce_rays: bool = False      # re-order secondary rays for
                                        # block coherence (cluster kernel)
    watertight: bool = False            # PBRT watertight triangle test
    slab_march: float = 0.0             # distance-slab casting: phase 1
                                        # capped at this fraction of the
                                        # scene diagonal, later phases
                                        # re-cast the compacted
                                        # remainder (0 = off)
    slab_phases: int = 2                # slab phase count (geometric
                                        # 5x windows, last unbounded)
    pool_backend: str = ""              # wavefront POOL-cast backend
                                        # override ("" = traversal_
                                        # backend): bounced pools are
                                        # incoherent, where the pair-
                                        # expanded sweep ("pallas_pair")
                                        # wins over the bundle sweep
    pool_slab_march: float = -1.0       # slab marching for the POOL
                                        # casts only (-1 = auto: the
                                        # measured default
                                        # POOL_SLAB_DEFAULT when the
                                        # global slab_march is off,
                                        # else inherit it; 0 = off;
                                        # >0 = phase-1 window
                                        # fraction). Separate from
                                        # slab_march so the incoherent
                                        # pool can march windows while
                                        # the megakernel's coherent
                                        # camera casts (where slabs
                                        # measured 9x slower,
                                        # docs/PERF.md) stay single-
                                        # window
    pool_slab_phases: int = 2

    @property
    def has_env_light(self):
        return self.env_light_index >= 0


def pool_cast_backend(cfg):
    """The wavefront pool casts' backend (cfg.pool_backend override).

    Default on TPU: the GROUPED work-list sweep ("pallas_wlg") —
    bounced pools are incoherent, and per-128-lane-group cluster
    worklists measured 3.7x/4.5x (closest/any) over the bundle sweep
    on the warmed 1080p stand-in pool (experiments/prof_wlg.py; the
    resolver downgrades wlg to the bundle kernels for instanced or
    tiny scenes). Camera casts stay on the bundle sweep, which wins
    for coherent blocks."""
    if cfg.pool_backend:
        return cfg.pool_backend
    if cfg.traversal_backend == "auto" and jax.default_backend() == "tpu":
        return "pallas_wlg"
    return cfg.traversal_backend


def slab_enabled(scene, cfg, backend=None):
    """Distance-slab marching engages only on the work-list family
    (work-list / pair sweep) — t_cap is advisory elsewhere, so two
    phases would just duplicate the cast."""
    if cfg.slab_march <= 0.0:
        return False
    from ..accel.traverse import _resolve_backend

    resolved = _resolve_backend(scene,
                                backend or cfg.traversal_backend)
    return resolved.startswith(("pallas_wl", "pallas_pair"))


# Mid-drain pool closest casts overflow the grouped sweep's per-block
# item capacity (p90=326 vs GROUP_CAPM=192 on the warmed 1080p stand-in
# pool) and ride the dense fallback at ~2.9 s/cast; marching two
# geometric distance windows with a 3%-of-diagonal phase-1 cap bounds
# the per-phase worklists and measured 710 ms for the same cast
# (4.1x; 0.05 -> 742 ms, 0.10 -> 747 ms; experiments/prof_fits.py).
POOL_SLAB_DEFAULT = 0.03


def pool_slab_cfg(cfg):
    """The POOL casts' effective slab config: cfg view whose slab_march
    is the pool-specific value (pool_slab_march; -1 = auto: inherit an
    explicitly-set global slab_march, else POOL_SLAB_DEFAULT). Lets the
    wavefront pool march windows while the same RenderConfig's coherent
    megakernel casts stay single-window. slab_enabled() still gates the
    result on the work-list kernel family, so non-worklist pool
    backends are unaffected."""
    if cfg.pool_slab_march < 0.0:
        if cfg.slab_march > 0.0:
            return cfg
        march, phases = POOL_SLAB_DEFAULT, cfg.pool_slab_phases
    else:
        march, phases = cfg.pool_slab_march, cfg.pool_slab_phases
    return cfg.__class__(**{**cfg.__dict__,
                            "slab_march": march,
                            "slab_phases": phases})


def slab_depth(scene, cfg):
    """Phase-1 cap: cfg.slab_march fraction of the scene diagonal."""
    root_lo = scene.node_bbox_min[0]
    root_hi = scene.node_bbox_max[0]
    diag = jnp.sqrt(jnp.sum((root_hi - root_lo) ** 2))
    return jnp.float32(cfg.slab_march) * diag


def offset_ray_origin(p, n, d):
    """Integer-ulp offset of p along the geometric normal, sign-matched to
    the outgoing direction d (Waechter & Binder)."""
    n = n * jnp.sign(jnp.sum(n * d, axis=-1, keepdims=True))
    of_i = jnp.trunc(256.0 * n).astype(I32)
    p_i_bits = jax.lax.bitcast_convert_type(p, I32) + jnp.where(
        p < 0.0, -of_i, of_i)
    p_i = jax.lax.bitcast_convert_type(p_i_bits, F32)
    return jnp.where(jnp.abs(p) < (1.0 / 32.0),
                     p + n * (1.0 / 65536.0), p_i)


def _bary3(p0, p1, p2, u, v):
    return p0 + (p1 - p0) * u[..., None] + (p2 - p0) * v[..., None]


def _normalize(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


def sample_texture_atlas(textures, texture_sizes, tex_idx, uv):
    """Bilinear wrap sample of atlas layer tex_idx at uv. tex_idx (R,) i32
    (callers mask out -1), uv (R, 2)."""
    k = jnp.clip(tex_idx, 0, textures.shape[0] - 1)
    hw = texture_sizes[k].astype(F32)  # (R, 2) = (h, w)
    h = hw[..., 0]
    w = hw[..., 1]
    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x).astype(I32)
    y0 = jnp.floor(y).astype(I32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    hi = texture_sizes[k]
    x0m = jnp.mod(x0, hi[..., 1])
    x1m = jnp.mod(x0 + 1, hi[..., 1])
    y0m = jnp.mod(y0, hi[..., 0])
    y1m = jnp.mod(y0 + 1, hi[..., 0])
    v00 = textures[k, y0m, x0m]
    v01 = textures[k, y0m, x1m]
    v10 = textures[k, y1m, x0m]
    v11 = textures[k, y1m, x1m]
    return (v00 * (1 - fx) + v01 * fx) * (1 - fy) \
        + (v10 * (1 - fx) + v11 * fx) * fy


def _checkerboard(uv):
    return jnp.where(
        ((uv[..., 0] * 2).astype(I32) + (uv[..., 1] * 2).astype(I32)) % 2
        != 0, 1.0, 0.0)


def _onehot_rows(table, idx, limit=512):
    """Row fetch: one-hot matmul for small tables (gathers pay a fixed
    per-op cost on TPU; the MXU path is ~2.5x faster below ~512 rows)."""
    n = table.shape[0]
    if n <= limit:
        oh = (idx[:, None] == jnp.arange(n, dtype=idx.dtype)[None, :])
        return oh.astype(F32) @ table
    return table[idx]


def shade_hit(scene, origin, direction, hit):
    """HitInfo batch -> world-space Intersection batch.

    Attribute fetches go through the packed (V, 12) vertex table (one
    gather per corner instead of four) and the packed (M, 16) material
    table (one one-hot fetch instead of eight) — reference behavior:
    HitShader.inc.hlsl HitShader."""
    tri = scene.triangles[
        jnp.clip(hit.triangle, 0, scene.triangles.shape[0] - 1)].astype(I32)
    c0 = scene.vtx_table[tri[..., 0]]
    c1 = scene.vtx_table[tri[..., 1]]
    c2 = scene.vtx_table[tri[..., 2]]
    p0, n0, t0, uv0 = c0[:, 0:3], c0[:, 3:6], c0[:, 6:9], c0[:, 9:11]
    p1, n1, t1, uv1 = c1[:, 0:3], c1[:, 3:6], c1[:, 6:9], c1[:, 9:11]
    p2, n2, t2, uv2 = c2[:, 0:3], c2[:, 3:6], c2[:, 6:9], c2[:, 9:11]

    u, v = hit.u, hit.v
    position = _bary3(p0, p1, p2, u, v)
    normal = _normalize(_bary3(n0, n1, n2, u, v))

    # Tangent with the reference's two-stage degeneracy fallback
    eps = 1e-6
    tangent = _bary3(t0, t1, t2, u, v)
    tlen = jnp.linalg.norm(tangent, axis=-1)
    ortho = tangent - jnp.sum(tangent * normal, -1, keepdims=True) * normal
    tangent = jnp.where((tlen >= eps)[..., None], ortho, tangent)
    tlen = jnp.linalg.norm(tangent, axis=-1)
    fallback = jnp.cross(
        normal, jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], F32),
                                 normal.shape))
    flen = jnp.linalg.norm(fallback, axis=-1)
    fallback = jnp.where(
        (flen >= eps)[..., None], fallback,
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], F32), normal.shape))
    tangent = jnp.where((tlen < eps)[..., None], fallback, tangent)
    tangent = _normalize(tangent)

    geometry_normal = _normalize(jnp.cross(p2 - p0, p1 - p0))

    # material (instance override wins); single packed-row fetch
    override = scene.instance_material_overrides[hit.instance]
    mat_id = jnp.where(
        override != U32(INSTANCE_MATERIAL_OVERRIDE_NONE),
        override,
        scene.material_ids[jnp.clip(hit.triangle, 0,
                                    scene.material_ids.shape[0] - 1)],
    ).astype(I32)
    mat_id = jnp.clip(mat_id, 0, scene.mat_table.shape[0] - 1)
    mrow = _onehot_rows(scene.mat_table, mat_id)
    m_albedo = mrow[:, 0:3]
    m_ior = mrow[:, 3:6]
    m_rough = mrow[:, 6]
    m_tiling = mrow[:, 7:9]
    flags = mrow[:, 10].astype(U32)
    m_atex = mrow[:, 11].astype(I32)

    uv = uv0 + (uv1 - uv0) * u[..., None] + (uv2 - uv0) * v[..., None]
    uv = uv * m_tiling

    albedo = m_albedo
    tex_idx = m_atex
    tex_rgb = sample_texture_atlas(
        scene.textures, scene.texture_sizes, tex_idx, uv)[..., :3]
    albedo = jnp.where((tex_idx >= 0)[..., None], albedo * tex_rgb, albedo)

    roughness = m_rough * jnp.where(
        (flags & MATERIAL_FLAG_ROUGHNESS_TEXTURE) != 0,
        _checkerboard(uv), 1.0)

    # local -> world (uniform-scale assumption, like the reference)
    m = scene.instance_transforms[hit.instance]
    position = transform_point(position, m)
    normal = _normalize(transform_vector(normal, m))
    geometry_normal = _normalize(transform_vector(geometry_normal, m))
    tangent = _normalize(transform_vector(tangent, m))

    return Intersection(
        albedo=albedo,
        alpha=roughness * roughness,
        position=position,
        normal=normal,
        tangent=tangent,
        geometry_normal=geometry_normal,
        ior=m_ior,
        is_two_sided=(flags & MATERIAL_FLAG_IS_TWOSIDED) != 0,
        backface=hit.backface,
        multiscattering=(flags & MATERIAL_FLAG_MULTISCATTERING) != 0,
        internal_mode=((flags & MATERIAL_FLAG_INTERNAL_SCATTERING_MASK)
                       >> MATERIAL_FLAG_INTERNAL_SCATTERING_SHIFT
                       ).astype(I32),
        material_type=(flags & MATERIAL_FLAG_TYPE_MASK).astype(I32),
        light_index=scene.instance_light_indices[hit.instance],
        triangle_index=hit.triangle,
    )


def ray_sort_key(origin, direction, scene_lo, scene_inv_extent,
                 scheme="oct_morton12"):
    """Coherence sort key for secondary rays (the classic wavefront
    ray-binning trick; the reference gets primary-ray coherence from
    its thread-group layout and has no bounce sorting — this is a TPU
    addition to keep cull-and-sweep bundles tight).

    Schemes (high bits first). Measured on a warmed 1080p standin pool
    (experiments/prof_sortkey.py): the round-2 oct_morton12 key stays
    best — direction-refined variants spread same-origin-cell rays
    across more bundles and cost +14-43% on the closest cast, i.e.
    bundle unions are origin-window-dominated, not cone-dominated.
      oct_morton12      3-bit octant | 12-bit origin Morton (default)
      oct_dir6_morton12 octant | 6-bit within-octant direction
                        | origin Morton (+43% — kept for A/B)
      oct_morton12_dir6 origin-major refinement (+14%)
      oct_morton18      finer origin cells, no direction refinement
    """
    import jax.numpy as _jnp

    oct_ = ((direction[:, 0] >= 0).astype(_jnp.uint32)
            | ((direction[:, 1] >= 0).astype(_jnp.uint32) << 1)
            | ((direction[:, 2] >= 0).astype(_jnp.uint32) << 2))

    def _morton(bits_per_axis):
        q = _jnp.clip((origin - scene_lo) * scene_inv_extent,
                      0.0, 0.999)
        cell = (q * (1 << bits_per_axis)).astype(_jnp.uint32)
        m = _jnp.zeros_like(oct_)
        for b in range(bits_per_axis):
            for ax in range(3):
                bit = (cell[:, ax] >> b) & 1
                m = m | (bit << (3 * b + ax))
        return m

    def _dir6():
        # within-octant direction bin: 3 bits each of the two shape
        # parameters u = |dx| / s, v = |dy| / s (s = |dx|+|dy|+|dz|),
        # an octahedral-style parametrization constant per cone
        ax_, ay, az = (_jnp.abs(direction[:, 0]),
                       _jnp.abs(direction[:, 1]),
                       _jnp.abs(direction[:, 2]))
        s = _jnp.maximum(ax_ + ay + az, 1e-12)
        du = _jnp.clip(ax_ / s * 8.0, 0.0, 7.0).astype(_jnp.uint32)
        dv = _jnp.clip(ay / s * 8.0, 0.0, 7.0).astype(_jnp.uint32)
        return (du << 3) | dv

    if scheme == "oct_morton12":
        return (oct_ << 12) | _morton(4)
    if scheme == "oct_dir6_morton12":
        return (oct_ << 18) | (_dir6() << 12) | _morton(4)
    if scheme == "oct_morton12_dir6":
        return (oct_ << 18) | (_morton(4) << 6) | _dir6()
    if scheme == "oct_morton18":
        return (oct_ << 18) | _morton(6)
    raise ValueError(f"unknown ray sort scheme {scheme!r}")

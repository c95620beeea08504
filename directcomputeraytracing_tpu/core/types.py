"""Device-resident scene representation: flat SoA arrays.

This is the TPU analogue of the reference's GPU scene buffers
(reference: Source/Scene.cpp:273-608 assembles flattened vertex / triangle
/ BVH-node / material-id / instance buffers; struct layouts in
Shaders/Vertex.inc.hlsl, BVHNode.inc.hlsl, Material.inc.hlsl,
LightSharedDef.inc.hlsl). Where the reference bit-puns uints into float3
fields (e.g. SLight.position_or_triangleRange) we use separate typed
arrays — SoA is the natural TPU layout and needs no punning.

`SceneArrays` is a NamedTuple of jnp arrays, i.e. a pytree: it flows
through `jax.jit` boundaries directly and can be replicated across a
device mesh with a single `NamedSharding`.

Transforms are stored as (4, 3) row-vector matrices: world = [p, 1] @ M,
matching the reference's float4x3 `mul(float4(p,1), M)` convention.
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class SceneArrays(NamedTuple):
    # Geometry (all meshes concatenated; triangle indices are global)
    vtx_position: jnp.ndarray  # (V, 3) f32
    vtx_normal: jnp.ndarray    # (V, 3) f32
    vtx_tangent: jnp.ndarray   # (V, 3) f32
    vtx_texcoord: jnp.ndarray  # (V, 2) f32
    triangles: jnp.ndarray     # (T, 3) u32 vertex indices, BVH-leaf order

    # Two-level BVH: TLAS nodes first, then each BLAS (see core.constants)
    node_bbox_min: jnp.ndarray  # (N, 3) f32
    node_bbox_max: jnp.ndarray  # (N, 3) f32
    node_right_or_prim: jnp.ndarray  # (N,) u32
    node_misc: jnp.ndarray     # (N,) u32
    # Gather-friendly packed tables (one fetch per traversal step):
    # [bbox_min(3), bbox_max(3), right_or_prim, misc] — indices stored as
    # f32 (exact below 2^24; flatten_scene rejects larger scenes)
    node_table: jnp.ndarray    # (N, 8) f32
    tri_verts: jnp.ndarray     # (T, 9) f32 leaf-ordered v0|v1|v2, local space
    # Dense world-space triangle soup for the small-scene brute-force path
    # (instanced geometry pre-transformed; placeholder (1, 9) when unused)
    world_tris: jnp.ndarray      # (B, 9) f32
    world_tri_meta: jnp.ndarray  # (B, 3) f32 [triangle id, instance id,
                                 #             winding flip (det<0)]
    # Clustered layout for the cull-and-sweep kernel (mid-size scenes):
    # fixed 64-triangle slabs + per-cluster AABBs ((64,12)/(1,8) when unused)
    cluster_tris: jnp.ndarray    # (C*S, 13) f32 (S = cluster.CLUSTER_SIZE)
    cluster_bbox: jnp.ndarray    # (C, 8) f32 bmin|bmax|pad
    # Baldwin-Weber transform rows for the same slabs (non-watertight
    # sweep fast path; cluster.baldwin_table): (C*S, 16) f32
    cluster_bw: jnp.ndarray
    # Packed shading tables: one gather per vertex corner / material row
    # instead of one per attribute (gathers pay a fixed per-op cost on TPU)
    vtx_table: jnp.ndarray       # (V, 12) f32 pos|nrm|tan|uv|pad
    mat_table: jnp.ndarray       # (M, 16) f32 albedo|ior|rough|tiling|
                                 #   opacity|flags|albedo_tex|opacity_tex|pad
    # Alpha-test data (reference: AnyHitShader, HitShader.inc.hlsl:86-113):
    # per leaf-ordered triangle base-material opacity, and per world
    # triangle the override-aware opacity (1.0 rows for opaque instances)
    tri_opacity: jnp.ndarray       # (T,) f32
    world_tri_opacity: jnp.ndarray  # (B,) f32

    # Instances
    instance_transforms: jnp.ndarray      # (I, 4, 3) f32 local->world
    instance_inv_transforms: jnp.ndarray  # (I, 4, 3) f32 world->local
    instance_flags: jnp.ndarray           # (I,) u32
    instance_material_overrides: jnp.ndarray  # (I,) u32
    instance_light_indices: jnp.ndarray   # (I,) u32 (LIGHT_INDEX_INVALID if none)

    # Materials (SoA; per reordered triangle id -> material id)
    material_ids: jnp.ndarray     # (T,) u32
    mat_albedo: jnp.ndarray       # (M, 3) f32
    mat_ior: jnp.ndarray          # (M, 3) f32 (eta; conductor k lives in albedo)
    mat_roughness: jnp.ndarray    # (M,) f32
    mat_tiling: jnp.ndarray       # (M, 2) f32
    mat_opacity: jnp.ndarray      # (M,) f32
    mat_flags: jnp.ndarray        # (M,) u32
    mat_albedo_tex: jnp.ndarray   # (M,) i32, -1 = none
    mat_opacity_tex: jnp.ndarray  # (M,) i32, -1 = none

    # Instanced work-list tables (BLAS sharing, O(unique tris) memory;
    # reference analogue: TLAS->BLAS ray re-transform,
    # Shaders/BVHAccel.inc.hlsl:127-140). Placeholders (NS=1) when the
    # world-soup clustered path is active instead.
    icl_slab: jnp.ndarray    # (CL*S, 13) f32 mesh-LOCAL cluster slabs
    icl_bw: jnp.ndarray      # (CL*S, 16) f32 Baldwin-Weber rows (local)
    isup_cbox: jnp.ndarray   # (NS, SUPER, 8) f32 world child boxes
    isup_sbox: jnp.ndarray   # (NS, 8) f32 world super boxes
    isup_local: jnp.ndarray  # (NS,) i32 local super id (slab index)
    isup_inst: jnp.ndarray   # (NS,) i32 instance id
    inst_rows: jnp.ndarray   # (I, 16) f32 [inv A (9) | inv t (3) |
                             #              det<0 flip | pad*3]

    # Lights (SoA; replaces the reference's bit-punned SLight)
    light_radiance: jnp.ndarray   # (L, 3) f32
    light_position: jnp.ndarray   # (L, 3) f32 point position / directional dir
    light_tri_offset: jnp.ndarray  # (L,) u32 mesh lights: first triangle
    light_tri_count: jnp.ndarray   # (L,) u32
    light_instance: jnp.ndarray    # (L,) u32
    light_flags: jnp.ndarray       # (L,) u32

    # Texture atlas: stacked equally-sized RGBA layers (0-layer when unused).
    textures: jnp.ndarray          # (K, TH, TW, 4) f32
    texture_sizes: jnp.ndarray     # (K, 2) i32 valid (h, w) per layer

    # Environment map: equirectangular lat-long radiance (1x1 when unused).
    env_texture: jnp.ndarray       # (EH, EW, 3) f32

    # Opaque/masked cluster split for alpha-tested traversal on the
    # world-soup fast path: the opaque subset traverses with the plain
    # kernels (no recast loop) and only the maybe-transparent subset
    # pays the alpha recast (the reference's AnyHitShader similarly
    # runs only on non-opaque geometry, BVHAccel.inc.hlsl:182-190 +
    # instance OPAQUE flags). Sentinels ((S,13)/(S,16)/(1,8)) when the
    # scene has no alpha, is instanced, or an opacity edit invalidated
    # the split (scene/edit.py then falls back to the full recast).
    oclu_tris: jnp.ndarray   # (CO*S, 13) f32
    oclu_bw: jnp.ndarray     # (CO*S, 16) f32
    oclu_bbox: jnp.ndarray   # (CO, 8) f32
    mclu_tris: jnp.ndarray   # (CM*S, 13) f32
    mclu_bw: jnp.ndarray     # (CM*S, 16) f32
    mclu_bbox: jnp.ndarray   # (CM, 8) f32

    @property
    def num_triangles(self):
        return self.triangles.shape[0]

    @property
    def num_lights(self):
        return self.light_flags.shape[0]


class Intersection(NamedTuple):
    """Batched surface interaction record (reference:
    Shaders/Intersection.inc.hlsl). All fields (R, ...) arrays."""

    albedo: jnp.ndarray          # (R, 3) (conductor: absorption k)
    alpha: jnp.ndarray           # (R,) GGX alpha = roughness^2
    position: jnp.ndarray        # (R, 3) world
    normal: jnp.ndarray          # (R, 3) shading normal, world
    tangent: jnp.ndarray         # (R, 3) world
    geometry_normal: jnp.ndarray  # (R, 3) world
    ior: jnp.ndarray             # (R, 3)
    is_two_sided: jnp.ndarray    # (R,) bool
    backface: jnp.ndarray        # (R,) bool
    multiscattering: jnp.ndarray  # (R,) bool
    internal_mode: jnp.ndarray   # (R,) i32
    material_type: jnp.ndarray   # (R,) i32
    light_index: jnp.ndarray     # (R,) u32
    triangle_index: jnp.ndarray  # (R,) i32


class CameraParams(NamedTuple):
    """Thin-lens / pinhole camera constants (reference:
    Shaders/RayTracingCommon.inc.hlsl:57-86 GenerateRay and the
    SRayTracingConstants block in MegakernelPathTracing.hlsl:70-86)."""

    transform: jnp.ndarray      # (4, 4) f32 row-vector camera->world
    film_size: jnp.ndarray      # (2,) f32 meters
    aperture_radius: jnp.ndarray  # () f32, 0 = pinhole
    focal_distance: jnp.ndarray   # () f32
    film_distance: jnp.ndarray    # () f32
    blade_count: jnp.ndarray      # () i32, <=2 = circular
    blade_vertex_pos: jnp.ndarray  # (2,) f32 unit-polygon vertex
    aperture_base_angle: jnp.ndarray  # () f32 radians

    @staticmethod
    def create(transform=None, film_size=(0.05333, 0.03), aperture_radius=0.0,
               focal_distance=2.0, film_distance=None, focal_length=0.05,
               fov_x=None, blade_count=0, aperture_rotation=0.0):
        """Build camera params with the reference's defaults
        (Source/Scene.cpp:631-641, CalculateFilmDistance :837-842)."""
        if transform is None:
            transform = np.eye(4, dtype=np.float32)
        if film_distance is None:
            if fov_x is not None:
                film_distance = 0.5 * film_size[0] / max(
                    np.tan(0.5 * fov_x), 1e-4)
            else:
                film_distance = (focal_length * focal_distance) / (
                    focal_length + focal_distance)
        blade_angle = np.pi / max(int(blade_count), 1)
        # Unit-circle polygon vertex used to sample one blade triangle
        blade_vertex = (np.cos(blade_angle), np.sin(blade_angle))
        return CameraParams(
            transform=jnp.asarray(transform, jnp.float32),
            film_size=jnp.asarray(film_size, jnp.float32),
            aperture_radius=jnp.asarray(aperture_radius, jnp.float32),
            focal_distance=jnp.asarray(focal_distance, jnp.float32),
            film_distance=jnp.asarray(film_distance, jnp.float32),
            blade_count=jnp.asarray(int(blade_count), jnp.int32),
            blade_vertex_pos=jnp.asarray(blade_vertex, jnp.float32),
            aperture_base_angle=jnp.asarray(aperture_rotation, jnp.float32),
        )


def transform_point(p, m):
    """[p, 1] @ m for (..., 3) points and (..., 4, 3) matrices.

    Handles batched matrices: p (..., 3) with m (..., 4, 3) transforms each
    point by its own matrix (row-vector convention).
    """
    import jax.numpy as _jnp
    return _jnp.squeeze(p[..., None, :] @ m[..., :3, :], -2) + m[..., 3, :]


def transform_vector(v, m):
    import jax.numpy as _jnp
    return _jnp.squeeze(v[..., None, :] @ m[..., :3, :], -2)


def transform_point44(p, m):
    """Row-vector transform by a (4, 4) matrix, returning xyz."""
    return p @ m[:3, :3] + m[3, :3]


def transform_vector44(v, m):
    return v @ m[:3, :3]


def invert_rigid_affine43(m):
    """Invert a (4, 3) row-vector affine transform (numpy, host side)."""
    m = np.asarray(m, np.float64)
    a = m[:3, :]          # 3x3 linear part (row-vector convention)
    inv_a = np.linalg.inv(a)
    t = -m[3, :] @ inv_a
    out = np.zeros((4, 3), np.float32)
    out[:3, :] = inv_a.astype(np.float32)
    out[3, :] = t.astype(np.float32)
    return out

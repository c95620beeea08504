"""Host-side scene model and flattening to device SoA arrays.

The TPU analogue of `CScene::LoadFromFile`'s buffer assembly (reference:
Source/Scene.cpp:103-624): concatenate mesh vertex/index data, build one
BLAS per mesh (reordering triangles + material ids into leaf order,
reference: Source/Mesh.cpp:59-79), build the TLAS over instance world
AABBs, pack materials and lights, and emit a single `SceneArrays` pytree
plus static metadata (traversal stack bound, light count, env light index)
that parameterize kernel compilation — the analogue of the reference's
scene-dependent shader `#define`s (MegakernelPathTracer.cpp:270-337).
"""

import os
from dataclasses import dataclass, field
from typing import List, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..accel.build import build_bvh, build_two_level
from ..core.constants import (
    INSTANCE_FLAG_OPAQUE,
    INSTANCE_MATERIAL_OVERRIDE_NONE,
    LIGHT_FLAGS_DIRECTIONAL,
    LIGHT_FLAGS_ENVIRONMENT,
    LIGHT_FLAGS_MESH,
    LIGHT_FLAGS_POINT,
    LIGHT_INDEX_INVALID,
    MATERIAL_FLAG_IS_TWOSIDED,
    MATERIAL_FLAG_MULTISCATTERING,
    MATERIAL_FLAG_INTERNAL_SCATTERING_SHIFT,
    MATERIAL_TYPE_DIFFUSE,
    INTERNAL_SCATTERING_MODE_IGNORE,
)
from ..core.types import SceneArrays, invert_rigid_affine43


@dataclass
class Mesh:
    positions: np.ndarray             # (V, 3) f32
    indices: np.ndarray               # (T, 3) int
    normals: Optional[np.ndarray] = None    # (V, 3)
    tangents: Optional[np.ndarray] = None   # (V, 3)
    texcoords: Optional[np.ndarray] = None  # (V, 2)
    material_ids: Optional[np.ndarray] = None  # (T,) int
    name: str = ""

    def __post_init__(self):
        self.positions = np.asarray(self.positions, np.float32)
        self.indices = np.asarray(self.indices, np.int64).reshape(-1, 3)
        v = self.positions.shape[0]
        t = self.indices.shape[0]
        if self.normals is None:
            self.normals = compute_vertex_normals(self.positions, self.indices)
        if self.tangents is None:
            self.tangents = np.zeros((v, 3), np.float32)
        if self.texcoords is None:
            self.texcoords = np.zeros((v, 2), np.float32)
        if self.material_ids is None:
            self.material_ids = np.zeros(t, np.int64)
        self.normals = np.asarray(self.normals, np.float32)
        self.tangents = np.asarray(self.tangents, np.float32)
        self.texcoords = np.asarray(self.texcoords, np.float32)
        self.material_ids = np.asarray(self.material_ids, np.int64)


@dataclass
class Material:
    albedo: tuple = (0.8, 0.8, 0.8)
    mtype: int = MATERIAL_TYPE_DIFFUSE
    ior: tuple = (1.5, 1.5, 1.5)      # conductor: eta; k goes in `k`
    k: Optional[tuple] = None          # conductor absorption (stored in albedo)
    roughness: float = 1.0
    tiling: tuple = (1.0, 1.0)
    opacity: float = 1.0
    two_sided: bool = False
    multiscattering: bool = False
    internal_scattering: int = INTERNAL_SCATTERING_MODE_IGNORE
    albedo_texture: int = -1
    opacity_texture: int = -1
    roughness_texture: bool = False
    name: str = ""

    def flags(self) -> int:
        from ..core.constants import (
            MATERIAL_FLAG_ALBEDO_TEXTURE,
            MATERIAL_FLAG_ROUGHNESS_TEXTURE,
        )
        f = int(self.mtype) & 0xF
        if self.albedo_texture >= 0:
            f |= MATERIAL_FLAG_ALBEDO_TEXTURE
        if self.roughness_texture:
            f |= MATERIAL_FLAG_ROUGHNESS_TEXTURE
        if self.two_sided:
            f |= MATERIAL_FLAG_IS_TWOSIDED
        if self.multiscattering:
            f |= MATERIAL_FLAG_MULTISCATTERING
        f |= (int(self.internal_scattering) & 0x3) << \
            MATERIAL_FLAG_INTERNAL_SCATTERING_SHIFT
        return f


@dataclass
class Instance:
    mesh: int
    transform: np.ndarray = None       # (4, 3) row-vector local->world
    material_override: int = -1
    is_emitter: bool = False
    radiance: tuple = (0.0, 0.0, 0.0)  # if emitter (area light)
    name: str = ""

    def __post_init__(self):
        if self.transform is None:
            self.transform = np.concatenate(
                [np.eye(3, dtype=np.float32), np.zeros((1, 3), np.float32)])
        self.transform = np.asarray(self.transform, np.float32).reshape(4, 3)


@dataclass
class PunctualLight:
    """Point, directional or constant/IBL environment light."""
    kind: str                          # 'point' | 'directional' | 'env'
    radiance: tuple = (1.0, 1.0, 1.0)
    position: tuple = (0.0, 0.0, 0.0)  # point: position; directional: dir


@dataclass
class Scene:
    meshes: List[Mesh] = field(default_factory=list)
    instances: List[Instance] = field(default_factory=list)
    materials: List[Material] = field(default_factory=list)
    lights: List[PunctualLight] = field(default_factory=list)
    # (H, W, 3) lat-long or (6, S, S, 3) D3D-order cubemap radiance
    env_texture: Optional[np.ndarray] = None
    textures: List[np.ndarray] = field(default_factory=list)  # (h,w,4) each


class SceneMeta(NamedTuple):
    """Static compile-time scene facts (analogue of shader #defines)."""
    stack_size: int
    light_count: int
    env_light_index: int   # LIGHT_INDEX_INVALID if none
    has_env_texture: bool
    any_non_opaque: bool
    any_opacity_texture: bool


def compute_vertex_normals(positions, indices):
    """Area-weighted vertex normals. Reference winding is clockwise-front
    (LHS): geometry normal = cross(v0v2, v0v1) (HitShader.inc.hlsl:53-55)."""
    normals = np.zeros_like(positions)
    v0 = positions[indices[:, 0]]
    v1 = positions[indices[:, 1]]
    v2 = positions[indices[:, 2]]
    fn = np.cross(v2 - v0, v1 - v0)
    for k in range(3):
        np.add.at(normals, indices[:, k], fn)
    lens = np.linalg.norm(normals, axis=1, keepdims=True)
    return (normals / np.maximum(lens, 1e-20)).astype(np.float32)


def triangle_bounds(positions, indices):
    v = positions[indices]          # (T, 3, 3)
    return v.min(axis=1), v.max(axis=1)


def flatten_scene(scene: Scene):
    """Compile the host scene into (SceneArrays, SceneMeta)."""
    assert scene.meshes and scene.instances, "scene needs geometry"
    if not scene.materials:
        scene.materials = [Material()]

    # --- per-mesh BLAS, triangles reordered into leaf order
    blas_list = []
    mesh_tris = []
    mesh_matids = []
    vtx_offset = 0
    vtx_pos, vtx_nrm, vtx_tan, vtx_uv = [], [], [], []
    mesh_tri_offsets = np.zeros(len(scene.meshes), np.int64)
    tri_cursor = 0
    for m, mesh in enumerate(scene.meshes):
        bmin, bmax = triangle_bounds(mesh.positions, mesh.indices)
        blas = build_bvh(bmin, bmax, max_prims_in_node=2)
        blas_list.append(blas)
        tris = mesh.indices[blas.prim_order] + vtx_offset
        mats = mesh.material_ids[blas.prim_order]
        mesh_tris.append(tris)
        mesh_matids.append(mats)
        mesh_tri_offsets[m] = tri_cursor
        tri_cursor += tris.shape[0]
        vtx_offset += mesh.positions.shape[0]
        vtx_pos.append(mesh.positions)
        vtx_nrm.append(mesh.normals)
        vtx_tan.append(mesh.tangents)
        vtx_uv.append(mesh.texcoords)

    triangles = np.concatenate(mesh_tris).astype(np.uint32)
    material_ids = np.concatenate(mesh_matids).astype(np.uint32)

    # --- instances & TLAS
    inst_mesh = [inst.mesh for inst in scene.instances]
    inst_tf = np.stack([inst.transform for inst in scene.instances])
    two_level, _ = build_two_level(
        blas_list, mesh_tri_offsets, inst_mesh, inst_tf)
    inst_inv = np.stack([invert_rigid_affine43(t) for t in inst_tf])

    # --- lights: punctual lights first, then one mesh light per emissive
    # instance, then env (reference order: Scene.cpp:467-499 + XML loader)
    lr, lp, lto, ltc, li, lf = [], [], [], [], [], []
    inst_light = np.full(len(scene.instances), LIGHT_INDEX_INVALID, np.uint32)
    env_light_index = LIGHT_INDEX_INVALID
    for l in scene.lights:
        if l.kind == "point":
            flags = LIGHT_FLAGS_POINT
        elif l.kind == "directional":
            flags = LIGHT_FLAGS_DIRECTIONAL
        elif l.kind == "env":
            flags = LIGHT_FLAGS_ENVIRONMENT
            env_light_index = len(lf)
        else:
            raise ValueError(l.kind)
        lr.append(l.radiance)
        lp.append(l.position)
        lto.append(0)
        ltc.append(0)
        li.append(0)
        lf.append(flags)
    for i, inst in enumerate(scene.instances):
        if inst.is_emitter:
            m = inst.mesh
            inst_light[i] = len(lf)
            lr.append(inst.radiance)
            lp.append((0.0, 0.0, 0.0))
            lto.append(int(mesh_tri_offsets[m]))
            ltc.append(int(scene.meshes[m].indices.shape[0]))
            li.append(i)
            lf.append(LIGHT_FLAGS_MESH)

    n_lights = max(len(lf), 1)
    light_radiance = np.zeros((n_lights, 3), np.float32)
    light_position = np.zeros((n_lights, 3), np.float32)
    light_tri_offset = np.zeros(n_lights, np.uint32)
    light_tri_count = np.ones(n_lights, np.uint32)
    light_instance = np.zeros(n_lights, np.uint32)
    light_flags = np.zeros(n_lights, np.uint32)
    if lf:
        light_radiance[: len(lf)] = np.asarray(lr, np.float32)
        light_position[: len(lf)] = np.asarray(lp, np.float32)
        light_tri_offset[: len(lf)] = np.asarray(lto, np.uint32)
        light_tri_count[: len(lf)] = np.maximum(np.asarray(ltc, np.uint32), 1)
        light_instance[: len(lf)] = np.asarray(li, np.uint32)
        light_flags[: len(lf)] = np.asarray(lf, np.uint32)

    # --- materials SoA
    M = len(scene.materials)
    mat_albedo = np.zeros((M, 3), np.float32)
    mat_ior = np.ones((M, 3), np.float32)
    mat_rough = np.zeros(M, np.float32)
    mat_tiling = np.ones((M, 2), np.float32)
    mat_opacity = np.ones(M, np.float32)
    mat_flags = np.zeros(M, np.uint32)
    mat_atex = np.full(M, -1, np.int32)
    mat_otex = np.full(M, -1, np.int32)
    any_non_opaque = False
    for j, mat in enumerate(scene.materials):
        mat_albedo[j] = mat.k if mat.k is not None else mat.albedo
        mat_ior[j] = mat.ior
        mat_rough[j] = mat.roughness
        mat_tiling[j] = mat.tiling
        mat_opacity[j] = mat.opacity
        mat_flags[j] = mat.flags()
        mat_atex[j] = mat.albedo_texture
        mat_otex[j] = mat.opacity_texture
        if mat.opacity < 1.0 or mat.opacity_texture >= 0:
            any_non_opaque = True

    inst_flags = np.full(len(scene.instances), INSTANCE_FLAG_OPAQUE,
                         np.uint32)
    for i, inst in enumerate(scene.instances):
        ov = inst.material_override
        if 0 <= ov < M:
            mo = scene.materials[ov]
            if mo.opacity < 1.0 or mo.opacity_texture >= 0:
                inst_flags[i] = 0
        else:
            mids = np.unique(material_ids[
                mesh_tri_offsets[inst.mesh]:
                mesh_tri_offsets[inst.mesh]
                + scene.meshes[inst.mesh].indices.shape[0]])
            if any(scene.materials[int(mi)].opacity < 1.0
                   or scene.materials[int(mi)].opacity_texture >= 0
                   for mi in mids):
                inst_flags[i] = 0
    inst_overrides = np.asarray(
        [inst.material_override if inst.material_override >= 0
         else INSTANCE_MATERIAL_OVERRIDE_NONE
         for inst in scene.instances], np.uint32)

    # --- texture atlas (stacked layers padded to common size)
    if scene.textures:
        th = max(t.shape[0] for t in scene.textures)
        tw = max(t.shape[1] for t in scene.textures)
        atlas = np.zeros((len(scene.textures), th, tw, 4), np.float32)
        sizes = np.zeros((len(scene.textures), 2), np.int32)
        for k, t in enumerate(scene.textures):
            atlas[k, : t.shape[0], : t.shape[1]] = t
            sizes[k] = (t.shape[0], t.shape[1])
    else:
        atlas = np.zeros((1, 1, 1, 4), np.float32)
        sizes = np.ones((1, 2), np.int32)

    env = (scene.env_texture if scene.env_texture is not None
           else np.ones((1, 1, 3), np.float32))

    # --- packed per-step fetch tables + small-scene world-space soup
    all_pos = np.concatenate(vtx_pos)
    # The packed table stores the u32 node fields as f32, which is exact
    # only below 2^24; traversal always reads the packed table, so larger
    # payloads (right_or_prim holds child/leaf indices; TLAS-leaf misc is
    # (instance<<3)|flags) would silently round and mis-traverse.
    if (two_level.right_or_prim.max(initial=0) >= (1 << 24)
            or two_level.misc.max(initial=0) >= (1 << 24)):
        raise ValueError(
            "scene too large for the packed f32 node table: a node index "
            "field exceeds 2^24 (>=2^21 instances or >=16.7M leaf-ordered "
            "triangles); split the scene or file an issue for the "
            "split-array traversal fallback")
    node_table = np.concatenate(
        [two_level.bbox_min, two_level.bbox_max,
         two_level.right_or_prim.astype(np.float32)[:, None],
         two_level.misc.astype(np.float32)[:, None]], axis=1)
    tri_verts = all_pos[triangles.astype(np.int64)].reshape(-1, 9)

    total_world_tris = sum(
        scene.meshes[i.mesh].indices.shape[0] for i in scene.instances)
    # the clustered kernels stream triangle slabs from HBM, so the only
    # cost of world-space expansion is host memory (48 B/triangle)
    if total_world_tris <= 1 << 20:
        wt, wm = [], []
        for ii, inst in enumerate(scene.instances):
            m = inst.mesh
            lo = int(mesh_tri_offsets[m])
            hi = lo + scene.meshes[m].indices.shape[0]
            v = tri_verts[lo:hi].reshape(-1, 3, 3)
            a = inst.transform[:3]
            t = inst.transform[3]
            v = v @ a + t
            wt.append(v.reshape(-1, 9).astype(np.float32))
            flip = 1.0 if np.linalg.det(a.astype(np.float64)) < 0 else 0.0
            meta = np.empty((hi - lo, 3), np.float32)
            meta[:, 0] = np.arange(lo, hi, dtype=np.float32)
            meta[:, 1] = ii
            meta[:, 2] = flip
            wm.append(meta)
        world_tris = np.concatenate(wt)
        world_tri_meta = np.concatenate(wm)
    else:
        world_tris = np.zeros((1, 9), np.float32)
        world_tri_meta = np.zeros((1, 3), np.float32)

    # clustered layout for the cull-and-sweep kernel: worth its indirection
    # once the flat sweep would visit thousands of triangles per ray
    # packed shading tables (see core.types)
    all_nrm = np.concatenate(vtx_nrm)
    all_tan = np.concatenate(vtx_tan)
    all_uv = np.concatenate(vtx_uv)
    vtx_table = np.concatenate(
        [all_pos, all_nrm, all_tan, all_uv,
         np.zeros((all_pos.shape[0], 1), np.float32)], axis=1)
    mat_table = np.concatenate(
        [mat_albedo, mat_ior, mat_rough[:, None], mat_tiling,
         mat_opacity[:, None], mat_flags.astype(np.float32)[:, None],
         mat_atex.astype(np.float32)[:, None],
         mat_otex.astype(np.float32)[:, None],
         np.zeros((M, 3), np.float32)], axis=1)

    # per-triangle opacity tables for alpha-tested traversal
    tri_opacity = mat_opacity[material_ids.astype(np.int64)].astype(
        np.float32)
    if world_tris.shape[0] > 1:
        wto = []
        for ii, inst in enumerate(scene.instances):
            m = inst.mesh
            lo = int(mesh_tri_offsets[m])
            n_t = scene.meshes[m].indices.shape[0]
            if inst_flags[ii] & INSTANCE_FLAG_OPAQUE:
                wto.append(np.ones(n_t, np.float32))
            elif 0 <= inst.material_override < M:
                wto.append(np.full(n_t,
                                   mat_opacity[inst.material_override],
                                   np.float32))
            else:
                wto.append(tri_opacity[lo: lo + n_t])
        world_tri_opacity = np.concatenate(wto)
    else:
        world_tri_opacity = np.ones(1, np.float32)

    if 2048 < world_tris.shape[0]:
        from ..accel.cluster import (
            CLUSTER_SIZE, baldwin_table, build_clusters,
        )

        cluster_tris, cluster_bbox = build_clusters(world_tris,
                                                    world_tri_meta)
        cluster_bw = baldwin_table(cluster_tris)
    else:
        from ..accel.cluster import CLUSTER_SIZE

        cluster_tris = np.zeros((CLUSTER_SIZE, 13), np.float32)
        cluster_bbox = np.zeros((1, 8), np.float32)
        cluster_bw = np.zeros((CLUSTER_SIZE, 16), np.float32)

    # --- opaque/masked cluster split for alpha-tested traversal: the
    # opaque subset runs the plain kernels (no recast loop), only the
    # maybe-transparent subset pays alpha recasting (the reference's
    # AnyHitShader runs only on non-opaque geometry,
    # Shaders/BVHAccel.inc.hlsl:182-190 + per-instance OPAQUE flags)
    oclu_tris = np.zeros((CLUSTER_SIZE, 13), np.float32)
    oclu_bw = np.zeros((CLUSTER_SIZE, 16), np.float32)
    oclu_bbox = np.zeros((1, 8), np.float32)
    mclu_tris = np.zeros((CLUSTER_SIZE, 13), np.float32)
    mclu_bw = np.zeros((CLUSTER_SIZE, 16), np.float32)
    mclu_bbox = np.zeros((1, 8), np.float32)
    if any_non_opaque and cluster_bbox.shape[0] > 1:
        from ..accel.cluster import baldwin_table, build_clusters

        prim = world_tri_meta[:, 0].astype(np.int64)
        iid = world_tri_meta[:, 1].astype(np.int64)
        ov = np.asarray([inst.material_override
                         for inst in scene.instances], np.int64)[iid]
        eff = material_ids[prim].astype(np.int64)
        eff = np.where((ov >= 0) & (ov < M), ov, eff)
        opq = (inst_flags[iid] & INSTANCE_FLAG_OPAQUE) != 0
        maybe = ~opq & ((world_tri_opacity < 1.0)
                        | (mat_otex[eff] >= 0))
        if maybe.any() and (~maybe).any():
            oclu_tris, oclu_bbox = build_clusters(
                world_tris[~maybe], world_tri_meta[~maybe])
            oclu_bw = baldwin_table(oclu_tris)
            mclu_tris, mclu_bbox = build_clusters(
                world_tris[maybe], world_tri_meta[maybe])
            mclu_bw = baldwin_table(mclu_tris)

    # --- instanced work-list tables: BLAS sharing for scenes too big
    # (or too instanced) for the world-space soup. Triangles stay
    # mesh-local and shared; per-(instance, super) world boxes drive
    # the cull; the sweep transforms rays per item (reference:
    # TLAS->BLAS re-transform, Shaders/BVHAccel.inc.hlsl:127-140).
    from ..accel.cluster import SUPER_SIZE

    use_instanced = (total_world_tris > (1 << 20)
                     or os.environ.get("DCRT_INSTANCED") == "1") \
        and triangles.shape[0] > 64
    inst_det = np.asarray(
        [np.linalg.det(t[:3].astype(np.float64)) for t in inst_tf])
    inst_rows = np.concatenate(
        [inst_inv[:, :3].reshape(-1, 9), inst_inv[:, 3],
         (inst_det < 0).astype(np.float32)[:, None],
         np.zeros((len(scene.instances), 3), np.float32)],
        axis=1).astype(np.float32)
    if use_instanced:
        from ..accel.cluster import (
            baldwin_table, build_instanced_supers, build_local_clusters,
        )

        mesh_counts = [m.indices.shape[0] for m in scene.meshes]
        icl_slab, lbox, mso, msc = build_local_clusters(
            tri_verts, mesh_tri_offsets, mesh_counts)
        icl_bw = baldwin_table(icl_slab)
        isup_cbox, isup_sbox, isup_local, isup_inst = \
            build_instanced_supers(lbox, mso, msc, inst_mesh, inst_tf)
    else:
        icl_slab = np.zeros((CLUSTER_SIZE, 13), np.float32)
        icl_bw = np.zeros((CLUSTER_SIZE, 16), np.float32)
        isup_cbox = np.zeros((1, SUPER_SIZE, 8), np.float32)
        isup_sbox = np.zeros((1, 8), np.float32)
        isup_local = np.zeros(1, np.int32)
        isup_inst = np.zeros(1, np.int32)

    arrays = SceneArrays(
        vtx_position=jnp.asarray(all_pos),
        vtx_normal=jnp.asarray(all_nrm),
        vtx_tangent=jnp.asarray(all_tan),
        vtx_texcoord=jnp.asarray(all_uv),
        triangles=jnp.asarray(triangles),
        node_bbox_min=jnp.asarray(two_level.bbox_min),
        node_bbox_max=jnp.asarray(two_level.bbox_max),
        node_right_or_prim=jnp.asarray(two_level.right_or_prim),
        node_misc=jnp.asarray(two_level.misc),
        node_table=jnp.asarray(node_table),
        tri_verts=jnp.asarray(tri_verts),
        world_tris=jnp.asarray(world_tris),
        world_tri_meta=jnp.asarray(world_tri_meta),
        cluster_tris=jnp.asarray(cluster_tris),
        cluster_bw=jnp.asarray(cluster_bw),
        cluster_bbox=jnp.asarray(cluster_bbox),
        vtx_table=jnp.asarray(vtx_table),
        mat_table=jnp.asarray(mat_table),
        tri_opacity=jnp.asarray(tri_opacity),
        world_tri_opacity=jnp.asarray(world_tri_opacity),
        instance_transforms=jnp.asarray(inst_tf),
        instance_inv_transforms=jnp.asarray(inst_inv),
        instance_flags=jnp.asarray(inst_flags),
        instance_material_overrides=jnp.asarray(inst_overrides),
        instance_light_indices=jnp.asarray(inst_light),
        material_ids=jnp.asarray(material_ids),
        mat_albedo=jnp.asarray(mat_albedo),
        mat_ior=jnp.asarray(mat_ior),
        mat_roughness=jnp.asarray(mat_rough),
        mat_tiling=jnp.asarray(mat_tiling),
        mat_opacity=jnp.asarray(mat_opacity),
        mat_flags=jnp.asarray(mat_flags),
        mat_albedo_tex=jnp.asarray(mat_atex),
        mat_opacity_tex=jnp.asarray(mat_otex),
        light_radiance=jnp.asarray(light_radiance),
        light_position=jnp.asarray(light_position),
        light_tri_offset=jnp.asarray(light_tri_offset),
        light_tri_count=jnp.asarray(light_tri_count),
        light_instance=jnp.asarray(light_instance),
        light_flags=jnp.asarray(light_flags),
        oclu_tris=jnp.asarray(oclu_tris),
        oclu_bw=jnp.asarray(oclu_bw),
        oclu_bbox=jnp.asarray(oclu_bbox),
        mclu_tris=jnp.asarray(mclu_tris),
        mclu_bw=jnp.asarray(mclu_bw),
        mclu_bbox=jnp.asarray(mclu_bbox),
        textures=jnp.asarray(atlas),
        texture_sizes=jnp.asarray(sizes),
        env_texture=jnp.asarray(env, jnp.float32),
        icl_slab=jnp.asarray(icl_slab),
        icl_bw=jnp.asarray(icl_bw),
        isup_cbox=jnp.asarray(isup_cbox),
        isup_sbox=jnp.asarray(isup_sbox),
        isup_local=jnp.asarray(isup_local),
        isup_inst=jnp.asarray(isup_inst),
        inst_rows=jnp.asarray(inst_rows),
    )
    from ..utils.log import logger

    logger.info(
        "scene flattened: %d meshes, %d instances, %d triangles, "
        "%d BVH nodes (stack bound %d), %d materials, %d lights, "
        "%d world tris, %d clusters",
        len(scene.meshes), len(scene.instances), triangles.shape[0],
        two_level.bbox_min.shape[0], int(two_level.max_stack),
        M, len(lf), world_tris.shape[0], cluster_bbox.shape[0])

    meta = SceneMeta(
        stack_size=int(two_level.max_stack),
        light_count=len(lf),
        env_light_index=int(env_light_index),
        has_env_texture=scene.env_texture is not None,
        any_non_opaque=any_non_opaque,
        any_opacity_texture=bool((mat_otex >= 0).any()),
    )
    return arrays, meta

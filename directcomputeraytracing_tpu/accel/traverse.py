"""Vectorized two-level BVH traversal + dense brute-force intersector.

Re-design of the reference's stack-based GPU traversal
(reference: Shaders/BVHAccel.inc.hlsl:85-369 — per-thread groupshared
stack, TLAS->BLAS ray re-transform, front-to-back child ordering by split
axis and ray-direction sign, <=2-triangle leaf loop, world-ray restore on
BLAS->TLAS pop) for the TPU vector model: the whole ray batch advances in
lock-step inside one `lax.while_loop`, every ray carries its own short
stack as a row of an (R, S) array, and all branching is `jnp.where`
selection.

TPU memory-access design (measured on v5e, experiments/prof_traverse2.py):
  * a row gather costs ~3 ms per 2^20 rays regardless of table size, so
    the per-step node fetch is ONE gather from a packed (N, 8) table
    instead of four; small tables (N<=512) switch to a one-hot matmul
    fetch that rides the MXU at ~2.5x the gather rate;
  * `take_along_axis` stack pops cost 17 ms/step — replaced by a one-hot
    compare+reduce (~1 ms);
  * triangle fetches come from a pre-flattened leaf-ordered (T, 9)
    vertex table: one gather per leaf slot instead of four.

For small scenes (<= a few thousand instanced triangles) the BVH loses to
`intersect_brute`: a dense ray x triangle-slab sweep over pre-transformed
world-space triangles — pure VPU math with zero gathers. `backend="auto"`
picks it whenever the flattened scene provides the world-triangle soup.

Both entry points are shape-static and jit-friendly:
  intersect_closest — closest-hit query returning full hit info + per-ray
                      iteration counters (the reference's AOV heatmap).
  intersect_any     — boolean occlusion query with early termination.
"""

import functools

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.constants import (
    BVHNODE_MISC_COUNT_SHIFT,
    BVHNODE_MISC_HAS_BLAS,
    BVHNODE_MISC_SPLIT_AXIS_MASK,
)
from ..core.types import transform_point, transform_vector

F32 = jnp.float32
U32 = jnp.uint32
I32 = jnp.int32

_STACK_BLAS_BIT = U32(0x80000000)
_STACK_INDEX_MASK = U32(0x7FFFFFFF)

ONEHOT_NODE_LIMIT = 512    # one-hot fetch beats row gather below this
ONEHOT_INST_LIMIT = 64
BRUTE_TRI_SLAB = 128       # triangles per dense sweep step


class HitInfo(NamedTuple):
    t: jnp.ndarray          # (R,) f32, inf on miss
    u: jnp.ndarray          # (R,) f32 barycentric
    v: jnp.ndarray          # (R,) f32
    triangle: jnp.ndarray   # (R,) i32 global triangle id
    instance: jnp.ndarray   # (R,) i32
    backface: jnp.ndarray   # (R,) bool
    hit: jnp.ndarray        # (R,) bool
    iterations: jnp.ndarray  # (R,) i32 traversal loop count


def ray_triangle_moeller(o, d, t_min, t_max, v0, v1, v2):
    """Batched Moeller-Trumbore (reference: RayPrimitiveIntersect.inc.hlsl:72-103).

    Returns (t, u, v, backface, hit_mask).
    """
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    det_ok = jnp.abs(det) >= 1e-10
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    backface = det > -1e-10
    hit = (det_ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
           & (t >= t_min) & (t < t_max))
    return t, u, v, backface, hit


def ray_triangle_watertight(o, d, t_min, t_max, v0, v1, v2):
    """Batched watertight ray-triangle test (PBRT permute+shear;
    reference: RayPrimitiveIntersect.inc.hlsl:7-70 under
    WATERTIGHT_RAY_TRIANGLE_INTERSECTION, permute/shear from
    BVHAccel.inc.hlsl:72-83). Returns (t, u, v, backface, hit_mask)."""
    ad = jnp.abs(d)
    kz = jnp.argmax(ad, axis=-1)
    kx = jnp.where(kz == 2, 0, kz + 1)
    ky = jnp.where(kx == 2, 0, kx + 1)

    def pc(vec, k):
        return jnp.where(k == 0, vec[..., 0],
                         jnp.where(k == 1, vec[..., 1], vec[..., 2]))

    d_z = pc(d, kz)
    inv_z = 1.0 / jnp.where(jnp.abs(d_z) < 1e-30, 1e-30, d_z)
    sx = -pc(d, kx) * inv_z
    sy = -pc(d, ky) * inv_z
    sz = inv_z

    def shear(vtx):
        p = vtx - o
        pz = pc(p, kz)
        return (pc(p, kx) + sx * pz, pc(p, ky) + sy * pz, pz)

    p0x, p0y, p0z = shear(v0)
    p1x, p1y, p1z = shear(v1)
    p2x, p2y, p2z = shear(v2)
    e0 = p1x * p2y - p2x * p1y
    e1 = p2x * p0y - p0x * p2y
    e2 = p0x * p1y - p1x * p0y
    mixed = (((e0 < 0.0) | (e1 < 0.0) | (e2 < 0.0))
             & ((e0 > 0.0) | (e1 > 0.0) | (e2 > 0.0)))
    det = e0 + e1 + e2
    det_ok = det != 0.0
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
    t = (e0 * p0z + e1 * p1z + e2 * p2z) * sz * inv_det
    u = e1 * inv_det
    v = e2 * inv_det
    backface = jnp.sign(sz) * det < 0.0
    c = jnp.cross(v1 - v0, v2 - v0)
    degenerate = jnp.sum(c * c, axis=-1) == 0.0
    hit = (~mixed & det_ok & ~degenerate
           & (t >= t_min) & (t < t_max))
    return t, u, v, backface, hit


def ray_aabb(o, inv_d, t_min, t_max, bmin, bmax):
    """Batched slab test (reference: RayPrimitiveIntersect.inc.hlsl:106-133)."""
    ta = (bmin - o) * inv_d
    tb = (bmax - o) * inv_d
    t0 = jnp.max(jnp.minimum(ta, tb), axis=-1)
    t1 = jnp.min(jnp.maximum(ta, tb), axis=-1)
    return (t1 >= t0) & (t0 < t_max) & (t1 >= t_min)


def _safe_inv(d):
    """1/d with exact zeros nudged so 0 * inv stays finite (no 0*inf NaNs)."""
    tiny = jnp.where(d >= 0.0, F32(1e-30), F32(-1e-30))
    return 1.0 / jnp.where(jnp.abs(d) < 1e-30, tiny, d)


def _fetch_rows(table, idx):
    """One fetch of table rows by (R,) index: one-hot matmul for small
    tables (MXU), row gather otherwise."""
    n = table.shape[0]
    if n <= ONEHOT_NODE_LIMIT:
        oh = (idx[:, None] == jnp.arange(n, dtype=idx.dtype)[None, :])
        return oh.astype(F32) @ table
    return table[idx]


def _axis_component(vec, axis):
    """vec (R,3), axis (R,) in {0,1,2} -> (R,) via select (no gather)."""
    return jnp.where(axis == 0, vec[:, 0],
                     jnp.where(axis == 1, vec[:, 1], vec[:, 2]))


def _traverse(scene, origin, direction, t_min, t_max_init, stack_size,
              any_hit, watertight=False, opacity_u=None,
              alpha_textures=False):
    tri_test = (ray_triangle_watertight if watertight
                else ray_triangle_moeller)
    alpha_test = opacity_u is not None
    R = origin.shape[0]
    n_nodes = scene.node_table.shape[0]
    n_inst = scene.instance_inv_transforms.shape[0]
    inv_flat = scene.instance_inv_transforms.reshape(n_inst, 12)

    def sel(mask, new, old):
        if new.ndim > mask.ndim:
            mask = mask.reshape(mask.shape + (1,) * (new.ndim - mask.ndim))
        return jnp.where(mask, new, old)

    lane = jnp.arange(stack_size, dtype=I32)[None, :]  # (1, S)

    class S(NamedTuple):
        node: jnp.ndarray       # (R,) i32
        is_blas: jnp.ndarray    # (R,) bool
        instance: jnp.ndarray   # (R,) i32
        stack: jnp.ndarray      # (R, S) u32
        stack_n: jnp.ndarray    # (R,) i32
        lo: jnp.ndarray         # (R, 3) local origin
        ld: jnp.ndarray         # (R, 3) local direction
        t_max: jnp.ndarray      # (R,)
        hit_t: jnp.ndarray
        hit_u: jnp.ndarray
        hit_v: jnp.ndarray
        hit_tri: jnp.ndarray    # (R,) i32
        hit_inst: jnp.ndarray   # (R,) i32
        hit_back: jnp.ndarray   # (R,) bool
        occluded: jnp.ndarray   # (R,) bool (any-hit mode)
        done: jnp.ndarray       # (R,) bool
        iters: jnp.ndarray      # (R,) i32

    init = S(
        node=jnp.zeros(R, I32),
        is_blas=jnp.zeros(R, bool),
        instance=jnp.zeros(R, I32),
        stack=jnp.zeros((R, stack_size), U32),
        stack_n=jnp.zeros(R, I32),
        lo=origin,
        ld=direction,
        t_max=jnp.broadcast_to(jnp.asarray(t_max_init, F32), (R,)),
        hit_t=jnp.full(R, jnp.inf, F32),
        hit_u=jnp.zeros(R, F32),
        hit_v=jnp.zeros(R, F32),
        hit_tri=jnp.zeros(R, I32),
        hit_inst=jnp.zeros(R, I32),
        hit_back=jnp.zeros(R, bool),
        occluded=jnp.zeros(R, bool),
        done=jnp.zeros(R, bool),
        iters=jnp.zeros(R, I32),
    )

    def cond(s):
        return ~jnp.all(s.done)

    def body(s):
        active = ~s.done
        node = jnp.clip(s.node, 0, n_nodes - 1)
        row = _fetch_rows(scene.node_table, node)       # (R, 8)
        bmin = row[:, 0:3]
        bmax = row[:, 3:6]
        rop = row[:, 6].astype(I32)
        misc = row[:, 7].astype(U32)

        inv_d = _safe_inv(s.ld)
        box_hit = ray_aabb(s.lo, inv_d, t_min, s.t_max, bmin, bmax) & active

        has_blas = (misc & U32(BVHNODE_MISC_HAS_BLAS)) != 0
        cnt = (misc >> BVHNODE_MISC_COUNT_SHIFT).astype(I32)
        axis = (misc & U32(BVHNODE_MISC_SPLIT_AXIS_MASK)).astype(I32)

        is_enter = box_hit & has_blas
        is_interior = box_hit & ~has_blas & (cnt == 0)
        is_leaf = box_hit & ~has_blas & (cnt > 0)
        do_pop = active & ~is_enter & ~is_interior

        # --- TLAS -> BLAS transition: re-transform the ray to local space
        inst_new = sel(is_enter, cnt, s.instance)
        inv_t = _fetch_rows(inv_flat,
                            jnp.clip(inst_new, 0, n_inst - 1)
                            ).reshape(-1, 4, 3)
        lo_new = sel(is_enter, transform_point(origin, inv_t), s.lo)
        ld_new = sel(is_enter, transform_vector(direction, inv_t), s.ld)
        node_after_enter = sel(is_enter, rop, s.node)
        is_blas_new = s.is_blas | is_enter

        # --- interior: push far child, descend near child (front-to-back)
        dir_neg = _axis_component(ld_new, axis) < 0.0
        left = s.node + 1
        push_idx = jnp.where(dir_neg, left, rop)
        next_idx = jnp.where(dir_neg, rop, left)
        packed = (push_idx.astype(U32) & _STACK_INDEX_MASK) | jnp.where(
            is_blas_new, _STACK_BLAS_BIT, U32(0))
        write = is_interior[:, None] & (lane == s.stack_n[:, None])
        stack_new = jnp.where(write, packed[:, None], s.stack)
        stack_n_new = s.stack_n + is_interior.astype(I32)
        node_after_interior = sel(is_interior, next_idx, node_after_enter)

        # --- leaf: up to max-prims-per-leaf triangle tests (static unroll)
        t_max_cur = s.t_max
        hit_t, hit_u, hit_v = s.hit_t, s.hit_u, s.hit_v
        hit_tri, hit_inst, hit_back = s.hit_tri, s.hit_inst, s.hit_back
        occluded = s.occluded
        n_tris = scene.tri_verts.shape[0]
        for k in range(2):  # BLAS max_prims_in_node == 2
            prim = jnp.clip(rop + k, 0, n_tris - 1)
            tested = is_leaf & (k < cnt)
            tv = scene.tri_verts[prim]                  # (R, 9)
            t, u, v, back, ok = tri_test(
                lo_new, ld_new, t_min, t_max_cur,
                tv[:, 0:3], tv[:, 3:6], tv[:, 6:9])
            accept = tested & ok
            if alpha_test:
                opac, opaque = effective_opacity(scene, prim, inst_new,
                                                 u, v, alpha_textures)
                accept = accept & (opaque | (opacity_u < opac))
            if any_hit:
                occluded = occluded | accept
            else:
                t_max_cur = sel(accept, t, t_max_cur)
                hit_t = sel(accept, t, hit_t)
                hit_u = sel(accept, u, hit_u)
                hit_v = sel(accept, v, hit_v)
                hit_tri = sel(accept, prim, hit_tri)
                hit_inst = sel(accept, inst_new, hit_inst)
                hit_back = sel(accept, back, hit_back)

        # --- pop (misses and exhausted leaves); one-hot top read
        empty = s.stack_n == 0
        pop_ok = do_pop & ~empty
        stack_n_after = jnp.where(pop_ok, stack_n_new - 1, stack_n_new)
        top_mask = lane == jnp.maximum(stack_n_after, 0)[:, None]
        top = jnp.sum(jnp.where(top_mask, stack_new, U32(0)), axis=1)
        pop_node = (top & _STACK_INDEX_MASK).astype(I32)
        pop_is_blas = (top & _STACK_BLAS_BIT) != 0
        node_final = sel(pop_ok, pop_node, node_after_interior)
        was_blas = is_blas_new
        is_blas_final = sel(pop_ok, pop_is_blas, is_blas_new)
        # BLAS -> TLAS: restore the world-space ray
        restore = pop_ok & was_blas & ~pop_is_blas
        lo_final = sel(restore, origin, lo_new)
        ld_final = sel(restore, direction, ld_new)

        done_new = s.done | (do_pop & empty)
        if any_hit:
            done_new = done_new | occluded

        return S(
            node=node_final,
            is_blas=is_blas_final,
            instance=inst_new,
            stack=stack_new,
            stack_n=stack_n_after,
            lo=lo_final,
            ld=ld_final,
            t_max=t_max_cur,
            hit_t=hit_t, hit_u=hit_u, hit_v=hit_v,
            hit_tri=hit_tri, hit_inst=hit_inst, hit_back=hit_back,
            occluded=occluded,
            done=done_new,
            iters=s.iters + active.astype(I32),
        )

    out = jax.lax.while_loop(cond, body, init)
    return out


# ---------------------------------------------------------------------------
# Dense brute-force sweep (small scenes): no gathers at all
# ---------------------------------------------------------------------------

def _brute(scene, origin, direction, t_min, t_max_init, any_hit,
           watertight=False, opacity_u=None):
    """Sweep all world-space triangles in static slabs of BRUTE_TRI_SLAB;
    each slab is a dense (R, SLAB) ray-triangle batch on the VPU."""
    tri_test = (ray_triangle_watertight if watertight
                else ray_triangle_moeller)
    R = origin.shape[0]
    tris = scene.world_tris
    meta = scene.world_tri_meta
    B = tris.shape[0]
    n_slabs = -(-B // BRUTE_TRI_SLAB)
    pad = n_slabs * BRUTE_TRI_SLAB - B
    if pad:
        tris = jnp.pad(tris, ((0, pad), (0, 0)))        # degenerate: miss
        meta = jnp.pad(meta, ((0, pad), (0, 0)))
    opac = scene.world_tri_opacity
    if pad:
        opac = jnp.pad(opac, (0, pad))
    opac = opac.reshape(n_slabs, BRUTE_TRI_SLAB)
    tris = tris.reshape(n_slabs, BRUTE_TRI_SLAB, 9)
    meta = meta.reshape(n_slabs, BRUTE_TRI_SLAB, 3)
    valid_pad = (jnp.arange(n_slabs * BRUTE_TRI_SLAB) < B).reshape(
        n_slabs, BRUTE_TRI_SLAB)

    o = origin[:, None, :]
    d = direction[:, None, :]
    t_max0 = jnp.broadcast_to(jnp.asarray(t_max_init, F32), (R,))

    def slab(k, st):
        (hit_t, hit_u, hit_v, hit_tri, hit_inst, hit_back, occ, t_max) = st
        tv = tris[k]                                   # (SLAB, 9)
        t, u, v, back, ok = tri_test(
            o, d, t_min, t_max[:, None], tv[None, :, 0:3], tv[None, :, 3:6],
            tv[None, :, 6:9])
        ok = ok & valid_pad[k][None, :]
        if opacity_u is not None:
            ok = ok & (opacity_u[:, None] < opac[k][None, :])
        if any_hit:
            occ = occ | jnp.any(ok, axis=1)
            return (hit_t, hit_u, hit_v, hit_tri, hit_inst, hit_back, occ,
                    t_max)
        t_masked = jnp.where(ok, t, jnp.inf)
        j = jnp.argmin(t_masked, axis=1)               # first min: leaf order
        jm = (jnp.arange(BRUTE_TRI_SLAB)[None, :] == j[:, None])

        def pick(x):
            return jnp.sum(jnp.where(jm, x, 0.0), axis=1)

        t_best = jnp.sum(jnp.where(jm, t_masked, 0.0), axis=1)
        better = t_best < hit_t

        hit_t = jnp.where(better, t_best, hit_t)
        hit_u = jnp.where(better, pick(u), hit_u)
        hit_v = jnp.where(better, pick(v), hit_v)
        m = meta[k]
        hit_tri = jnp.where(better,
                            pick(jnp.broadcast_to(m[None, :, 0], t.shape)
                                 ).astype(I32), hit_tri)
        hit_inst = jnp.where(better,
                             pick(jnp.broadcast_to(m[None, :, 1], t.shape)
                                  ).astype(I32), hit_inst)
        flip = pick(jnp.broadcast_to(m[None, :, 2], t.shape)) > 0.5
        back_new = pick(back.astype(F32)) > 0.5
        hit_back = jnp.where(better, back_new ^ flip, hit_back)
        t_max = jnp.minimum(t_max, hit_t)
        return (hit_t, hit_u, hit_v, hit_tri, hit_inst, hit_back, occ, t_max)

    init = (jnp.full(R, jnp.inf, F32), jnp.zeros(R, F32), jnp.zeros(R, F32),
            jnp.zeros(R, I32), jnp.zeros(R, I32), jnp.zeros(R, bool),
            jnp.zeros(R, bool), t_max0)
    out = jax.lax.fori_loop(0, n_slabs, slab, init, unroll=min(n_slabs, 4))
    return out


def effective_opacity(scene, prim, inst, u, v, alpha_textures):
    """Alpha-test opacity of a candidate hit, and the instance opaque
    flag that bypasses the test (reference: AnyHitShader,
    HitShader.inc.hlsl:86-113 — only non-opaque instances alpha-test;
    an instance material override wins over the triangle's material;
    the opacity texture's R channel is sampled at the hit UV).

    prim: leaf-ordered global triangle index; u/v: barycentrics."""
    from ..core.constants import (
        INSTANCE_FLAG_OPAQUE,
        INSTANCE_MATERIAL_OVERRIDE_NONE,
    )
    inst_c = jnp.clip(inst.astype(I32), 0,
                      scene.instance_flags.shape[0] - 1)
    opaque = (scene.instance_flags[inst_c]
              & U32(INSTANCE_FLAG_OPAQUE)) != 0
    override = scene.instance_material_overrides[inst_c]
    has_ov = override != U32(INSTANCE_MATERIAL_OVERRIDE_NONE)
    ov_opacity = scene.mat_opacity[
        jnp.clip(override, 0,
                 scene.mat_opacity.shape[0] - 1).astype(I32)]
    prim = jnp.clip(prim.astype(I32), 0, scene.tri_opacity.shape[0] - 1)
    opac = jnp.where(has_ov, ov_opacity, scene.tri_opacity[prim])
    if alpha_textures:
        from ..integrator.common import sample_texture_atlas

        mat_id = jnp.where(
            has_ov, override, scene.material_ids[prim]).astype(I32)
        mat_id = jnp.clip(mat_id, 0, scene.mat_opacity_tex.shape[0] - 1)
        otex = scene.mat_opacity_tex[mat_id]
        trix = scene.triangles[prim].astype(I32)
        uv0 = scene.vtx_table[trix[:, 0], 9:11]
        uv1 = scene.vtx_table[trix[:, 1], 9:11]
        uv2 = scene.vtx_table[trix[:, 2], 9:11]
        uvh = (uv0 + (uv1 - uv0) * u[..., None]
               + (uv2 - uv0) * v[..., None])
        uvh = uvh * scene.mat_tiling[mat_id]
        tex_o = sample_texture_atlas(
            scene.textures, scene.texture_sizes, otex, uvh)[..., 0]
        opac = opac * jnp.where(otex >= 0, tex_o, 1.0)
    return opac, opaque


_ALPHA_MAX_PASSES = 64   # recast-loop bound (deepest transparent stack)
_ALPHA_ADVANCE = 4e-4    # relative origin advance past a rejected hit


def _alpha_recast(scene, origin, direction, first_floor, opacity_u,
                  alpha_textures, cast_closest, t_max=None):
    """Alpha-tested query via iterative re-casting around an opaque
    closest-hit kernel: cast, evaluate the candidate's opacity in XLA
    (vectorized texture fetches), and re-cast resolved-transparent rays
    from beyond the rejected surface. Resolved rays are parked on a
    far-away origin so the work-list cull drops them — extra passes only
    cost work where transparency was actually hit.

    This is how the reference's in-kernel AnyHitShader hook
    (BVHAccel.inc.hlsl:182-190) maps to the TPU fast path: the texture
    gather moves OUT of the kernel, the traversal stays dense.

    cast_closest(o, d, tmn, cap) receives the per-pass kernel floor
    tmn — first_floor on pass 0 (which runs from the ORIGINAL origins,
    so the window floor of a slab-march phase applies there and skips
    the re-proven near field), 0 on later passes (advanced origins,
    where an absolute floor no longer translates; the march itself is
    already beyond the floor) — and the per-ray remaining window cap
    (t_max - t_base, valid on EVERY pass because both are relative to
    the current origin). The cap bounds the masked-subset traversal
    by the opaque ceiling in-kernel, like the reference's t-bounded
    AnyHit; it is exact — any candidate beyond it would fail the
    take/ends window test below anyway.

    Returns (t, u, v, tri, inst, back, occluded) with t accumulated
    across passes. When t_max is given, occluded = accepted hit within
    (first_floor, t_max) (shadow-ray semantics)."""
    R = origin.shape[0]
    park = jnp.full((R, 3), 2.0 * 1e9, F32)
    inf = jnp.full(R, jnp.inf, F32)
    zero = jnp.zeros(R, F32)
    tmax_arr = (jnp.full((R,), jnp.inf, F32) if t_max is None
                else jnp.broadcast_to(jnp.asarray(t_max, F32), (R,)))
    unbounded = t_max is None

    def cond(s):
        k, done = s[0], s[1]
        return (k < _ALPHA_MAX_PASSES) & jnp.any(~done)

    def body(s):
        (k, done, cur_o, t_base, out_t, out_u, out_v, out_tri, out_inst,
         out_back, occ, src, dirp, opup, tmaxp) = s
        o_eff = jnp.where(done[:, None], park, cur_o)
        # parked rays also point AWAY from the scene (+x from a far +
        # origin) — with their own direction they could still enter
        # cluster boxes at t ~ park distance and waste sweeps
        d_eff = jnp.where(done[:, None],
                          jnp.asarray([1.0, 0.0, 0.0], F32), dirp)
        tmn = jnp.where(k == 0, jnp.asarray(first_floor, F32),
                        jnp.float32(0.0))
        rem = jnp.where(done, 0.0, jnp.maximum(tmaxp - t_base, 0.0))
        t, u, v, tri, inst, back = cast_closest(o_eff, d_eff, tmn, rem)
        hit = jnp.isfinite(t)
        opac, opaque = effective_opacity(scene, tri, inst, u, v,
                                         alpha_textures)
        accept = opaque | (opup < opac)
        t_tot = t_base + t
        if unbounded:
            take = ~done & hit & accept
            ends = ~done & (~hit | accept)
        else:
            take = ~done & hit & accept & (t_tot < tmaxp)
            # an accepted hit OR any hit past t_max resolves the ray
            ends = ~done & (~hit | accept | (t_tot >= tmaxp))
        out_t = jnp.where(take, t_tot, out_t)
        out_u = jnp.where(take, u, out_u)
        out_v = jnp.where(take, v, out_v)
        out_tri = jnp.where(take, tri, out_tri)
        out_inst = jnp.where(take, inst, out_inst)
        out_back = jnp.where(take, back, out_back)
        occ = occ | take
        reject = ~done & hit & ~accept
        adv = t * (1.0 + _ALPHA_ADVANCE) + 1e-5
        cur_o = jnp.where(reject[:, None],
                          cur_o + adv[:, None] * dirp, cur_o)
        t_base = jnp.where(reject, t_base + adv, t_base)
        done = done | ends
        # compact unresolved rays to the FRONT for the next pass: the
        # typical pass-1 survivor set is a few % of the batch scattered
        # over every ray bundle, and a bundle sweeps for its worst
        # ray — left in place they keep every block's sweep alive for
        # the full (deepest-transparency-stack) pass count. The stable
        # two-way partition (cumsum ranks, no sort) preserves the
        # caller's coherence order within each side.
        live = (~done).astype(I32)
        n_live = jnp.sum(live)
        pos = jnp.where(~done, jnp.cumsum(live) - 1,
                        n_live + jnp.cumsum(1 - live) - 1)

        def perm(x):
            return jnp.zeros_like(x).at[pos].set(x)

        return (k + 1, perm(done), perm(cur_o), perm(t_base),
                perm(out_t), perm(out_u), perm(out_v), perm(out_tri),
                perm(out_inst), perm(out_back), perm(occ), perm(src),
                perm(dirp), perm(opup), perm(tmaxp))

    init = (jnp.int32(0), jnp.zeros(R, bool), origin, zero, inf, zero,
            zero, jnp.zeros(R, I32), jnp.zeros(R, I32),
            jnp.zeros(R, bool), jnp.zeros(R, bool),
            jnp.arange(R, dtype=I32), direction, opacity_u, tmax_arr)
    out = jax.lax.while_loop(cond, body, init)
    # un-permute: one scatter by the carried source map
    src = out[11]

    def unperm(x):
        return jnp.zeros_like(x).at[src].set(x)

    return (unperm(out[4]), unperm(out[5]), unperm(out[6]),
            unperm(out[7]), unperm(out[8]), unperm(out[9]),
            unperm(out[10]))


def _resolve_backend(scene, backend):
    if backend.startswith("pallas_wlg"):
        # grouped sweep v1 reads the world-soup cluster tables;
        # instanced / tiny scenes ride the bundle work-list
        if (scene.isup_inst.shape[0] > 1
                or scene.cluster_bbox.shape[0] <= 1):
            backend = ("pallas_wl_interpret"
                       if backend.endswith("interpret") else "pallas_wl")
        return backend
    if backend.startswith("pallas_pair"):
        # the pair-expanded sweep v1 needs the world-soup cluster
        # tables: instanced or tiny scenes ride the bundle work-list
        if scene.isup_inst.shape[0] > 1 or scene.cluster_bbox.shape[0] <= 1:
            backend = ("pallas_wl_interpret"
                       if backend.endswith("interpret") else "pallas_wl")
        return backend
    if backend != "auto":
        return backend
    if scene.isup_inst.shape[0] > 1:
        # instanced work-list tables (BLAS sharing): built when the
        # world soup would exceed its budget — the fast path for big /
        # heavily instanced scenes
        return ("pallas_wl" if jax.default_backend() == "tpu"
                else "jax")
    if scene.world_tris.shape[0] > 1:
        # dense sweep wins for small scenes; the Pallas kernels keep the
        # triangle tables in VMEM (TPU only — interpret mode is too slow
        # to be the CPU default). Clustered cull-and-sweep once the scene
        # provides the cluster tables (flatten_scene: > 2048 tris).
        if jax.default_backend() == "tpu":
            return ("pallas_wl" if scene.cluster_bbox.shape[0] > 1
                    else "pallas")
        return "brute"
    return "jax"


_PALLAS_BACKENDS = ("pallas", "pallas_interpret", "pallas_cluster",
                    "pallas_cluster_interpret", "pallas_wl",
                    "pallas_wl_interpret", "pallas_wlg",
                    "pallas_wlg_interpret", "pallas_pair",
                    "pallas_pair_interpret")


def _has_alpha_split(scene, backend):
    """True when the opaque/masked cluster split applies: the scene
    carries both subset tables (flatten_scene; an opacity edit resets
    them) and the backend reads the cluster tables a view can swap
    (worklist / clustered — the dense brute kernel reads world_tris)."""
    return (scene.mclu_bbox.shape[0] > 1
            and scene.oclu_bbox.shape[0] > 1
            and scene.isup_inst.shape[0] <= 1
            and (backend.startswith("pallas_wl")
                 or backend.startswith("pallas_pair")
                 or backend.startswith("pallas_cluster")))


def _split_view(scene, masked):
    """Scene view whose cluster tables are one side of the
    opaque/masked split (SceneArrays is a NamedTuple: _replace builds
    a cheap aliased view, no copies)."""
    if masked:
        return scene._replace(cluster_tris=scene.mclu_tris,
                              cluster_bw=scene.mclu_bw,
                              cluster_bbox=scene.mclu_bbox)
    return scene._replace(cluster_tris=scene.oclu_tris,
                          cluster_bw=scene.oclu_bw,
                          cluster_bbox=scene.oclu_bbox)


def intersect_closest(scene, origin, direction, stack_size, t_min=0.0,
                      backend="auto", watertight=False, opacity_u=None,
                      alpha_textures=False, rays_rows=None, t_cap=None):
    """Closest-hit over the scene. origin/direction: (R, 3) f32.
    watertight selects the PBRT permute+shear triangle test (all
    backends, incl. the Pallas kernels). Alpha testing (opacity_u,
    incl. textured) runs on the Pallas fast path through the
    `_alpha_recast` loop. rays_rows=(o_rows, d_rows) each (3, R)
    (origin/direction then None) feeds the work-list kernels in their
    native rows layout, skipping the ~7 ms/M-ray (R, 3) relayout;
    other backends transpose it back.

    t_cap (traced scalar, work-list backends only — others ignore it
    and search the full window): restrict the search to t < ~t_cap;
    a reported miss guarantees no acceptable hit strictly below t_cap,
    a reported hit may lie within one truncation quantum above it.
    See worklist_closest_pallas — slab-marching support."""
    backend = _resolve_backend(scene, backend)
    wl_rows = None
    if rays_rows is not None:
        if (backend.startswith("pallas_wl") and opacity_u is None):
            wl_rows = rays_rows
        else:
            origin = rays_rows[0].T
            direction = rays_rows[1].T
    if (opacity_u is not None and alpha_textures
            and backend not in _PALLAS_BACKENDS):
        backend = "jax"  # non-Pallas textured alpha: the stack path
    if backend in _PALLAS_BACKENDS:
        interp = backend.endswith("interpret")
        is_wl = (backend.startswith("pallas_wl")
                 or backend.startswith("pallas_pair"))
        if backend.startswith("pallas_pair"):
            from .pairsweep import pair_closest_pallas as cast
        elif is_wl:
            from .worklist import worklist_closest_pallas
            cast = (functools.partial(worklist_closest_pallas,
                                      grouped=True)
                    if backend.startswith("pallas_wlg")
                    else worklist_closest_pallas)
        elif backend.startswith("pallas_cluster"):
            from .pallas_brute import clustered_closest_pallas as cast
        else:
            from .pallas_brute import brute_closest_pallas as cast
        iters = None
        capkw = {}
        if t_cap is not None and is_wl:
            capkw = {"t_cap": t_cap}
        if opacity_u is None:
            if wl_rows is not None:
                out = cast(scene, None, None, t_min, interpret=interp,
                           watertight=watertight, rows=wl_rows, **capkw)
            else:
                out = cast(scene, origin, direction, t_min,
                           interpret=interp, watertight=watertight,
                           **capkw)
            if is_wl:   # work-list kernels report swept-cluster counts
                t, u, v, tri, inst, back, iters = out
            else:
                t, u, v, tri, inst, back = out
        elif _has_alpha_split(scene, backend):
            # split path: ONE plain cast over the opaque subset, the
            # recast loop only over the maybe-transparent subset with
            # the opaque hit as its t ceiling (further capped at t_cap;
            # the recast loop's INNER casts stay uncapped — they run
            # from advanced origins, where the absolute cap no longer
            # translates, and its t_max window already stops them)
            out_o = cast(_split_view(scene, masked=False), origin,
                         direction, t_min, interpret=interp,
                         watertight=watertight, **capkw)
            t_o, u_o, v_o, tri_o, inst_o, back_o = out_o[:6]
            if is_wl:
                iters = out_o[6]
            ceil = jnp.where(jnp.isfinite(t_o), t_o, jnp.inf)
            if t_cap is not None:
                ceil = jnp.minimum(ceil, jnp.asarray(t_cap, F32))
            capkw2 = (lambda cap: {"t_cap": cap}) if is_wl else (
                lambda cap: {})
            t_m, u_m, v_m, tri_m, inst_m, back_m, _ = _alpha_recast(
                scene, origin, direction, t_min, opacity_u,
                alpha_textures,
                lambda o, d, tmn, cap: cast(
                    _split_view(scene, masked=True), o, d, tmn,
                    interpret=interp, watertight=watertight,
                    **capkw2(cap))[:6],
                t_max=ceil)
            m = jnp.isfinite(t_m) & (t_m < t_o)
            t = jnp.where(m, t_m, t_o)
            u = jnp.where(m, u_m, u_o)
            v = jnp.where(m, v_m, v_o)
            tri = jnp.where(m, tri_m, tri_o)
            inst = jnp.where(m, inst_m, inst_o)
            back = jnp.where(m, back_m, back_o)
        else:
            capkw2 = (lambda cap: {"t_cap": cap}) if is_wl else (
                lambda cap: {})
            t, u, v, tri, inst, back, _ = _alpha_recast(
                scene, origin, direction, t_min, opacity_u,
                alpha_textures,
                lambda o, d, tmn, cap: cast(scene, o, d, tmn,
                                            interpret=interp,
                                            watertight=watertight,
                                            **capkw2(cap))[:6],
                t_max=(None if t_cap is None
                       else jnp.broadcast_to(jnp.asarray(t_cap, F32),
                                             origin.shape[:1])))
        return HitInfo(t=t, u=u, v=v, triangle=tri, instance=inst,
                       backface=back, hit=jnp.isfinite(t),
                       iterations=(jnp.zeros_like(tri) if iters is None
                                   else iters))
    if backend == "brute":
        (t, u, v, tri, inst, back, _, _) = _brute(
            scene, origin, direction, F32(t_min), jnp.inf, any_hit=False,
            watertight=watertight, opacity_u=opacity_u)
        return HitInfo(t=t, u=u, v=v, triangle=tri, instance=inst,
                       backface=back, hit=jnp.isfinite(t),
                       iterations=jnp.zeros_like(tri))
    s = _traverse(scene, origin, direction, F32(t_min), jnp.inf,
                  stack_size, any_hit=False, watertight=watertight,
                  opacity_u=opacity_u, alpha_textures=alpha_textures)
    return HitInfo(
        t=s.hit_t, u=s.hit_u, v=s.hit_v,
        triangle=s.hit_tri, instance=s.hit_inst, backface=s.hit_back,
        hit=jnp.isfinite(s.hit_t), iterations=s.iters,
    )


def intersect_closest_slab(scene, origin, direction, stack_size, t_cap,
                           backend="auto", watertight=False,
                           opacity_u=None, alpha_textures=False,
                           live=None, phases=2, grow=5.0):
    """Distance-slab closest hit in `phases` geometric windows: phase 1
    capped at scene_entry + t_cap per ray (tightening the per-ray
    enter prune and the bundle-max early break — per-ray front-to-back
    order that bundle-min item order cannot provide on incoherent
    pools),
    then each later phase stable-compacts the still-unresolved rays —
    no accepted hit strictly below the previous cap — to the front
    (cumsum partition preserves the caller's coherence order within
    each side) and re-casts with a grow-x wider window; the last phase
    is unbounded. Opaque later phases also FLOOR the window at the
    previous cap (kernel t_min + the fine-enter `t_hi >= t_min` prune
    skip the near field — exact, the earlier phases were exhaustive
    below it); alpha-tested casts stay unfloored because the recast
    loop's inner casts run from advanced origins where an absolute
    floor no longer translates. Exact vs a single full cast up to
    packed-argmin quantum ties at the window boundaries. live masks
    lanes whose phase-1 result is final regardless."""
    assert int(phases) >= 2, "slab marching needs a final unbounded phase"
    # windows are relative to each ray's scene-bbox ENTRY (0 for
    # origins already inside — pool bounce rays): a stand-off camera
    # would otherwise put every hit beyond an origin-relative cap
    root_lo = scene.node_bbox_min[0]
    root_hi = scene.node_bbox_max[0]
    t_en = jnp.full(origin.shape[:1], -jnp.inf, F32)
    t_ex = jnp.full(origin.shape[:1], jnp.inf, F32)
    for ax in range(3):
        inv = _safe_inv(direction[:, ax])
        a = (root_lo[ax] - origin[:, ax]) * inv
        b = (root_hi[ax] - origin[:, ax]) * inv
        t_en = jnp.maximum(t_en, jnp.minimum(a, b))
        t_ex = jnp.minimum(t_ex, jnp.maximum(a, b))
    entry = jnp.where((t_ex >= t_en) & (t_ex >= 0.0),
                      jnp.maximum(t_en, 0.0), 0.0)
    caps = entry + t_cap
    hit = intersect_closest(
        scene, origin, direction, stack_size, backend=backend,
        watertight=watertight, opacity_u=opacity_u,
        alpha_textures=alpha_textures, t_cap=caps)
    # a capped miss is FINAL when the ray exits the scene bbox before
    # the cap (the kernel's sentinel was the scene exit, so the whole
    # ray was searched) — don't re-cast full-scene misses
    need = jnp.where(hit.hit, hit.t >= caps, t_ex > caps)
    if live is not None:
        need = need & live
    itr = hit.iterations
    floor_prev = caps
    far = jnp.float32(2e9)
    for k in range(1, int(phases)):
        last = k == int(phases) - 1
        cap_k = None if last else entry + t_cap * (grow ** k)
        liv = need.astype(I32)
        n_need = jnp.sum(liv)
        pos = jnp.where(need, jnp.cumsum(liv) - 1,
                        n_need + jnp.cumsum(1 - liv) - 1)

        def perm(x, pos=pos):
            return jnp.zeros_like(x).at[pos].set(x)

        o2 = perm(jnp.where(need[:, None], origin, far))
        d2 = perm(jnp.where(need[:, None], direction,
                            jnp.asarray([1.0, 0.0, 0.0], F32)))
        # the kernel floor is an SMEM scalar: use the tightest bound
        # that holds for EVERY unresolved ray (min of their per-ray
        # proven-clear windows; conservative, still exact). Alpha casts
        # floor only the recast loop's FIRST pass (original origins) —
        # see _alpha_recast — so the floor is exact there too.
        floor_k = jnp.min(jnp.where(need, floor_prev, jnp.inf))
        floor_k = jnp.where(jnp.isfinite(floor_k), floor_k, 0.0)
        hit_k = intersect_closest(
            scene, o2, d2, stack_size, t_min=floor_k, backend=backend,
            watertight=watertight,
            opacity_u=None if opacity_u is None else perm(opacity_u),
            alpha_textures=alpha_textures,
            t_cap=None if cap_k is None else perm(cap_k))
        # back to caller order (new[pos[i]] = old[i] -> gather by pos)
        hit_k = jax.tree_util.tree_map(lambda x: x[pos], hit_k)
        itr = itr + jnp.where(need, hit_k.iterations, 0)
        hit = jax.tree_util.tree_map(
            lambda a, b: jnp.where(need, b, a), hit, hit_k)
        if not last:
            need = need & jnp.where(hit_k.hit, hit_k.t >= cap_k,
                                    t_ex > cap_k)
            floor_prev = cap_k
    return hit._replace(iterations=itr)


def intersect_any(scene, origin, direction, t_max, stack_size, t_min=0.0,
                  backend="auto", watertight=False, opacity_u=None,
                  alpha_textures=False, rays_rows=None):
    """Occlusion query: True where any hit exists in (t_min, t_max).
    Alpha-tested occlusion on the Pallas path runs the `_alpha_recast`
    closest-hit loop (the opaque any-hit kernels cannot report WHICH
    surface occluded, which the alpha test needs). rays_rows: see
    intersect_closest."""
    backend = _resolve_backend(scene, backend)
    wl_rows = None
    if rays_rows is not None:
        if (backend.startswith("pallas_wl") and opacity_u is None):
            wl_rows = rays_rows
        else:
            origin = rays_rows[0].T
            direction = rays_rows[1].T
    if (opacity_u is not None and alpha_textures
            and backend not in _PALLAS_BACKENDS):
        backend = "jax"  # non-Pallas textured alpha: the stack path
    if backend in _PALLAS_BACKENDS:
        interp = backend.endswith("interpret")
        if backend.startswith("pallas_pair"):
            from .pairsweep import pair_any_pallas as cast_any
            from .pairsweep import pair_closest_pallas as cast_c
        elif backend.startswith("pallas_wl"):
            from .worklist import (worklist_any_pallas,
                                   worklist_closest_pallas)
            cast_any, cast_c = worklist_any_pallas, \
                worklist_closest_pallas
            if backend.startswith("pallas_wlg"):
                cast_any = functools.partial(worklist_any_pallas,
                                             grouped=True)
                cast_c = functools.partial(worklist_closest_pallas,
                                           grouped=True)
        elif backend.startswith("pallas_cluster"):
            from .pallas_brute import clustered_any_pallas as cast_any
            from .pallas_brute import clustered_closest_pallas as cast_c
        else:
            from .pallas_brute import brute_any_pallas as cast_any
            from .pallas_brute import brute_closest_pallas as cast_c
        if opacity_u is None:
            if wl_rows is not None:
                return cast_any(scene, None, None, t_max, t_min,
                                interpret=interp, watertight=watertight,
                                rows=wl_rows)
            return cast_any(scene, origin, direction, t_max, t_min,
                            interpret=interp, watertight=watertight)
        if _has_alpha_split(scene, backend):
            # split path: the cheap any-hit kernel (all-occluded short
            # circuit, no recasting) answers the opaque subset; only
            # the maybe-transparent subset pays the recast loop, and
            # rays the opaque pass already occluded skip it (t_max 0)
            occ_o = cast_any(_split_view(scene, masked=False), origin,
                             direction, t_max, t_min, interpret=interp,
                             watertight=watertight)
            t_rest = jnp.where(
                occ_o, 0.0,
                jnp.broadcast_to(jnp.asarray(t_max, F32),
                                 (origin.shape[0],)))
            is_wl2 = (backend.startswith("pallas_wl")
                      or backend.startswith("pallas_pair"))
            capkw2 = (lambda cap: {"t_cap": cap}) if is_wl2 else (
                lambda cap: {})
            occ_m = _alpha_recast(
                scene, origin, direction, t_min, opacity_u,
                alpha_textures,
                lambda o, d, tmn, cap: cast_c(
                    _split_view(scene, masked=True), o, d, tmn,
                    interpret=interp, watertight=watertight,
                    **capkw2(cap))[:6],
                t_max=t_rest)[6]
            return occ_o | occ_m
        is_wl2 = (backend.startswith("pallas_wl")
                  or backend.startswith("pallas_pair"))
        capkw2 = (lambda cap: {"t_cap": cap}) if is_wl2 else (
            lambda cap: {})
        occ = _alpha_recast(
            scene, origin, direction, t_min, opacity_u, alpha_textures,
            lambda o, d, tmn, cap: cast_c(scene, o, d, tmn,
                                          interpret=interp,
                                          watertight=watertight,
                                          **capkw2(cap))[:6],
            t_max=t_max)[6]
        return occ
    if backend == "brute":
        out = _brute(scene, origin, direction, F32(t_min), t_max,
                     any_hit=True, watertight=watertight,
                     opacity_u=opacity_u)
        return out[6]
    s = _traverse(scene, origin, direction, F32(t_min), t_max,
                  stack_size, any_hit=True, watertight=watertight,
                  opacity_u=opacity_u, alpha_textures=alpha_textures)
    return s.occluded

"""Pallas dense ray-intersection kernel (small-scene speed-of-light path).

Replaces the reference's per-thread BVH traversal for small scenes with a
TPU-shaped computation: the whole (pre-transformed, world-space) triangle
soup lives in VMEM as a (B, 12) table and every ray block sweeps it
slab-by-slab with Moeller-Trumbore evaluated as pure (TRI_SLAB, RB) VPU
math — no gathers, no HBM round-trips for intermediates, best-hit state
carried in the loop. (reference behavior: Shaders/BVHAccel.inc.hlsl
BVHIntersect / BVHIntersectNoInterp + RayPrimitiveIntersect.inc.hlsl:
72-103; the dense-sweep strategy is the TPU re-design — SURVEY.md §7.)

Layout (measured on v5e): rays ride the LANE axis — ray inputs are
(3, R) with (3, RB) blocks and outputs (6, R) with (6, RB) blocks, so
every DMA is dense; triangles ride the SUBLANE axis — the table is
(B, 12) so a slab column slice `tab[base:base+128, c]` is (128, 1) with
no transpose. Table columns: 0-8 = v0|v1|v2 xyz, 9 = global triangle id,
10 = instance id, 11 = winding flip (instance det < 0). Padded rows have
degenerate vertices (det = 0 -> never hit).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
I32 = jnp.int32

RAY_BLOCK = 1024
TRI_SLAB = 128
BIG = 3.0e38


def _moeller_slab(tab, base, ox, oy, oz, dx, dy, dz, t_min, t_max,
                  slab=TRI_SLAB):
    """One (slab, RB) Moeller-Trumbore batch. Ray components are
    (1, RB); triangle components (slab, 1)."""
    c = lambda i: tab[pl.ds(base, slab), i:i + 1]        # (slab, 1)
    v0x, v0y, v0z = c(0), c(1), c(2)
    v1x, v1y, v1z = c(3), c(4), c(5)
    v2x, v2y, v2z = c(6), c(7), c(8)
    e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
    e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
    # pvec = d x e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    det_ok = jnp.abs(det) >= 1e-10
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
    tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    # qvec = tvec x e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    back = det > -1e-10
    ok = (det_ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
          & (t >= t_min) & (t < t_max))
    return t, u, v, back, ok


def _closest_kernel(n_slabs, tab_ref, o_ref, d_ref, tmin_ref, out_ref):
    ox, oy, oz = o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :]   # (1, RB)
    dx, dy, dz = d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :]
    t_min = tmin_ref[0, 0]
    rb = ox.shape[1]
    rows = jax.lax.broadcasted_iota(I32, (TRI_SLAB, rb), 0)

    def body(k, carry):
        t_b, u_b, v_b, tri_b, inst_b, back_b = carry
        base = pl.multiple_of(k * TRI_SLAB, TRI_SLAB)
        t, u, v, back, ok = _moeller_slab(
            tab_ref, base, ox, oy, oz, dx, dy, dz, t_min, t_b)
        tm = jnp.where(ok, t, BIG)
        slab_min = jnp.min(tm, axis=0, keepdims=True)          # (1, RB)
        better = slab_min < t_b
        # first (leaf-order) row achieving the minimum
        jmin = jnp.min(jnp.where(tm == slab_min, rows, 1 << 30),
                       axis=0, keepdims=True)
        jm = rows == jmin

        def pick(x):
            return jnp.sum(jnp.where(jm, x, 0.0), axis=0, keepdims=True)

        tri = tab_ref[pl.ds(base, TRI_SLAB), 9:10]
        inst = tab_ref[pl.ds(base, TRI_SLAB), 10:11]
        flip = tab_ref[pl.ds(base, TRI_SLAB), 11:12]
        back_f = jnp.where(back ^ (flip > 0.5), 1.0, 0.0)
        return (
            jnp.where(better, slab_min, t_b),
            jnp.where(better, pick(u), u_b),
            jnp.where(better, pick(v), v_b),
            jnp.where(better, pick(jnp.broadcast_to(tri, tm.shape)), tri_b),
            jnp.where(better, pick(jnp.broadcast_to(inst, tm.shape)),
                      inst_b),
            jnp.where(better, pick(jnp.broadcast_to(back_f, tm.shape)),
                      back_b),
        )

    zeros = jnp.zeros((1, rb), F32)
    init = (jnp.full((1, rb), BIG, F32), zeros, zeros, zeros, zeros, zeros)
    t_b, u_b, v_b, tri_b, inst_b, back_b = jax.lax.fori_loop(
        0, n_slabs, body, init)
    out_ref[0:1, :] = t_b
    out_ref[1:2, :] = u_b
    out_ref[2:3, :] = v_b
    out_ref[3:4, :] = tri_b
    out_ref[4:5, :] = inst_b
    out_ref[5:6, :] = back_b


def _any_kernel(n_slabs, tab_ref, o_ref, d_ref, tmax_ref, tmin_ref,
                occ_ref):
    ox, oy, oz = o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :]
    dx, dy, dz = d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :]
    t_min = tmin_ref[0, 0]
    t_max = tmax_ref[0:1, :]
    rb = ox.shape[1]

    def body(k, occ):
        base = pl.multiple_of(k * TRI_SLAB, TRI_SLAB)
        _, _, _, _, ok = _moeller_slab(
            tab_ref, base, ox, oy, oz, dx, dy, dz, t_min, t_max)
        return occ | jnp.any(ok, axis=0, keepdims=True)

    occ = jax.lax.fori_loop(0, n_slabs, body,
                            jnp.zeros((1, rb), jnp.bool_))
    occ_ref[0:1, :] = occ


def _build_table(scene):
    """(B_padded, 12) f32 triangle table from the flattened scene."""
    tab = jnp.concatenate([scene.world_tris, scene.world_tri_meta], axis=1)
    b = tab.shape[0]
    pad = -(-b // TRI_SLAB) * TRI_SLAB - b
    if pad:
        tab = jnp.pad(tab, ((0, pad), (0, 0)))
    return tab


def _prep_rays(origin, direction):
    """(R, 3) -> transposed (3, R_padded) + original count."""
    r = origin.shape[0]
    pad = -(-r // RAY_BLOCK) * RAY_BLOCK - r
    o = jnp.pad(origin, ((0, pad), (0, 0))).T
    d = jnp.pad(direction, ((0, pad), (0, 0))).T
    return o, d, r


@functools.partial(jax.jit, static_argnames=("interpret",))
def brute_closest_pallas(scene, origin, direction, t_min=0.0,
                         interpret=False):
    """Closest-hit over the world-triangle soup. Returns
    (t, u, v, tri, inst, backface) with t = +inf on miss."""
    o, d, r = _prep_rays(origin, direction)
    rp = o.shape[1]
    tab = _build_table(scene)
    n_slabs = tab.shape[0] // TRI_SLAB
    out = pl.pallas_call(
        functools.partial(_closest_kernel, n_slabs),
        grid=(rp // RAY_BLOCK,),
        in_specs=[
            pl.BlockSpec(tab.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((6, RAY_BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((6, rp), F32),
        interpret=interpret,
    )(tab, o, d, jnp.full((1, 1), t_min, F32))
    t, u, v, tri, inst, back = [out[i, :r] for i in range(6)]
    t = jnp.where(t >= BIG, jnp.inf, t)
    return t, u, v, tri.astype(I32), inst.astype(I32), back > 0.5


@functools.partial(jax.jit, static_argnames=("interpret",))
def brute_any_pallas(scene, origin, direction, t_max, t_min=0.0,
                     interpret=False):
    """Occlusion query over the world-triangle soup -> (R,) bool."""
    o, d, r = _prep_rays(origin, direction)
    rp = o.shape[1]
    tm = jnp.pad(jnp.broadcast_to(jnp.asarray(t_max, F32), (r,)),
                 (0, rp - r))[None, :]
    tab = _build_table(scene)
    n_slabs = tab.shape[0] // TRI_SLAB
    occ = pl.pallas_call(
        functools.partial(_any_kernel, n_slabs),
        grid=(rp // RAY_BLOCK,),
        in_specs=[
            pl.BlockSpec(tab.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, rp), jnp.bool_),
        interpret=interpret,
    )(tab, o, d, tm, jnp.full((1, 1), t_min, F32))
    return occ[0, :r]


# ---------------------------------------------------------------------------
# Clustered cull-and-sweep intersector (mid-size scenes)
# ---------------------------------------------------------------------------
#
# The flat sweep above tests every triangle against every ray; fine for a
# few hundred triangles, quadratic beyond. The clustered variant first
# slab-tests each ray block against a cluster's AABB (a handful of (1, RB)
# VPU ops) and only runs the dense 64-triangle Moeller batch for clusters
# some ray in the block actually enters (`pl.when` skips the whole batch
# otherwise), with current-best-t pruning. Clusters are a GRID dimension,
# not an in-kernel loop: the Pallas pipeline streams each 64-triangle slab
# and its AABB row through VMEM (double-buffered, so the scene can be
# arbitrarily large in HBM), every slice in the kernel is static, and
# best-hit state lives in VMEM scratch that persists across the
# cluster-innermost grid steps of one ray block. This is the TPU re-design
# of per-thread stack traversal: culling amortizes across a block, sweep
# work stays dense on the VPU, and the "stack" disappears entirely.

from .cluster import CLUSTER_SIZE  # noqa: E402


def _cluster_aabb_enter(cbox_ref, k, ox, oy, oz, ix, iy, iz, t_min,
                        t_cap):
    tx0 = (cbox_ref[k, 0] - ox) * ix
    tx1 = (cbox_ref[k, 3] - ox) * ix
    ty0 = (cbox_ref[k, 1] - oy) * iy
    ty1 = (cbox_ref[k, 4] - oy) * iy
    tz0 = (cbox_ref[k, 2] - oz) * iz
    tz1 = (cbox_ref[k, 5] - oz) * iz
    t0 = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                 jnp.minimum(ty0, ty1)),
                     jnp.minimum(tz0, tz1))
    t1 = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                 jnp.maximum(ty0, ty1)),
                     jnp.maximum(tz0, tz1))
    return (t1 >= t0) & (t0 < t_cap) & (t1 >= t_min)


def _safe_inv_cols(c):
    tiny = jnp.where(c >= 0.0, 1e-30, -1e-30)
    return 1.0 / jnp.where(jnp.abs(c) < 1e-30, tiny, c)


CLUSTER_GROUP = 16   # clusters swept per grid step (amortizes step cost)


def _pad_cluster_tables(scene):
    """Pad cluster tables to a CLUSTER_GROUP multiple; padding clusters
    get inverted (never-hit) bboxes."""
    ctab = scene.cluster_tris
    cbox = scene.cluster_bbox
    c = cbox.shape[0]
    cp = -(-c // CLUSTER_GROUP) * CLUSTER_GROUP
    if cp != c:
        ctab = jnp.pad(ctab, ((0, (cp - c) * CLUSTER_SIZE), (0, 0)))
        pad_rows = jnp.tile(jnp.asarray(
            [[1.0, 1.0, 1.0, -1.0, -1.0, -1.0, 0.0, 0.0]], ctab.dtype),
            (cp - c, 1))
        cbox = jnp.concatenate([cbox, pad_rows], axis=0)
    return ctab, cbox, cp // CLUSTER_GROUP


def _clustered_closest_kernel(ctab_ref, cbox_ref, o_ref, d_ref, tmin_ref,
                              out_ref, t_scr, u_scr, v_scr, tri_scr,
                              inst_scr, back_scr):
    k = pl.program_id(1)
    n_k = pl.num_programs(1)
    ox, oy, oz = o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :]
    dx, dy, dz = d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :]
    t_min = tmin_ref[0, 0]
    rb = ox.shape[1]

    @pl.when(k == 0)
    def _():
        t_scr[:] = jnp.full((1, rb), BIG, F32)
        u_scr[:] = jnp.zeros((1, rb), F32)
        v_scr[:] = jnp.zeros((1, rb), F32)
        tri_scr[:] = jnp.zeros((1, rb), F32)
        inst_scr[:] = jnp.zeros((1, rb), F32)
        back_scr[:] = jnp.zeros((1, rb), F32)

    ix, iy, iz = _safe_inv_cols(dx), _safe_inv_cols(dy), _safe_inv_cols(dz)
    rows = jax.lax.broadcasted_iota(I32, (CLUSTER_SIZE, rb), 0)

    for g in range(CLUSTER_GROUP):
        t_b = t_scr[:]
        enter = _cluster_aabb_enter(cbox_ref, k * CLUSTER_GROUP + g, ox,
                                    oy, oz, ix, iy, iz, t_min, t_b)

        @pl.when(jnp.any(enter))
        def _(g=g, t_b=t_b):
            base = g * CLUSTER_SIZE
            t, u, v, back, ok = _moeller_slab(
                ctab_ref, base, ox, oy, oz, dx, dy, dz, t_min, t_b,
                slab=CLUSTER_SIZE)
            tm = jnp.where(ok, t, BIG)
            slab_min = jnp.min(tm, axis=0, keepdims=True)
            better = slab_min < t_b
            jmin = jnp.min(jnp.where(tm == slab_min, rows, 1 << 30),
                           axis=0, keepdims=True)
            jm = rows == jmin

            def pick(x):
                return jnp.sum(jnp.where(jm, x, 0.0), axis=0,
                               keepdims=True)

            tri = ctab_ref[base:base + CLUSTER_SIZE, 9:10]
            inst = ctab_ref[base:base + CLUSTER_SIZE, 10:11]
            flip = ctab_ref[base:base + CLUSTER_SIZE, 11:12]
            back_f = jnp.where(back ^ (flip > 0.5), 1.0, 0.0)
            t_scr[:] = jnp.where(better, slab_min, t_b)
            u_scr[:] = jnp.where(better, pick(u), u_scr[:])
            v_scr[:] = jnp.where(better, pick(v), v_scr[:])
            tri_scr[:] = jnp.where(
                better, pick(jnp.broadcast_to(tri, tm.shape)), tri_scr[:])
            inst_scr[:] = jnp.where(
                better, pick(jnp.broadcast_to(inst, tm.shape)),
                inst_scr[:])
            back_scr[:] = jnp.where(
                better, pick(jnp.broadcast_to(back_f, tm.shape)),
                back_scr[:])

    @pl.when(k == n_k - 1)
    def _():
        out_ref[0:1, :] = t_scr[:]
        out_ref[1:2, :] = u_scr[:]
        out_ref[2:3, :] = v_scr[:]
        out_ref[3:4, :] = tri_scr[:]
        out_ref[4:5, :] = inst_scr[:]
        out_ref[5:6, :] = back_scr[:]


def _clustered_any_kernel(ctab_ref, cbox_ref, o_ref, d_ref, tmax_ref,
                          tmin_ref, occ_ref, occ_scr):
    k = pl.program_id(1)
    n_k = pl.num_programs(1)
    ox, oy, oz = o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :]
    dx, dy, dz = d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :]
    t_min = tmin_ref[0, 0]
    t_max = tmax_ref[0:1, :]
    rb = ox.shape[1]

    @pl.when(k == 0)
    def _():
        occ_scr[:] = jnp.zeros((1, rb), F32)

    ix, iy, iz = _safe_inv_cols(dx), _safe_inv_cols(dy), _safe_inv_cols(dz)
    for g in range(CLUSTER_GROUP):
        occ = occ_scr[:] > 0.5
        enter = _cluster_aabb_enter(cbox_ref, k * CLUSTER_GROUP + g, ox,
                                    oy, oz, ix, iy, iz, t_min,
                                    t_max) & ~occ

        @pl.when(jnp.any(enter))
        def _(g=g):
            _, _, _, _, ok = _moeller_slab(
                ctab_ref, g * CLUSTER_SIZE, ox, oy, oz, dx, dy, dz,
                t_min, t_max, slab=CLUSTER_SIZE)
            hit = jnp.any(ok, axis=0, keepdims=True)
            occ_scr[:] = jnp.maximum(occ_scr[:],
                                     jnp.where(hit, 1.0, 0.0))

    @pl.when(k == n_k - 1)
    def _():
        occ_ref[0:1, :] = occ_scr[:] > 0.5


@functools.partial(jax.jit, static_argnames=("interpret",))
def clustered_closest_pallas(scene, origin, direction, t_min=0.0,
                             interpret=False):
    """Closest-hit via the clustered cull-and-sweep kernel."""
    o, d, r = _prep_rays(origin, direction)
    rp = o.shape[1]
    ctab, cbox, n_groups = _pad_cluster_tables(scene)
    ray_spec = pl.BlockSpec((3, RAY_BLOCK), lambda i, k: (0, i),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _clustered_closest_kernel,
        grid=(rp // RAY_BLOCK, n_groups),
        in_specs=[
            pl.BlockSpec((CLUSTER_GROUP * CLUSTER_SIZE, 12),
                         lambda i, k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(cbox.shape, lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            ray_spec, ray_spec,
            pl.BlockSpec((1, 1), lambda i, k: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((6, RAY_BLOCK), lambda i, k: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((6, rp), F32),
        scratch_shapes=[pltpu.VMEM((1, RAY_BLOCK), F32)] * 6,
        interpret=interpret,
    )(ctab, cbox, o, d, jnp.full((1, 1), t_min, F32))
    t, u, v, tri, inst, back = [out[i, :r] for i in range(6)]
    t = jnp.where(t >= BIG, jnp.inf, t)
    return t, u, v, tri.astype(I32), inst.astype(I32), back > 0.5


@functools.partial(jax.jit, static_argnames=("interpret",))
def clustered_any_pallas(scene, origin, direction, t_max, t_min=0.0,
                         interpret=False):
    """Occlusion via the clustered cull-and-sweep kernel."""
    o, d, r = _prep_rays(origin, direction)
    rp = o.shape[1]
    tm = jnp.pad(jnp.broadcast_to(jnp.asarray(t_max, F32), (r,)),
                 (0, rp - r))[None, :]
    ctab, cbox, n_groups = _pad_cluster_tables(scene)
    ray_spec = pl.BlockSpec((3, RAY_BLOCK), lambda i, k: (0, i),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((1, RAY_BLOCK), lambda i, k: (0, i),
                            memory_space=pltpu.VMEM)
    occ = pl.pallas_call(
        _clustered_any_kernel,
        grid=(rp // RAY_BLOCK, n_groups),
        in_specs=[
            pl.BlockSpec((CLUSTER_GROUP * CLUSTER_SIZE, 12),
                         lambda i, k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(cbox.shape, lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            ray_spec, ray_spec, col_spec,
            pl.BlockSpec((1, 1), lambda i, k: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=col_spec,
        out_shape=jax.ShapeDtypeStruct((1, rp), jnp.bool_),
        scratch_shapes=[pltpu.VMEM((1, RAY_BLOCK), F32)],
        interpret=interpret,
    )(ctab, cbox, o, d, tm, jnp.full((1, 1), t_min, F32))
    return occ[0, :r]

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


def watertight_rows(c, ox, oy, oz, dx, dy, dz, t_min, t_max):
    """(slab, RB) PBRT watertight permute+shear triangle test
    (reference: RayPrimitiveIntersect.inc.hlsl:7-70 under
    WATERTIGHT_RAY_TRIANGLE_INTERSECTION). c(i) -> (slab, 1) triangle
    table column; ray components (1, RB). ~2x the Moeller op count —
    the opt-in crack-free mode, same lane layout.

    Returns (t, u, v, back, ok) matching the Moeller helpers (u/v are
    the reference's barycentrics b1/b2 normalized by det)."""
    v0x, v0y, v0z = c(0), c(1), c(2)
    v1x, v1y, v1z = c(3), c(4), c(5)
    v2x, v2y, v2z = c(6), c(7), c(8)
    ax_, ay, az = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
    kz0 = jnp.where((ax_ >= ay) & (ax_ >= az), 0,
                    jnp.where(ay >= az, 1, 2))           # (1, RB)

    def pr(x, y, z, k):
        """Per-ray component pick of a ray-space vector."""
        return jnp.where(k == 0, x, jnp.where(k == 1, y, z))

    kx0 = jnp.where(kz0 == 2, 0, kz0 + 1)
    ky0 = jnp.where(kx0 == 2, 0, kx0 + 1)
    d_z = pr(dx, dy, dz, kz0)
    inv_z = 1.0 / jnp.where(jnp.abs(d_z) < 1e-30, 1e-30, d_z)
    sx = -pr(dx, dy, dz, kx0) * inv_z
    sy = -pr(dx, dy, dz, ky0) * inv_z

    def shear(vx, vy, vz):
        # p = v - o, permuted per ray then sheared: (slab, RB) each
        px_ = pr(vx - ox, vy - oy, vz - oz, kx0)
        py_ = pr(vx - ox, vy - oy, vz - oz, ky0)
        pz_ = pr(vx - ox, vy - oy, vz - oz, kz0)
        return px_ + sx * pz_, py_ + sy * pz_, pz_

    p0x, p0y, p0z = shear(v0x, v0y, v0z)
    p1x, p1y, p1z = shear(v1x, v1y, v1z)
    p2x, p2y, p2z = shear(v2x, v2y, v2z)
    e0 = p1x * p2y - p2x * p1y
    e1 = p2x * p0y - p0x * p2y
    e2 = p0x * p1y - p1x * p0y
    mixed = (((e0 < 0.0) | (e1 < 0.0) | (e2 < 0.0))
             & ((e0 > 0.0) | (e1 > 0.0) | (e2 > 0.0)))
    det = e0 + e1 + e2
    det_ok = det != 0.0
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
    t = (e0 * p0z + e1 * p1z + e2 * p2z) * inv_z * inv_det
    u = e1 * inv_det
    v = e2 * inv_det
    back = jnp.sign(inv_z) * det < 0.0
    # degenerate rows (zero cross product) never hit
    cx = (v1y - v0y) * (v2z - v0z) - (v1z - v0z) * (v2y - v0y)
    cy = (v1z - v0z) * (v2x - v0x) - (v1x - v0x) * (v2z - v0z)
    cz = (v1x - v0x) * (v2y - v0y) - (v1y - v0y) * (v2x - v0x)
    degenerate = (cx * cx + cy * cy + cz * cz) == 0.0
    ok = (~mixed & det_ok & ~degenerate & (t >= t_min) & (t < t_max))
    return t, u, v, back, ok


def _moeller_slab(tab, base, ox, oy, oz, dx, dy, dz, t_min, t_max,
                  slab=TRI_SLAB, watertight=False):
    """One (slab, RB) Moeller-Trumbore batch (or the watertight test
    when requested). Ray components are (1, RB); triangle components
    (slab, 1)."""
    c = lambda i: tab[pl.ds(base, slab), i:i + 1]        # (slab, 1)
    if watertight:
        return watertight_rows(c, ox, oy, oz, dx, dy, dz, t_min, t_max)
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


def _closest_kernel(n_slabs, wt, tab_ref, o_ref, d_ref, tmin_ref, out_ref):
    ox, oy, oz = o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :]   # (1, RB)
    dx, dy, dz = d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :]
    t_min = tmin_ref[0, 0]
    rb = ox.shape[1]
    rows = jax.lax.broadcasted_iota(I32, (TRI_SLAB, rb), 0)

    def body(k, carry):
        t_b, u_b, v_b, tri_b, inst_b, back_b = carry
        base = pl.multiple_of(k * TRI_SLAB, TRI_SLAB)
        t, u, v, back, ok = _moeller_slab(
            tab_ref, base, ox, oy, oz, dx, dy, dz, t_min, t_b,
            watertight=wt)
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


def _any_kernel(n_slabs, wt, tab_ref, o_ref, d_ref, tmax_ref, tmin_ref,
                occ_ref):
    ox, oy, oz = o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :]
    dx, dy, dz = d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :]
    t_min = tmin_ref[0, 0]
    t_max = tmax_ref[0:1, :]
    rb = ox.shape[1]

    def body(k, occ):
        base = pl.multiple_of(k * TRI_SLAB, TRI_SLAB)
        _, _, _, _, ok = _moeller_slab(
            tab_ref, base, ox, oy, oz, dx, dy, dz, t_min, t_max,
            watertight=wt)
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
    """(R, 3) -> transposed (3, R_padded) + original count. Pads to 8 ray
    blocks so the cull kernel can emit (8, C) mask tiles."""
    r = origin.shape[0]
    quantum = 8 * RAY_BLOCK
    pad = -(-r // quantum) * quantum - r
    o = jnp.pad(origin, ((0, pad), (0, 0))).T
    d = jnp.pad(direction, ((0, pad), (0, 0))).T
    return o, d, r


@functools.partial(jax.jit,
                   static_argnames=("interpret", "watertight"))
def brute_closest_pallas(scene, origin, direction, t_min=0.0,
                         interpret=False, watertight=False):
    """Closest-hit over the world-triangle soup. Returns
    (t, u, v, tri, inst, backface) with t = +inf on miss."""
    o, d, r = _prep_rays(origin, direction)
    rp = o.shape[1]
    tab = _build_table(scene)
    n_slabs = tab.shape[0] // TRI_SLAB
    out = pl.pallas_call(
        functools.partial(_closest_kernel, n_slabs, watertight),
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


@functools.partial(jax.jit,
                   static_argnames=("interpret", "watertight"))
def brute_any_pallas(scene, origin, direction, t_max, t_min=0.0,
                     interpret=False, watertight=False):
    """Occlusion query over the world-triangle soup -> (R,) bool."""
    o, d, r = _prep_rays(origin, direction)
    rp = o.shape[1]
    tm = jnp.pad(jnp.broadcast_to(jnp.asarray(t_max, F32), (r,)),
                 (0, rp - r))[None, :]
    tab = _build_table(scene)
    n_slabs = tab.shape[0] // TRI_SLAB
    occ = pl.pallas_call(
        functools.partial(_any_kernel, n_slabs, watertight),
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
# few hundred triangles, quadratic beyond. The clustered path splits the
# work into two kernels:
#
#  1. CULL: per ray block, a conservative interval-arithmetic slab test of
#     the block's ray bundle (origin box x direction intervals) against
#     EVERY cluster AABB at once — clusters ride the lane axis, so one
#     (1, C) vector pass replaces per-cluster bookkeeping. Sound: a
#     cluster that any ray could hit is never culled (false positives are
#     filtered by the exact sweep).
#  2. SWEEP: grid (ray blocks x cluster groups); each step reads ONE
#     precomputed group scalar and branches — entered groups run the dense
#     64-triangle Moeller batches with best-t state in VMEM scratch.
#
# Why this shape: measured on v5e, a per-cluster vector any()+branch costs
# ~390 ns against a 35 ns/step null grid, so testing 1024 clusters per
# block in-kernel burns 400 us/block regardless of geometry. Precomputing
# the masks vectorized drops the per-step cost to a scalar read; with
# square-tile ray order, typical blocks enter ~1-2 clusters.

from .cluster import CLUSTER_SIZE  # noqa: E402

CLUSTER_GROUP = 16   # clusters swept (predicated) per entered group


def _pad_cluster_tables(scene):
    """Pad cluster tables to a CLUSTER_GROUP multiple; padding clusters
    get inverted (never-hit) bboxes. Returns (ctab, cbox_vec, n_groups)
    with ctab column-padded to 128 (manual HBM->VMEM DMA slices must be
    lane-aligned) and cbox_vec (8, Cpad) f32 transposed + 128-lane
    padded."""
    ctab = scene.cluster_tris
    cbox = scene.cluster_bbox
    c = cbox.shape[0]
    cg = -(-c // CLUSTER_GROUP) * CLUSTER_GROUP
    cpad = -(-cg // 128) * 128
    if cg != c:
        ctab = jnp.pad(ctab, ((0, (cg - c) * CLUSTER_SIZE), (0, 0)))
    ctab = jnp.pad(ctab, ((0, 0), (0, 128 - ctab.shape[1])))
    if cpad != c:
        pad_rows = jnp.tile(jnp.asarray(
            [[1.0, 1.0, 1.0, -1.0, -1.0, -1.0, 0.0, 0.0]], cbox.dtype),
            (cpad - c, 1))
        cbox = jnp.concatenate([cbox, pad_rows], axis=0)
    return ctab, cbox.T, cg // CLUSTER_GROUP


def _cull_kernel(cbox_ref, o_ref, d_ref, mask_ref):
    """Conservative bundle-vs-all-clusters slab test for 8 ray blocks ->
    (8, Cpad) 0/1 mask tile."""
    cpad = cbox_ref.shape[1]
    for bi in range(8):
        _cull_one_block(cbox_ref, o_ref, d_ref, mask_ref, bi, cpad)


def _cull_one_block(cbox_ref, o_ref, d_ref, mask_ref, bi, cpad):
    def bounds(ref, i):
        row = ref[i:i + 1, bi * RAY_BLOCK:(bi + 1) * RAY_BLOCK]
        return (jnp.min(row, axis=1, keepdims=True),
                jnp.max(row, axis=1, keepdims=True))

    t_lo = jnp.full((1, cpad), -BIG, F32)
    t_hi = jnp.full((1, cpad), BIG, F32)
    unbounded = jnp.zeros((1, cpad), jnp.bool_)
    for ax in range(3):
        o_lo, o_hi = bounds(o_ref, ax)
        d_lo, d_hi = bounds(d_ref, ax)
        b0 = cbox_ref[ax:ax + 1, :]                 # (1, Cpad) bmin
        b1 = cbox_ref[ax + 3:ax + 4, :]             # (1, Cpad) bmax
        # direction interval spans zero -> axis constrains nothing for
        # some ray; treat as unbounded unless the origin box misses the
        # slab entirely on a side every ray agrees on
        spans = (d_lo <= 0.0) & (d_hi >= 0.0)
        # interval reciprocal (sign-definite case)
        i_a = 1.0 / jnp.where(jnp.abs(d_lo) < 1e-30,
                              jnp.where(d_lo >= 0, 1e-30, -1e-30), d_lo)
        i_b = 1.0 / jnp.where(jnp.abs(d_hi) < 1e-30,
                              jnp.where(d_hi >= 0, 1e-30, -1e-30), d_hi)
        i_lo = jnp.minimum(i_a, i_b)
        i_hi = jnp.maximum(i_a, i_b)
        # numerator intervals (b - o)
        n0_lo, n0_hi = b0 - o_hi, b0 - o_lo
        n1_lo, n1_hi = b1 - o_hi, b1 - o_lo
        # conservative slab-entry/exit interval: min/max over the four
        # products of the numerator x reciprocal interval endpoints,
        # jointly over both slab planes
        cands = [n0_lo * i_lo, n0_lo * i_hi, n0_hi * i_lo, n0_hi * i_hi,
                 n1_lo * i_lo, n1_lo * i_hi, n1_hi * i_lo, n1_hi * i_hi]
        ax_lo = cands[0]
        ax_hi = cands[0]
        for cd in cands[1:]:
            ax_lo = jnp.minimum(ax_lo, cd)
            ax_hi = jnp.maximum(ax_hi, cd)
        # axis with zero-spanning direction: only cull when the whole
        # origin box lies strictly on one side of the slab AND every ray
        # points away — conservatively keep (unbounded)
        t_lo = jnp.where(spans, t_lo, jnp.maximum(t_lo, ax_lo))
        t_hi = jnp.where(spans, t_hi, jnp.minimum(t_hi, ax_hi))
        # origin box entirely outside the slab with directions spanning
        # zero still might hit; track for completeness (no-op)
        unbounded = unbounded | spans

    enter = (t_hi >= t_lo) & (t_hi >= 0.0)
    mask_ref[bi:bi + 1, :] = jnp.where(enter, 1.0, 0.0)


def _cull_masks(scene_ctab_cbox, o, d, interpret=False):
    """Run the cull kernel -> (n_blocks, Cpad) f32 cluster mask and
    (n_blocks, n_groups) group mask."""
    ctab, cbox_vec, n_groups = scene_ctab_cbox
    rp = o.shape[1]
    cpad = cbox_vec.shape[1]
    n_blocks = rp // RAY_BLOCK
    ray_spec = pl.BlockSpec((3, 8 * RAY_BLOCK), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    mask = pl.pallas_call(
        _cull_kernel,
        grid=(n_blocks // 8,),
        in_specs=[
            pl.BlockSpec(cbox_vec.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            ray_spec, ray_spec,
        ],
        out_specs=pl.BlockSpec((8, cpad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, cpad), F32),
        interpret=interpret,
    )(cbox_vec, o, d)
    cg = n_groups * CLUSTER_GROUP
    gmask = mask[:, :cg].reshape(n_blocks, n_groups, CLUSTER_GROUP)
    gmask = jnp.max(gmask, axis=2)
    return mask, gmask


def _clustered_closest_kernel(wt, ctab_ref, cmask_ref, gmask_ref, o_ref, d_ref,
                              tmin_ref, out_ref, t_scr, u_scr, v_scr,
                              tri_scr, inst_scr, back_scr, ctab_vmem,
                              dma_sem):
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

    @pl.when(gmask_ref[0, 0, 0, 0] > 0.0)
    def _():
        # the group's triangle slab lives in HBM; skipped groups never
        # touch it — only entered groups pay the DMA
        dma = pltpu.make_async_copy(
            ctab_ref.at[pl.ds(k * CLUSTER_GROUP * CLUSTER_SIZE,
                              CLUSTER_GROUP * CLUSTER_SIZE), :],
            ctab_vmem, dma_sem)
        dma.start()
        dma.wait()
        rows = jax.lax.broadcasted_iota(I32, (CLUSTER_SIZE, rb), 0)

        def group_body(g, _):
            t_b = t_scr[:]

            @pl.when(cmask_ref[0, 0, 0, g] > 0.0)
            def _():
                base = pl.multiple_of(g * CLUSTER_SIZE, CLUSTER_SIZE)
                t, u, v, back, ok = _moeller_slab(
                    ctab_vmem, base, ox, oy, oz, dx, dy, dz, t_min, t_b,
                    slab=CLUSTER_SIZE, watertight=wt)
                tm = jnp.where(ok, t, BIG)
                slab_min = jnp.min(tm, axis=0, keepdims=True)
                better = slab_min < t_b
                jmin = jnp.min(jnp.where(tm == slab_min, rows, 1 << 30),
                               axis=0, keepdims=True)
                jm = rows == jmin

                def pick(x):
                    return jnp.sum(jnp.where(jm, x, 0.0), axis=0,
                                   keepdims=True)

                tri = ctab_vmem[pl.ds(base, CLUSTER_SIZE), 9:10]
                inst = ctab_vmem[pl.ds(base, CLUSTER_SIZE), 10:11]
                flip = ctab_vmem[pl.ds(base, CLUSTER_SIZE), 11:12]
                back_f = jnp.where(back ^ (flip > 0.5), 1.0, 0.0)
                t_scr[:] = jnp.where(better, slab_min, t_b)
                u_scr[:] = jnp.where(better, pick(u), u_scr[:])
                v_scr[:] = jnp.where(better, pick(v), v_scr[:])
                tri_scr[:] = jnp.where(
                    better, pick(jnp.broadcast_to(tri, tm.shape)),
                    tri_scr[:])
                inst_scr[:] = jnp.where(
                    better, pick(jnp.broadcast_to(inst, tm.shape)),
                    inst_scr[:])
                back_scr[:] = jnp.where(
                    better, pick(jnp.broadcast_to(back_f, tm.shape)),
                    back_scr[:])

            return 0

        jax.lax.fori_loop(0, CLUSTER_GROUP, group_body, 0)

    @pl.when(k == n_k - 1)
    def _():
        out_ref[0:1, :] = t_scr[:]
        out_ref[1:2, :] = u_scr[:]
        out_ref[2:3, :] = v_scr[:]
        out_ref[3:4, :] = tri_scr[:]
        out_ref[4:5, :] = inst_scr[:]
        out_ref[5:6, :] = back_scr[:]


def _clustered_any_kernel(wt, ctab_ref, cmask_ref, gmask_ref, o_ref, d_ref,
                          tmax_ref, tmin_ref, occ_ref, occ_scr, ctab_vmem,
                          dma_sem):
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

    @pl.when(gmask_ref[0, 0, 0, 0] > 0.0)
    def _():
        dma = pltpu.make_async_copy(
            ctab_ref.at[pl.ds(k * CLUSTER_GROUP * CLUSTER_SIZE,
                              CLUSTER_GROUP * CLUSTER_SIZE), :],
            ctab_vmem, dma_sem)
        dma.start()
        dma.wait()

        def group_body(g, _):
            @pl.when(cmask_ref[0, 0, 0, g] > 0.0)
            def _():
                base = pl.multiple_of(g * CLUSTER_SIZE, CLUSTER_SIZE)
                _, _, _, _, ok = _moeller_slab(
                    ctab_vmem, base, ox, oy, oz, dx, dy, dz, t_min, t_max,
                    slab=CLUSTER_SIZE, watertight=wt)
                hit = jnp.any(ok, axis=0, keepdims=True)
                occ_scr[:] = jnp.maximum(occ_scr[:],
                                         jnp.where(hit, 1.0, 0.0))

            return 0

        jax.lax.fori_loop(0, CLUSTER_GROUP, group_body, 0)

    @pl.when(k == n_k - 1)
    def _():
        occ_ref[0:1, :] = occ_scr[:] > 0.5


@functools.partial(jax.jit,
                   static_argnames=("interpret", "watertight"))
def clustered_closest_pallas(scene, origin, direction, t_min=0.0,
                             interpret=False, watertight=False):
    """Closest-hit via the cull + clustered-sweep kernels."""
    o, d, r = _prep_rays(origin, direction)
    rp = o.shape[1]
    ctab, cbox_vec, n_groups = _pad_cluster_tables(scene)
    if interpret:
        # interpret mode: exact per-ray masks (the interval cull is a
        # TPU performance artifact; interpret runs are correctness tests)
        cmask, gmask = _exact_masks(scene, o, d, n_groups)
    else:
        cmask, gmask = _cull_masks((ctab, cbox_vec, n_groups), o, d)
    ray_spec = pl.BlockSpec((3, RAY_BLOCK), lambda i, k: (0, i),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_clustered_closest_kernel, watertight),
        grid=(rp // RAY_BLOCK, n_groups),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, 1, 1, CLUSTER_GROUP),
                         lambda i, k: (i, k, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, 1), lambda i, k: (i, k, 0, 0),
                         memory_space=pltpu.SMEM),
            ray_spec, ray_spec,
            pl.BlockSpec((1, 1), lambda i, k: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((6, RAY_BLOCK), lambda i, k: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((6, rp), F32),
        scratch_shapes=[pltpu.VMEM((1, RAY_BLOCK), F32)] * 6
        + [pltpu.VMEM((CLUSTER_GROUP * CLUSTER_SIZE, 128), F32),
           pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(ctab,
      cmask[:, :n_groups * CLUSTER_GROUP].reshape(
          -1, n_groups, 1, CLUSTER_GROUP),
      gmask.reshape(-1, n_groups, 1, 1), o, d,
      jnp.full((1, 1), t_min, F32))
    t, u, v, tri, inst, back = [out[i, :r] for i in range(6)]
    t = jnp.where(t >= BIG, jnp.inf, t)
    return t, u, v, tri.astype(I32), inst.astype(I32), back > 0.5


@functools.partial(jax.jit,
                   static_argnames=("interpret", "watertight"))
def clustered_any_pallas(scene, origin, direction, t_max, t_min=0.0,
                         interpret=False, watertight=False):
    """Occlusion via the cull + clustered-sweep kernels."""
    o, d, r = _prep_rays(origin, direction)
    rp = o.shape[1]
    tm = jnp.pad(jnp.broadcast_to(jnp.asarray(t_max, F32), (r,)),
                 (0, rp - r))[None, :]
    ctab, cbox_vec, n_groups = _pad_cluster_tables(scene)
    if interpret:
        cmask, gmask = _exact_masks(scene, o, d, n_groups)
    else:
        cmask, gmask = _cull_masks((ctab, cbox_vec, n_groups), o, d)
    ray_spec = pl.BlockSpec((3, RAY_BLOCK), lambda i, k: (0, i),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((1, RAY_BLOCK), lambda i, k: (0, i),
                            memory_space=pltpu.VMEM)
    occ = pl.pallas_call(
        functools.partial(_clustered_any_kernel, watertight),
        grid=(rp // RAY_BLOCK, n_groups),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, 1, 1, CLUSTER_GROUP),
                         lambda i, k: (i, k, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, 1), lambda i, k: (i, k, 0, 0),
                         memory_space=pltpu.SMEM),
            ray_spec, ray_spec, col_spec,
            pl.BlockSpec((1, 1), lambda i, k: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=col_spec,
        out_shape=jax.ShapeDtypeStruct((1, rp), jnp.bool_),
        scratch_shapes=[pltpu.VMEM((1, RAY_BLOCK), F32),
                        pltpu.VMEM((CLUSTER_GROUP * CLUSTER_SIZE, 128),
                                   F32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(ctab,
      cmask[:, :n_groups * CLUSTER_GROUP].reshape(
          -1, n_groups, 1, CLUSTER_GROUP),
      gmask.reshape(-1, n_groups, 1, 1), o, d, tm,
      jnp.full((1, 1), t_min, F32))
    return occ[0, :r]


def _exact_masks(scene, o, d, n_groups):
    """Exact per-block cluster entry masks (XLA; used in interpret mode
    and as the reference for cull soundness tests)."""
    cbox = scene.cluster_bbox
    c = cbox.shape[0]
    cg = n_groups * CLUSTER_GROUP
    n_blocks = o.shape[1] // RAY_BLOCK
    ob = o.reshape(3, n_blocks, RAY_BLOCK)
    db = d.reshape(3, n_blocks, RAY_BLOCK)
    inv = 1.0 / jnp.where(jnp.abs(db) < 1e-30,
                          jnp.where(db >= 0, 1e-30, -1e-30), db)
    # (blocks, RB, C) per axis folded into running min/max
    t_lo = jnp.full((n_blocks, RAY_BLOCK, c), -BIG)
    t_hi = jnp.full((n_blocks, RAY_BLOCK, c), BIG)
    for ax in range(3):
        a = (cbox[None, None, :, ax] - ob[ax][:, :, None]) *             inv[ax][:, :, None]
        b = (cbox[None, None, :, ax + 3] - ob[ax][:, :, None]) *             inv[ax][:, :, None]
        t_lo = jnp.maximum(t_lo, jnp.minimum(a, b))
        t_hi = jnp.minimum(t_hi, jnp.maximum(a, b))
    enter = (t_hi >= t_lo) & (t_hi >= 0.0)
    mask = jnp.any(enter, axis=1).astype(F32)          # (blocks, C)
    mask = jnp.pad(mask, ((0, 0), (0, cg - c)))
    gmask = mask.reshape(n_blocks, n_groups, CLUSTER_GROUP).max(axis=2)
    return mask, gmask

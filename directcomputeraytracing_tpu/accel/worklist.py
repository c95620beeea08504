"""Hierarchical compacted work-list traversal (the TPU fast path).

Re-designs the reference's per-thread stack-based two-level BVH descent
(reference: Shaders/BVHAccel.inc.hlsl:85-232 — front-to-back child
ordering, t_max pruning, small leaf loops) for the TPU vector model as
a three-level hierarchy over ray *bundles*:

  supercluster (SUPER*S tris) -> cluster (S=16 tris) -> triangle

 A. COARSE CULL (Pallas): conservative interval test of each RB-ray
    bundle against every supercluster AABB -> conservative entry
    distance t_lo (BIG = provably missed, or beyond every ray's t_max —
    shadow rays cull everything past the light). The dense plane is
    (bundles x superclusters): ~200 lanes wide even at 10^6 triangles.
 B. COARSE COMPACT (XLA): per bundle, surviving superclusters sort
    front-to-back by t_lo (`lax.sort`, payload carried) and compact
    into (block, super) items via one small cumsum+scatter.
 C. FINE CULL (XLA): for each coarse item, the 64 child cluster AABBs
    are gathered and interval-tested against the bundle's cached
    bounds — O(items x 64), not O(bundles x clusters).
 D. FINE COMPACT (XLA): per item, entered clusters sort front-to-back
    (64-wide rows) and chunk into sweep items of W *arbitrary* entered
    clusters; chunk order inherits the coarse front-to-back order.
 E. SWEEP (Pallas, `PrefetchScalarGridSpec`): grid = one step per sweep
    item. W independent index-mapped views of the cluster table DMA
    exactly the W entered 16-triangle slabs (auto double-buffered), so
    the Moeller batch tests ~W*16 triangles a bundle actually needs
    instead of a whole neighborhood. Items arrive front-to-back, so the
    kernel EARLY-TERMINATES: once every ray's best hit is closer than
    the next chunk's entry distance, remaining steps are ~60 ns no-ops.
    The kernel outputs only (t, world-soup row); barycentrics,
    instance, triangle id and facing are recovered in XLA with two row
    gathers + one Moeller evaluation on the single winning triangle.

Work-item encoding (scalar-prefetched to SMEM):
    blkflags (cap,) i32:  bits[2,16) ray-block; bit1 first-of-run;
                          bit0 valid
    clus     (cap*W,) i32: fine cluster ids (sentinel = zero cluster)
    t_ent    (cap,) f32:  chunk entry distance (front-to-back key)

Capacities are static; a `lax.cond` falls back to the dense
masked-sweep kernel when a dispatch's true work count overflows —
correctness never depends on the capacity heuristics.
"""

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cluster import CLUSTER_SIZE
from .pallas_brute import BIG

F32 = jnp.float32
I32 = jnp.int32

RB = int(_os.environ.get("DCRT_WL_RB", "1024"))      # rays per bundle
WORK_GROUP = int(_os.environ.get("DCRT_WL_W", "4"))  # clusters per item
SUPER = 64                   # fine clusters per supercluster
MAX_COARSE = 16384           # coarse items per dispatch
MAX_CHUNKS = 24576           # sweep items per dispatch (SMEM budget)
SLICE_RAYS = 1 << 20         # larger batches run as lax.map slices so
                             # chunk counts stay inside the SMEM budget
_BLOCK_SHIFT = 2
_BLOCK_MASK = 0x3FFF
_SOUP_COL = 12               # world-soup row column in the cluster table


def _prep_rays_wl(origin, direction):
    """(R, 3) x2 -> one (6, Rpad) [o; d] operand padded to 8 bundles
    (a single fused operand halves per-step index-map DMA bookkeeping
    on the sweep kernel's scalar core)."""
    r = origin.shape[0]
    quantum = 8 * RB
    pad = -(-r // quantum) * quantum - r
    o = jnp.pad(origin, ((0, pad), (0, 0))).T
    d = jnp.pad(direction, ((0, pad), (0, 0))).T
    return jnp.concatenate([o, d], axis=0), r


def _pad_tables(scene):
    """Cluster table + box hierarchy padded to SUPER multiples.

    Returns (ctab (Cpad*S+S, 13) with one trailing all-zero sentinel
    cluster, fine boxes (Cpad, 8) with never-hit padding, super boxes
    transposed (8, Cs_pad) 128-lane padded, Cpad, Cs)."""
    ctab = scene.cluster_tris
    cbox = scene.cluster_bbox
    c = cbox.shape[0]
    cpad = -(-c // SUPER) * SUPER
    if cpad != c:
        ctab = jnp.pad(ctab, ((0, (cpad - c) * CLUSTER_SIZE), (0, 0)))
        pad_rows = jnp.tile(jnp.asarray(
            [[1.0, 1.0, 1.0, -1.0, -1.0, -1.0, 0.0, 0.0]], cbox.dtype),
            (cpad - c, 1))
        cbox = jnp.concatenate([cbox, pad_rows], axis=0)
    # trailing all-zero sentinel cluster: chunk padding lanes point here
    ctab = jnp.pad(ctab, ((0, CLUSTER_SIZE), (0, 0)))
    cs = cpad // SUPER
    grouped = cbox.reshape(cs, SUPER, 8)
    sb_min = jnp.min(grouped[:, :, 0:3], axis=1)
    sb_max = jnp.max(grouped[:, :, 3:6], axis=1)
    # padding sub-boxes are inverted (+1/-1), so empty supers stay
    # inverted -> never entered
    sbox = jnp.concatenate(
        [sb_min, sb_max, jnp.zeros((cs, 2), F32)], axis=1)
    cs_pad = -(-cs // 128) * 128
    if cs_pad != cs:
        pad_rows = jnp.tile(jnp.asarray(
            [[1.0, 1.0, 1.0, -1.0, -1.0, -1.0, 0.0, 0.0]], F32),
            (cs_pad - cs, 1))
        sbox = jnp.concatenate([sbox, pad_rows], axis=0)
    return ctab, cbox, sbox.T, cpad, cs


# ---------------------------------------------------------------------------
# Phase A: bundle-vs-supercluster cull with conservative entry distance
# ---------------------------------------------------------------------------

def _cull_tlo_kernel(sbox_ref, od_ref, tcap_ref, tlo_ref):
    """8 ray bundles x all superclusters -> (8, Cs_pad) conservative
    entry distance (BIG = provably missed or beyond the bundle's t_max
    cap). Vectorized over the 8 bundles on the sublane axis."""
    cpad = sbox_ref.shape[1]

    def bounds(ax):
        rows = od_ref[ax, :, :]                       # (8, RB)
        return (jnp.min(rows, axis=1, keepdims=True),
                jnp.max(rows, axis=1, keepdims=True))  # (8, 1)

    t_lo = jnp.full((8, cpad), -BIG, F32)
    t_hi = jnp.full((8, cpad), BIG, F32)
    for ax in range(3):
        o_lo, o_hi = bounds(ax)
        d_lo, d_hi = bounds(ax + 3)
        b0 = sbox_ref[ax:ax + 1, :]                   # (1, Cs_pad) bmin
        b1 = sbox_ref[ax + 3:ax + 4, :]               # (1, Cs_pad) bmax
        # a direction interval spanning zero constrains nothing for some
        # ray in the bundle -> conservatively unbounded on this axis
        spans = (d_lo <= 0.0) & (d_hi >= 0.0)
        i_a = 1.0 / jnp.where(jnp.abs(d_lo) < 1e-30,
                              jnp.where(d_lo >= 0, 1e-30, -1e-30), d_lo)
        i_b = 1.0 / jnp.where(jnp.abs(d_hi) < 1e-30,
                              jnp.where(d_hi >= 0, 1e-30, -1e-30), d_hi)
        i_lo = jnp.minimum(i_a, i_b)
        i_hi = jnp.maximum(i_a, i_b)
        n0_lo, n0_hi = b0 - o_hi, b0 - o_lo
        n1_lo, n1_hi = b1 - o_hi, b1 - o_lo
        # conservative slab interval: min/max over the products of the
        # numerator x reciprocal interval endpoints, over both planes
        cands = [n0_lo * i_lo, n0_lo * i_hi, n0_hi * i_lo, n0_hi * i_hi,
                 n1_lo * i_lo, n1_lo * i_hi, n1_hi * i_lo, n1_hi * i_hi]
        ax_lo = cands[0]
        ax_hi = cands[0]
        for cd in cands[1:]:
            ax_lo = jnp.minimum(ax_lo, cd)
            ax_hi = jnp.maximum(ax_hi, cd)
        t_lo = jnp.where(spans, t_lo, jnp.maximum(t_lo, ax_lo))
        t_hi = jnp.where(spans, t_hi, jnp.minimum(t_hi, ax_hi))

    enter = (t_hi >= t_lo) & (t_hi >= 0.0) & (t_lo <= tcap_ref[:, 0:1])
    tlo_ref[:, :] = jnp.where(enter, jnp.maximum(t_lo, 0.0), BIG)


def _cull_tlo(sbox_vec, od, t_cap, interpret=False):
    rp = od.shape[1]
    cpad = sbox_vec.shape[1]
    nb = rp // RB
    od3 = od.reshape(6, nb, RB)
    return pl.pallas_call(
        _cull_tlo_kernel,
        grid=(nb // 8,),
        in_specs=[
            pl.BlockSpec(sbox_vec.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, 8, RB), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, cpad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, cpad), F32),
        interpret=interpret,
    )(sbox_vec, od3, t_cap)


def _interval_tlo(bnds, boxes, t_cap):
    """Shared XLA interval cull: bnds (..., 12) per-bundle [o_lo, o_hi,
    d_lo, d_hi] xyz bounds vs boxes (..., 8) -> conservative t_lo
    (broadcasting leading dims)."""
    t_lo = jnp.full(jnp.broadcast_shapes(bnds.shape[:-1],
                                         boxes.shape[:-1]), -BIG, F32)
    t_hi = jnp.full_like(t_lo, BIG)
    for ax in range(3):
        o_lo, o_hi = bnds[..., ax], bnds[..., 3 + ax]
        d_lo, d_hi = bnds[..., 6 + ax], bnds[..., 9 + ax]
        spans = (d_lo <= 0.0) & (d_hi >= 0.0)
        i_a = 1.0 / jnp.where(jnp.abs(d_lo) < 1e-30,
                              jnp.where(d_lo >= 0, 1e-30, -1e-30), d_lo)
        i_b = 1.0 / jnp.where(jnp.abs(d_hi) < 1e-30,
                              jnp.where(d_hi >= 0, 1e-30, -1e-30), d_hi)
        i_lo = jnp.minimum(i_a, i_b)
        i_hi = jnp.maximum(i_a, i_b)
        n0_lo, n0_hi = boxes[..., ax] - o_hi, boxes[..., ax] - o_lo
        n1_lo = boxes[..., 3 + ax] - o_hi
        n1_hi = boxes[..., 3 + ax] - o_lo
        cands = [n0_lo * i_lo, n0_lo * i_hi, n0_hi * i_lo, n0_hi * i_hi,
                 n1_lo * i_lo, n1_lo * i_hi, n1_hi * i_lo, n1_hi * i_hi]
        ax_lo = cands[0]
        ax_hi = cands[0]
        for cd in cands[1:]:
            ax_lo = jnp.minimum(ax_lo, cd)
            ax_hi = jnp.maximum(ax_hi, cd)
        t_lo = jnp.where(spans, t_lo, jnp.maximum(t_lo, ax_lo))
        t_hi = jnp.where(spans, t_hi, jnp.minimum(t_hi, ax_hi))
    enter = (t_hi >= t_lo) & (t_hi >= 0.0) & (t_lo <= t_cap)
    return jnp.where(enter, jnp.maximum(t_lo, 0.0), BIG)


def _bundle_bounds(od):
    """(6, rp) -> (nb, 12) per-bundle [o_lo, o_hi, d_lo, d_hi] bounds."""
    nb = od.shape[1] // RB
    od3 = od.reshape(6, nb, RB)
    lo = jnp.min(od3, axis=2)                          # (6, nb)
    hi = jnp.max(od3, axis=2)
    return jnp.stack([lo[0], lo[1], lo[2], hi[0], hi[1], hi[2],
                      lo[3], lo[4], lo[5], hi[3], hi[4], hi[5]],
                     axis=1)


def _exact_tlo_super(scene, od, t_cap, sbox, cs_pad):
    """Exact per-ray supercluster entry distances folded to bundle
    granularity (interpret mode / cull-soundness oracle)."""
    cs = sbox.shape[0]
    nb = od.shape[1] // RB
    ob = od[0:3].reshape(3, nb, RB)
    db = od[3:6].reshape(3, nb, RB)
    inv = 1.0 / jnp.where(jnp.abs(db) < 1e-30,
                          jnp.where(db >= 0, 1e-30, -1e-30), db)
    t_lo = jnp.full((nb, RB, cs), -BIG)
    t_hi = jnp.full((nb, RB, cs), BIG)
    for ax in range(3):
        a = (sbox[None, None, :, ax] - ob[ax][:, :, None]) * \
            inv[ax][:, :, None]
        b = (sbox[None, None, :, ax + 3] - ob[ax][:, :, None]) * \
            inv[ax][:, :, None]
        t_lo = jnp.maximum(t_lo, jnp.minimum(a, b))
        t_hi = jnp.minimum(t_hi, jnp.maximum(a, b))
    enter = (t_hi >= t_lo) & (t_hi >= 0.0)
    per_ray = jnp.where(enter, jnp.maximum(t_lo, 0.0), BIG)
    tlo = jnp.min(per_ray, axis=1)
    tlo = jnp.where(tlo <= t_cap, tlo, BIG)
    return jnp.pad(tlo, ((0, 0), (0, cs_pad - cs)), constant_values=BIG)


# ---------------------------------------------------------------------------
# Phases B-D: compact coarse items, fine-cull their children, chunk
# ---------------------------------------------------------------------------

def _compact_coarse(tlo_s, cs, cap_s):
    """(nb, Cs_pad) -> (blk (cap_s,), sup (cap_s,), valid, total,
    block_any), per-block front-to-back."""
    nb = tlo_s.shape[0]
    g = tlo_s[:, :cs]
    sup_iota = jax.lax.broadcasted_iota(I32, g.shape, 1)
    g_sorted, sup_sorted = jax.lax.sort(
        (g, sup_iota), dimension=1, num_keys=1)
    gm = g_sorted < BIG
    flat = gm.ravel()
    cum = jnp.cumsum(flat, dtype=I32)
    total = cum[-1]
    pos = jnp.where(flat, cum - 1, cap_s)
    blk_iota = jax.lax.broadcasted_iota(I32, g.shape, 0)
    blk = jnp.full((cap_s,), nb - 1, I32).at[pos].set(
        blk_iota.ravel(), mode="drop")
    sup = jnp.zeros((cap_s,), I32).at[pos].set(
        sup_sorted.ravel(), mode="drop")
    valid = jnp.arange(cap_s) < total
    return blk, sup, valid, total, jnp.any(gm, axis=1)


def _fine_and_chunk(scene_cbox, blk, sup, valid, bnds, t_cap_b, cpad,
                    capacity, sentinel):
    """Fine cull (XLA) + chunking into W-cluster sweep items.

    Returns (blkflags (cap,), clus (cap, W), t_ent (cap,), total)."""
    cap_s = blk.shape[0]
    nb = bnds.shape[0]
    # gather the 64 child boxes + the owning bundle's bounds per item
    child = (sup[:, None] * SUPER
             + jnp.arange(SUPER, dtype=I32)[None, :])       # (cap_s, 64)
    boxes = scene_cbox[jnp.clip(child, 0, cpad - 1)]         # (cap_s,64,8)
    ib = bnds[blk][:, None, :]                               # (cap_s,1,12)
    icap = t_cap_b[blk][:, None]                             # (cap_s, 1)
    tlo = _interval_tlo(ib, boxes, icap)                     # (cap_s, 64)
    tlo = jnp.where(valid[:, None], tlo, BIG)
    # sort children front-to-back; entered become a prefix
    child_srt, tlo_srt = jax.lax.sort(
        (tlo, child), dimension=1, num_keys=1)[::-1]
    entered = tlo_srt < BIG
    n_i = jnp.sum(entered, axis=1, dtype=I32)                # (cap_s,)
    m_i = -(-n_i // WORK_GROUP)                              # chunks/item
    base = jnp.cumsum(m_i, dtype=I32) - m_i                  # exclusive
    total = base[-1] + m_i[-1]
    j = jax.lax.broadcasted_iota(I32, (cap_s, SUPER), 1)
    chunk = jnp.where(entered, base[:, None] + j // WORK_GROUP,
                      capacity)                              # drop lanes
    lane = j % WORK_GROUP
    # clus is flat (capacity*W,) — 2-D scalar-prefetch operands get
    # lane-padded to 128 in SMEM (32x waste)
    clus = jnp.full((capacity * WORK_GROUP,), sentinel, I32).at[
        (chunk * WORK_GROUP + lane).ravel()].set(
        child_srt.ravel(), mode="drop")
    t_ent = jnp.full((capacity,), BIG, F32).at[
        chunk.ravel()].min(tlo_srt.ravel(), mode="drop")
    bf_val = jnp.broadcast_to((blk[:, None] << _BLOCK_SHIFT) | 1,
                              chunk.shape)
    bf = jnp.full((capacity,), (nb - 1) << _BLOCK_SHIFT, I32).at[
        chunk.ravel()].set(bf_val.ravel(), mode="drop")
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), bf[1:] != bf[:-1]])
    first = first & ((bf & 1) == 1)
    blkflags = bf | (first.astype(I32) << 1)
    # a block is "touched" only if it produced at least one chunk — a
    # coarse enter whose 64 children all fail the fine cull must still
    # report misses, not garbage output
    block_any = jnp.zeros((nb,), jnp.bool_).at[
        jnp.clip(blk, 0, nb - 1)].max(m_i > 0, mode="drop")
    return blkflags, clus, t_ent, total, block_any


# ---------------------------------------------------------------------------
# Phase E: work-list sweep with early termination
# ---------------------------------------------------------------------------

def _moeller_rows(tab_ref, ox, oy, oz, dx, dy, dz, t_min, t_max):
    """(S, RB) Moeller-Trumbore for one fine-cluster view."""
    c = lambda i: tab_ref[:, i:i + 1]                 # (S, 1)
    v0x, v0y, v0z = c(0), c(1), c(2)
    v1x, v1y, v1z = c(3), c(4), c(5)
    v2x, v2y, v2z = c(6), c(7), c(8)
    e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
    e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    det_ok = jnp.abs(det) >= 1e-10
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
    tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    ok = (det_ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
          & (t >= t_min) & (t < t_max))
    return t, ok


def _wl_closest_kernel(bf_ref, clus_ref, tent_ref, *refs):
    od_ref, tmin_ref, out_ref = refs[WORK_GROUP:]
    i = pl.program_id(0)
    item = bf_ref[i]
    first = (item & 2) != 0
    # early termination: items arrive front-to-back, so once every ray's
    # best hit is closer than this chunk's conservative entry distance,
    # nothing behind can improve (out_ref reads garbage before the first
    # item — `first` short-circuits that term)
    live = first | (jnp.max(out_ref[0:1, :]) > tent_ref[i])

    @pl.when(((item & 1) == 1) & live)
    def _():
        ox, oy, oz = od_ref[0:1, :], od_ref[1:2, :], od_ref[2:3, :]
        dx, dy, dz = od_ref[3:4, :], od_ref[4:5, :], od_ref[5:6, :]
        t_min = tmin_ref[0, 0]
        rb = od_ref.shape[1]
        rows = jax.lax.broadcasted_iota(I32, (CLUSTER_SIZE, rb), 0)

        t_b = jnp.where(first, jnp.full((1, rb), BIG, F32),
                        out_ref[0:1, :])
        row_b = jnp.where(first, jnp.zeros((1, rb), F32), out_ref[1:2, :])

        for w in range(WORK_GROUP):
            tab = refs[w]
            t, ok = _moeller_rows(tab, ox, oy, oz, dx, dy, dz, t_min, t_b)
            tm = jnp.where(ok, t, BIG)
            slab_min = jnp.min(tm, axis=0, keepdims=True)
            better = slab_min < t_b
            jmin = jnp.min(jnp.where(tm == slab_min, rows, 1 << 30),
                           axis=0, keepdims=True)
            jm = rows == jmin
            soup = tab[:, _SOUP_COL:_SOUP_COL + 1]
            picked = jnp.sum(
                jnp.where(jm, jnp.broadcast_to(soup, tm.shape), 0.0),
                axis=0, keepdims=True)
            t_b = jnp.where(better, slab_min, t_b)
            row_b = jnp.where(better, picked, row_b)

        out_ref[0:1, :] = t_b
        out_ref[1:2, :] = row_b


def _wl_any_kernel(bf_ref, clus_ref, tent_ref, *refs):
    od_ref, tmax_ref, tmin_ref, occ_ref = refs[WORK_GROUP:]
    i = pl.program_id(0)
    item = bf_ref[i]
    first = (item & 2) != 0
    live = first | (jnp.min(occ_ref[0:1, :]) < 0.5)

    @pl.when(((item & 1) == 1) & live)
    def _():
        ox, oy, oz = od_ref[0:1, :], od_ref[1:2, :], od_ref[2:3, :]
        dx, dy, dz = od_ref[3:4, :], od_ref[4:5, :], od_ref[5:6, :]
        t_min = tmin_ref[0, 0]
        t_max = tmax_ref[0:1, :]
        rb = od_ref.shape[1]
        occ = jnp.where(first, jnp.zeros((1, rb), F32), occ_ref[0:1, :])
        for w in range(WORK_GROUP):
            _, ok = _moeller_rows(refs[w], ox, oy, oz, dx, dy, dz,
                                  t_min, t_max)
            occ = jnp.maximum(occ, jnp.where(
                jnp.any(ok, axis=0, keepdims=True), 1.0, 0.0))
        occ_ref[0:1, :] = occ


def _capacities(nb, cs, cpad):
    cap_s = int(min(max(nb * 8, 2048), MAX_COARSE, nb * cs))
    cap = int(min(max(nb * 24, 4096), MAX_CHUNKS, nb * cpad))
    return cap_s, cap


def _mask_untouched(out, block_any, miss_value):
    keep = jnp.repeat(block_any, RB)[None, :]
    return jnp.where(keep, out, miss_value)


def _block_idx(it, i):
    return (it[i] >> _BLOCK_SHIFT) & _BLOCK_MASK


def _phases(scene, od, t_cap_rays, interpret):
    """Phases A-D. t_cap_rays: (1, rp) per-ray t_max or None."""
    ctab, cbox, sbox_vec, cpad, cs = _pad_tables(scene)
    nb = od.shape[1] // RB
    if t_cap_rays is None:
        t_cap_b = jnp.full((nb,), BIG, F32)
    else:
        t_cap_b = jnp.minimum(
            jnp.max(t_cap_rays.reshape(nb, RB), axis=1), BIG)
    cap_s, cap = _capacities(nb, cs, cpad)
    if interpret:
        tlo_s = _exact_tlo_super(scene, od, t_cap_b[:, None],
                                 sbox_vec.T[:cs], sbox_vec.shape[1])
    else:
        tlo_s = _cull_tlo(sbox_vec, od, t_cap_b[:, None])
    blk, sup, valid_s, total_s, _ = _compact_coarse(
        tlo_s, cs, cap_s)
    bnds = _bundle_bounds(od)
    sentinel = cpad                       # the trailing all-zero cluster
    blkflags, clus, t_ent, total, block_any = _fine_and_chunk(
        cbox, blk, sup, valid_s, bnds, t_cap_b, cpad, cap, sentinel)
    fits = (total_s <= cap_s) & (total <= cap)
    return ctab, blkflags, clus, t_ent, fits, block_any, cap


def _ctab_specs(cap):
    """W index-mapped views of the cluster table: each sweep item DMAs
    its W entered 16-triangle slabs independently."""
    def mk(w):
        return pl.BlockSpec(
            (CLUSTER_SIZE, 13),
            lambda i, bf, cl, te, w=w: (cl[i * WORK_GROUP + w], 0),
            memory_space=pltpu.VMEM)

    return [mk(w) for w in range(WORK_GROUP)]


def _slice_rays(origin, direction, extra=None):
    """Pad to a SLICE_RAYS multiple with far-away rays and reshape to
    (k, SLICE_RAYS, ...) for lax.map."""
    r = origin.shape[0]
    k = -(-r // SLICE_RAYS)
    pad = k * SLICE_RAYS - r
    o = jnp.concatenate(
        [origin, jnp.full((pad, 3), 2.0 * BIG ** 0.5, F32)], axis=0)
    d = jnp.concatenate(
        [direction,
         jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], F32), (pad, 1))], axis=0)
    out = (o.reshape(k, SLICE_RAYS, 3), d.reshape(k, SLICE_RAYS, 3))
    if extra is not None:
        e = jnp.concatenate([extra, jnp.zeros((pad,), F32)], axis=0)
        out = out + (e.reshape(k, SLICE_RAYS),)
    return out, r


@functools.partial(jax.jit, static_argnames=("interpret",))
def worklist_closest_pallas(scene, origin, direction, t_min=0.0,
                            interpret=False):
    """Closest-hit via the hierarchical work-list sweep. Returns
    (t, u, v, tri, inst, backface) with t = +inf on miss. Batches over
    SLICE_RAYS run as sequential lax.map slices (one compiled body)."""
    if origin.shape[0] > SLICE_RAYS:
        (os_, ds_), r = _slice_rays(origin, direction)
        outs = jax.lax.map(
            lambda od: _closest_impl(scene, od[0], od[1], t_min,
                                     interpret), (os_, ds_))
        return jax.tree_util.tree_map(
            lambda x: x.reshape(-1, *x.shape[2:])[:r], outs)
    return _closest_impl(scene, origin, direction, t_min, interpret)


def _closest_impl(scene, origin, direction, t_min, interpret):
    od, r = _prep_rays_wl(origin, direction)
    rp = od.shape[1]
    ctab, blkflags, clus, t_ent, fits, block_any, cap = _phases(
        scene, od, None, interpret)
    tmin_arr = jnp.full((1, 1), t_min, F32)

    def wl_path(_):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(cap,),
            in_specs=_ctab_specs(cap) + [
                pl.BlockSpec((6, RB),
                             lambda i, bf, cl, te: (0, _block_idx(bf, i)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i, bf, cl, te: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (2, RB), lambda i, bf, cl, te: (0, _block_idx(bf, i)),
                memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            _wl_closest_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((2, rp), F32),
            interpret=interpret,
        )(blkflags, clus, t_ent, *([ctab] * WORK_GROUP), od, tmin_arr)
        miss = jnp.asarray([BIG, 0], F32)[:, None]
        return (_mask_untouched(out, block_any, miss),
                jnp.zeros((6, rp), F32))

    def fallback(_):
        from .pallas_brute import clustered_closest_pallas

        t, u, v, tri, inst, back = clustered_closest_pallas(
            scene, origin, direction, t_min, interpret=interpret)
        t = jnp.where(jnp.isinf(t), BIG, t)
        packed = jnp.stack([t, u, v, tri.astype(F32), inst.astype(F32),
                            jnp.where(back, 1.0, 0.0)])
        packed = jnp.pad(packed, ((0, 0), (0, rp - r)))
        return packed[:2], packed

    out2, full6 = jax.lax.cond(fits, wl_path, fallback, 0)
    used_fallback = ~fits

    t = out2[0, :r]
    soup = jnp.clip(out2[1, :r].astype(I32), 0,
                    scene.world_tris.shape[0] - 1)

    # POST: recover barycentrics/meta for the winning triangle (world
    # space — the same representation the kernel intersected)
    from .traverse import ray_triangle_moeller

    tv = scene.world_tris[soup]
    meta = scene.world_tri_meta[soup]
    _, u, v, back, _ = ray_triangle_moeller(
        origin, direction, F32(0.0), jnp.inf,
        tv[:, 0:3], tv[:, 3:6], tv[:, 6:9])
    u = jnp.clip(u, 0.0, 1.0)
    v = jnp.clip(v, 0.0, 1.0)
    tri = meta[:, 0].astype(I32)
    inst = meta[:, 1].astype(I32)
    backface = back ^ (meta[:, 2] > 0.5)

    # the fallback kernel already picked full attributes — prefer them
    fb = full6[:, :r]
    t = jnp.where(used_fallback, fb[0], t)
    u = jnp.where(used_fallback, fb[1], u)
    v = jnp.where(used_fallback, fb[2], v)
    tri = jnp.where(used_fallback, fb[3].astype(I32), tri)
    inst = jnp.where(used_fallback, fb[4].astype(I32), inst)
    backface = jnp.where(used_fallback, fb[5] > 0.5, backface)

    hit = t < BIG
    t = jnp.where(hit, t, jnp.inf)
    u = jnp.where(hit, u, 0.0)
    v = jnp.where(hit, v, 0.0)
    tri = jnp.where(hit, tri, 0)
    inst = jnp.where(hit, inst, 0)
    backface = backface & hit
    return t, u, v, tri, inst, backface


@functools.partial(jax.jit, static_argnames=("interpret",))
def worklist_any_pallas(scene, origin, direction, t_max, t_min=0.0,
                        interpret=False):
    """Occlusion query via the hierarchical work-list sweep. The cull is
    t_max-aware: clusters entirely beyond every ray's occlusion range
    are never visited (shadow rays cull past the light)."""
    if origin.shape[0] > SLICE_RAYS:
        tmf = jnp.broadcast_to(jnp.asarray(t_max, F32),
                               (origin.shape[0],))
        (os_, ds_, tms), r = _slice_rays(origin, direction, tmf)
        occ = jax.lax.map(
            lambda odt: _any_impl(scene, odt[0], odt[1], odt[2], t_min,
                                  interpret), (os_, ds_, tms))
        return occ.reshape(-1)[:r]
    return _any_impl(scene, origin, direction, t_max, t_min, interpret)


def _any_impl(scene, origin, direction, t_max, t_min, interpret):
    od, r = _prep_rays_wl(origin, direction)
    rp = od.shape[1]
    tm = jnp.pad(jnp.broadcast_to(jnp.asarray(t_max, F32), (r,)),
                 (0, rp - r))[None, :]
    ctab, blkflags, clus, t_ent, fits, block_any, cap = _phases(
        scene, od, tm, interpret)
    tmin_arr = jnp.full((1, 1), t_min, F32)

    def wl_path(_):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(cap,),
            in_specs=_ctab_specs(cap) + [
                pl.BlockSpec((6, RB),
                             lambda i, bf, cl, te: (0, _block_idx(bf, i)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, RB),
                             lambda i, bf, cl, te: (0, _block_idx(bf, i)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i, bf, cl, te: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, RB), lambda i, bf, cl, te: (0, _block_idx(bf, i)),
                memory_space=pltpu.VMEM),
        )
        occ = pl.pallas_call(
            _wl_any_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, rp), F32),
            interpret=interpret,
        )(blkflags, clus, t_ent, *([ctab] * WORK_GROUP), od, tm,
          tmin_arr)
        return _mask_untouched(occ, block_any, 0.0)

    def fallback(_):
        from .pallas_brute import clustered_any_pallas

        occ = clustered_any_pallas(scene, origin, direction, t_max, t_min,
                                   interpret=interpret)
        return jnp.pad(jnp.where(occ, 1.0, 0.0), (0, rp - r))[None, :]

    occ = jax.lax.cond(fits, wl_path, fallback, 0)
    return occ[0, :r] > 0.5

"""Hierarchical fused cull-and-sweep traversal (the TPU fast path).

Re-designs the reference's per-thread stack-based two-level BVH descent
(reference: Shaders/BVHAccel.inc.hlsl:85-232 — front-to-back child
ordering, t_max pruning, small leaf loops) for the TPU vector model as
a two-phase hierarchy over ray *bundles*:

  supercluster (SUPER*S tris) -> cluster (S=16 tris) -> triangle

 A. COARSE CULL (Pallas): EXACT per-ray slab test of every ray in an
    RB-ray bundle against every supercluster AABB, min-reduced over the
    bundle -> per-(bundle, super) entry distance t_lo (BIG = no ray
    enters, or every entering ray's t_max is closer — shadow rays cull
    everything past the light). Exactness matters: the round-1
    interval-arithmetic bundle cull admitted large false-positive sets.
 B. COARSE COMPACT (XLA): per bundle, surviving superclusters sort
    front-to-back by t_lo (`lax.sort`, payload carried) and compact
    into (block, super) work items via one small cumsum+scatter.
 C. FUSED SWEEP (Pallas, `PrefetchScalarGridSpec`): grid = one step per
    coarse item. Each step DMAs the super's 64 child AABBs and its
    full 64x16-triangle slab via index maps on the scalar-prefetched
    super ids (auto double-buffered). In-kernel:
      1. exact per-ray slab test of all 64 children, pruned against
         each ray's CURRENT best t (true per-ray front-to-back pruning,
         like the reference's t_max test at BVHAccel.inc.hlsl:119) and
         per-ray t_max / occlusion state;
      2. a dynamic-trip-count loop Moeller-sweeps exactly the entered
         16-triangle clusters from the VMEM-resident slab;
      3. the best hit is kept BIT-PACKED as (t & ~0x3FF)|(child<<4)|row
         so a single integer min IS the argmin (replaces the
         masked-pick reduction chain).
    Items arrive front-to-back per block, so the step EARLY-TERMINATES
    (~60 ns) once every ray's best hit is closer than the item's entry
    distance. Best-t is initialised to each ray's scene-bbox EXIT
    distance (not +inf), so rays that miss everything stop blocking
    termination. The kernel outputs only (packed best, winning super);
    t decodes by masking, and barycentrics, instance, triangle id and
    facing are recovered in XLA with one Moeller evaluation on the
    single winning triangle.

Work-item encoding (scalar-prefetched to SMEM):
    blkflags (cap_s,) i32: bits[2,16) ray-block; bit1 first-of-run;
                           bit0 valid
    sup      (cap_s,) i32: supercluster id (index-maps the box + slab
                           DMAs)
    t_ent    (cap_s,) f32: item entry distance (front-to-back key)

Capacities are static; a `lax.cond` falls back to the dense
masked-sweep kernel when a dispatch's true item count overflows —
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
SUPER = 64                   # fine clusters per supercluster
CT = 128                     # supercluster lane tile of the coarse cull
                             # (128 keeps the (RB, CT) slab intermediates
                             # at ~0.5 MB — 256 spilled VMEM at 212k tris)
MAX_COARSE = int(_os.environ.get("DCRT_WL_MAXC", "16384"))  # SMEM budget
SLICE_RAYS = 1 << 20         # larger batches run as lax.map slices so
                             # item counts stay inside the SMEM budget
_BLOCK_SHIFT = 2
_BLOCK_MASK = 0x3FFF
_SOUP_COL = 12               # world-soup row column in the cluster table
_FAR = 2.0 * BIG ** 0.5      # padding-ray origin: misses all geometry


def _prep_rays_wl(origin, direction, t_max=None):
    """(R, 3) x2 [+ per-ray t_max] -> (od (6, Rpad) [o; d] fused sweep
    operand, odt (Rpad, 16) [o|d|t_max|0|inv_d|0*5] rays-on-sublanes
    cull operand, tm (1, Rpad) sweep t_max row, R). The direction
    reciprocals are precomputed here (fused XLA elementwise) because
    (RB, 1)-shaped math inside the cull kernel costs full-plane vregs
    per op. Pads to 8 bundles with far-away zero-range rays that enter
    nothing."""
    r = origin.shape[0]
    quantum = 8 * RB
    pad = -(-r // quantum) * quantum - r
    o = jnp.concatenate([origin, jnp.full((pad, 3), _FAR, F32)], axis=0)
    d = jnp.concatenate(
        [direction, jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], F32),
                             (pad, 1))], axis=0)
    if t_max is None:
        tm = jnp.concatenate([jnp.full((r,), BIG, F32),
                              jnp.zeros((pad,), F32)])
    else:
        tm = jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray(t_max, F32), (r,)),
             jnp.zeros((pad,), F32)])
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-30,
                          jnp.where(d >= 0, 1e-30, -1e-30), d)
    od = jnp.concatenate([o.T, d.T], axis=0)
    rp = r + pad
    odt = jnp.concatenate(
        [o, d, tm[:, None], jnp.zeros((rp, 1), F32), inv,
         jnp.zeros((rp, 5), F32)], axis=1)
    return od, odt, tm[None, :], r


def _pad_tables(scene):
    """Cluster table + box hierarchy padded to SUPER multiples.

    Returns (ctab (Cs*SLAB, 13) triangle slabs, cbox3 (Cs, SUPER, 8)
    child boxes (never-hit padding), sboxv (8, Cs_pad) super boxes
    transposed and lane-padded to a CT multiple, Cpad, Cs)."""
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
    cs = cpad // SUPER
    cbox3 = cbox.reshape(cs, SUPER, 8)
    sb_min = jnp.min(cbox3[:, :, 0:3], axis=1)
    sb_max = jnp.max(cbox3[:, :, 3:6], axis=1)
    # padding sub-boxes are inverted (+1/-1), so empty supers stay
    # inverted -> never entered
    sbox = jnp.concatenate(
        [sb_min, sb_max, jnp.zeros((cs, 2), F32)], axis=1)
    ct = CT if cs > 128 else 128
    cs_pad = -(-cs // ct) * ct
    if cs_pad != cs:
        pad_rows = jnp.tile(jnp.asarray(
            [[1.0, 1.0, 1.0, -1.0, -1.0, -1.0, 0.0, 0.0]], F32),
            (cs_pad - cs, 1))
        sbox = jnp.concatenate([sbox, pad_rows], axis=0)
    return ctab, cbox3, sbox.T, cpad, cs


# ---------------------------------------------------------------------------
# Phase A: exact bundle-vs-supercluster cull
# ---------------------------------------------------------------------------

def _exact_tlo_plane(box_row, odt, n_boxes):
    """Exact slab test of every ray (sublanes) against every box
    (lanes). box_row(ax) -> (1, n) bmin component, box_row(3+ax) bmax;
    odt (RB, 16) [o|d|t_max|0|inv_d|...]. Returns (1, n) per-box min
    entry over entering rays (BIG = no ray enters within its t_max)."""
    rb = odt.shape[0]
    t_lo = jnp.full((rb, n_boxes), -BIG, F32)
    t_hi = jnp.full((rb, n_boxes), BIG, F32)
    for ax in range(3):
        o_c = odt[:, ax:ax + 1]                        # (RB, 1)
        inv = odt[:, 8 + ax:9 + ax]
        a = (box_row(ax) - o_c) * inv                  # (RB, n)
        b = (box_row(3 + ax) - o_c) * inv
        t_lo = jnp.maximum(t_lo, jnp.minimum(a, b))
        t_hi = jnp.minimum(t_hi, jnp.maximum(a, b))
    t_cap = odt[:, 6:7]
    enter = (t_hi >= t_lo) & (t_hi >= 0.0) & (t_lo <= t_cap)
    per_ray = jnp.where(enter, jnp.maximum(t_lo, 0.0), BIG)
    return jnp.min(per_ray, axis=0, keepdims=True)


def _cull_super_kernel(sbox_ref, odt_ref, tlo_ref):
    tlo_ref[0, 0:1, :] = _exact_tlo_plane(
        lambda i: sbox_ref[i:i + 1, :], odt_ref[:, :],
        sbox_ref.shape[1])


def _cull_super(sboxv, odt, interpret=False):
    rp = odt.shape[0]
    nb = rp // RB
    cs_pad = sboxv.shape[1]
    ct = CT if cs_pad > 128 else cs_pad
    out = pl.pallas_call(
        _cull_super_kernel,
        grid=(nb, cs_pad // ct),
        in_specs=[
            pl.BlockSpec((8, ct), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 16), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, ct), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 1, cs_pad), F32),
        interpret=interpret,
    )(sboxv, odt)
    return out[:, 0, :]


def _exact_tlo_super(sboxv, odt):
    """XLA mirror of the coarse cull (test oracle)."""
    nb = odt.shape[0] // RB
    odt3 = odt.reshape(nb, RB, 16)
    rows = jax.vmap(
        lambda o: _exact_tlo_plane(
            lambda i: sboxv[i:i + 1, :], o, sboxv.shape[1]))(odt3)
    return rows[:, 0, :]


# ---------------------------------------------------------------------------
# Phase B: compact coarse items, front-to-back per block
# ---------------------------------------------------------------------------

def _compact_coarse(tlo_s, cs, cap_s):
    """(nb, Cs_pad) -> (blkflags (cap_s,), sup (cap_s,), t_ent (cap_s,),
    total, block_any), per-block front-to-back.

    Compacts FIRST (row-major flatten keeps items block-contiguous),
    then orders within blocks with one two-key sort over the cap_s item
    list — orders of magnitude fewer elements than sorting the full
    (nb, Cs) grid."""
    nb = tlo_s.shape[0]
    g = tlo_s[:, :cs]
    gm = g < BIG
    flat = gm.ravel()
    cum = jnp.cumsum(flat, dtype=I32)
    total = cum[-1]
    pos = jnp.where(flat, cum - 1, cap_s)
    blk_iota = jax.lax.broadcasted_iota(I32, g.shape, 0)
    sup_iota = jax.lax.broadcasted_iota(I32, g.shape, 1)
    blk = jnp.full((cap_s,), nb - 1, I32).at[pos].set(
        blk_iota.ravel(), mode="drop")
    sup = jnp.zeros((cap_s,), I32).at[pos].set(
        sup_iota.ravel(), mode="drop")
    t_ent = jnp.full((cap_s,), BIG, F32).at[pos].set(
        g.ravel(), mode="drop")
    blk, t_ent, sup = jax.lax.sort((blk, t_ent, sup), dimension=0,
                                   num_keys=2)
    valid = jnp.arange(cap_s) < total
    bf = (blk << _BLOCK_SHIFT) | valid.astype(I32)
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), bf[1:] != bf[:-1]])
    first = first & valid
    blkflags = bf | (first.astype(I32) << 1)
    block_any = jnp.any(gm, axis=1)
    return blkflags, sup, t_ent, total, block_any


# ---------------------------------------------------------------------------
# Phase C: fused fine-cull + sweep kernels
# ---------------------------------------------------------------------------

def _fine_enter(cbox_ref, od_ref, cap_row):
    """Exact per-ray slab test of the item's 64 child boxes against the
    bundle, pruned per ray by cap_row (current best t / t_max /
    occlusion state). Returns (64, RB) enter mask."""
    rb = od_ref.shape[1]
    t_lo = jnp.full((SUPER, rb), -BIG, F32)
    t_hi = jnp.full((SUPER, rb), BIG, F32)
    for ax in range(3):
        d_c = od_ref[3 + ax:4 + ax, :]                 # (1, RB)
        inv = 1.0 / jnp.where(jnp.abs(d_c) < 1e-30,
                              jnp.where(d_c >= 0, 1e-30, -1e-30), d_c)
        b0 = cbox_ref[0, :, ax:ax + 1]                 # (64, 1)
        b1 = cbox_ref[0, :, 3 + ax:4 + ax]
        o_c = od_ref[ax:ax + 1, :]
        a = (b0 - o_c) * inv                           # (64, RB)
        b = (b1 - o_c) * inv
        t_lo = jnp.maximum(t_lo, jnp.minimum(a, b))
        t_hi = jnp.minimum(t_hi, jnp.maximum(a, b))
    return (t_hi >= t_lo) & (t_hi >= 0.0) & (t_lo < cap_row)


def _entered(enter):
    """(64, RB) enter mask -> (ent (64,1) bool, n scalar). The sweep
    loop walks entered children by pick-first-and-clear (one min-reduce
    per child) — Mosaic has no vector cumsum."""
    ent = jnp.any(enter, axis=1, keepdims=True)        # (64, 1)
    return ent, jnp.sum(ent.astype(I32))


def _iota64():
    return jax.lax.broadcasted_iota(I32, (SUPER, 1), 0)


_LOW10 = 0x3FF               # packed best-hit low bits: (child<<4)|row


def _moeller_rows(tab, ox, oy, oz, dx, dy, dz, t_min, t_max):
    """(S, RB) Moeller-Trumbore for one 16-triangle cluster slab."""
    c = lambda i: tab[:, i:i + 1]                     # (S, 1)
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


def _wl_closest_kernel(bf_ref, sup_ref, tent_ref, cbox_ref, slab_ref,
                       od_ref, texp_ref, tmin_ref, out_ref, mask_scr):
    i = pl.program_id(0)
    item = bf_ref[i]
    first = (item & 2) != 0
    # early termination: items arrive front-to-back per block, so once
    # every ray's best hit is closer than this item's entry distance,
    # nothing behind can improve (out_ref holds garbage before the
    # block's first item — `first` short-circuits that term).
    # out_ref[0] is the bit-packed best (t | child | row): as f32 it
    # still compares like t (positive floats are bit-monotone).
    live = first | (jnp.max(out_ref[0:1, :]) > tent_ref[i])

    @pl.when(((item & 1) == 1) & live)
    def _():
        ox, oy, oz = od_ref[0:1, :], od_ref[1:2, :], od_ref[2:3, :]
        dx, dy, dz = od_ref[3:4, :], od_ref[4:5, :], od_ref[5:6, :]
        t_min = tmin_ref[0, 0]
        rb = od_ref.shape[1]
        rows = jax.lax.broadcasted_iota(I32, (CLUSTER_SIZE, 1), 0)

        # best starts at the ray's scene-bbox exit (+pad), NOT +inf:
        # rays that miss everything then stop blocking termination.
        # Setting the low id bits makes any true hit at the same
        # truncated t win the integer min.
        @pl.when(first)
        def _():
            texp_bits = jax.lax.bitcast_convert_type(
                texp_ref[0:1, :], I32) | _LOW10
            out_ref[0:1, :] = jax.lax.bitcast_convert_type(
                texp_bits, F32)
            out_ref[1:2, :] = jnp.zeros((1, rb), F32)

        enter = _fine_enter(cbox_ref, od_ref, out_ref[0:1, :])
        ent, n = _entered(enter)
        iota = _iota64()
        # Mosaic legalizes while loops with scalar carries only: the
        # remaining-children mask and best-hit state live in scratch /
        # the output ref, the loop carries just the trip counter
        mask_scr[:, :] = jnp.where(ent, 1.0, 0.0)

        def body(r):
            mask = mask_scr[:, :] > 0.5
            c_r = jnp.min(jnp.where(mask, iota, SUPER))
            mask_scr[:, :] = jnp.where(iota == c_r, 0.0, mask_scr[:, :])
            tab = slab_ref[pl.ds(c_r * CLUSTER_SIZE, CLUSTER_SIZE), :]
            t_b = out_ref[0:1, :]
            t, ok = _moeller_rows(tab, ox, oy, oz, dx, dy, dz, t_min,
                                  t_b)
            # pack (t & ~0x3FF) | (child << 4) | row: the integer min
            # IS the argmin; the ~1e-4-relative t truncation only
            # reorders near-ties, and POST re-intersects the winner
            bits = ((jax.lax.bitcast_convert_type(t, I32) & ~_LOW10)
                    | ((c_r << 4) + rows))
            packed = jnp.min(jnp.where(ok, bits, jnp.int32(0x7FFFFFFF)),
                             axis=0, keepdims=True)
            best = jax.lax.bitcast_convert_type(t_b, I32)
            better = packed < best
            out_ref[0:1, :] = jax.lax.bitcast_convert_type(
                jnp.where(better, packed, best), F32)
            out_ref[1:2, :] = jnp.where(
                better, sup_ref[i].astype(F32), out_ref[1:2, :])
            return r + 1

        jax.lax.while_loop(lambda r: r < n, body, jnp.int32(0))


def _wl_any_kernel(bf_ref, sup_ref, tent_ref, cbox_ref, slab_ref,
                   od_ref, tmax_ref, tmin_ref, occ_ref, mask_scr):
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

        @pl.when(first)
        def _():
            occ_ref[0:1, :] = jnp.zeros((1, rb), F32)

        # occluded rays stop entering anything (per-ray prune)
        cap_row = jnp.where(occ_ref[0:1, :] > 0.5, -BIG, t_max)
        enter = _fine_enter(cbox_ref, od_ref, cap_row)
        ent, n = _entered(enter)
        iota = _iota64()
        mask_scr[:, :] = jnp.where(ent, 1.0, 0.0)

        def body(r):
            mask = mask_scr[:, :] > 0.5
            c_r = jnp.min(jnp.where(mask, iota, SUPER))
            mask_scr[:, :] = jnp.where(iota == c_r, 0.0, mask_scr[:, :])
            tab = slab_ref[pl.ds(c_r * CLUSTER_SIZE, CLUSTER_SIZE), :]
            _, ok = _moeller_rows(tab, ox, oy, oz, dx, dy, dz, t_min,
                                  t_max)
            occ_ref[0:1, :] = jnp.maximum(occ_ref[0:1, :], jnp.where(
                jnp.any(ok, axis=0, keepdims=True), 1.0, 0.0))
            return r + 1

        jax.lax.while_loop(lambda r: r < n, body, jnp.int32(0))


def _capacity(nb, cs):
    return int(min(max(nb * 16, 2048), MAX_COARSE, nb * cs))


def _mask_untouched(out, block_any, miss_value):
    keep = jnp.repeat(block_any, RB)[None, :]
    return jnp.where(keep, out, miss_value)


def _block_idx(it, i):
    return (it[i] >> _BLOCK_SHIFT) & _BLOCK_MASK


def _scene_exit(scene, od):
    """(1, rp) per-ray scene-bbox exit distance (+ pad), 0 = ray misses
    the whole scene. Initialising best-t here (instead of +inf) is what
    lets miss rays participate in early termination."""
    cbox = scene.cluster_bbox
    bmin = jnp.min(cbox[:, 0:3], axis=0)
    bmax = jnp.max(cbox[:, 3:6], axis=0)
    t_lo = jnp.full((od.shape[1],), -BIG, F32)
    t_hi = jnp.full((od.shape[1],), BIG, F32)
    for ax in range(3):
        d_c = od[3 + ax]
        inv = 1.0 / jnp.where(jnp.abs(d_c) < 1e-30,
                              jnp.where(d_c >= 0, 1e-30, -1e-30), d_c)
        a = (bmin[ax] - od[ax]) * inv
        b = (bmax[ax] - od[ax]) * inv
        t_lo = jnp.maximum(t_lo, jnp.minimum(a, b))
        t_hi = jnp.minimum(t_hi, jnp.maximum(a, b))
    tex = jnp.where((t_hi >= t_lo) & (t_hi >= 0.0), t_hi, 0.0)
    # the pad must exceed the packed-argmin truncation quantum
    # (2^-13 relative) so a true hit at the scene-bbox exit still
    # truncates strictly below the miss sentinel
    return (tex * 1.001 + 1e-3)[None, :]


def _phases(scene, od, odt, interpret):
    """Phases A-B: coarse cull + compact."""
    ctab, cbox3, sboxv, cpad, cs = _pad_tables(scene)
    nb = od.shape[1] // RB
    cap_s = _capacity(nb, cs)
    tlo_s = _cull_super(sboxv, odt, interpret=interpret)
    blkflags, sup, t_ent, total_s, block_any = _compact_coarse(
        tlo_s, cs, cap_s)
    fits = total_s <= cap_s
    return ctab, cbox3, blkflags, sup, t_ent, fits, block_any, cap_s


def _sweep_specs(extra_row_specs):
    """Common in_specs for the fused sweep: child boxes + triangle slab
    index-mapped by the item's super id, the block's rays, then
    per-kernel extra (1, RB) rows and the SMEM t_min."""
    return [
        pl.BlockSpec((1, SUPER, 8), lambda i, bf, su, te: (su[i], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((SUPER * CLUSTER_SIZE, 13),
                     lambda i, bf, su, te: (su[i], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((6, RB),
                     lambda i, bf, su, te: (0, _block_idx(bf, i)),
                     memory_space=pltpu.VMEM),
    ] + extra_row_specs + [
        pl.BlockSpec((1, 1), lambda i, bf, su, te: (0, 0),
                     memory_space=pltpu.SMEM),
    ]


def _slice_rays(origin, direction, extra=None):
    """Pad to a SLICE_RAYS multiple with far-away rays and reshape to
    (k, SLICE_RAYS, ...) for lax.map."""
    r = origin.shape[0]
    k = -(-r // SLICE_RAYS)
    pad = k * SLICE_RAYS - r
    o = jnp.concatenate(
        [origin, jnp.full((pad, 3), _FAR, F32)], axis=0)
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
    """Closest-hit via the fused hierarchical sweep. Returns
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
    od, odt, _, r = _prep_rays_wl(origin, direction)
    rp = od.shape[1]
    ctab, cbox3, blkflags, sup, t_ent, fits, block_any, cap_s = _phases(
        scene, od, odt, interpret)
    texp = _scene_exit(scene, od)
    tmin_arr = jnp.full((1, 1), t_min, F32)

    def wl_path(_):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(cap_s,),
            in_specs=_sweep_specs([
                pl.BlockSpec((1, RB),
                             lambda i, bf, su, te: (0, _block_idx(bf, i)),
                             memory_space=pltpu.VMEM),
            ]),
            out_specs=pl.BlockSpec(
                (2, RB), lambda i, bf, su, te: (0, _block_idx(bf, i)),
                memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((SUPER, 1), F32)],
        )
        out = pl.pallas_call(
            _wl_closest_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((2, rp), F32),
            interpret=interpret,
        )(blkflags, sup, t_ent, cbox3, ctab, od, texp, tmin_arr)
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

    # decode the packed winner: t (low bits truncated), child cluster
    # and row -> padded-cluster-table row -> world-soup row
    win = jax.lax.bitcast_convert_type(out2[0, :r], I32)
    t = jax.lax.bitcast_convert_type(win & ~_LOW10, F32)
    # compare truncated-to-truncated: the miss sentinel is texp's
    # packed init, whose decode is trunc(texp)
    texp_trunc = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(texp[0, :r], I32) & ~_LOW10, F32)
    # fallback's plain t values decode to (t & ~0x3FF) <= t: harmless,
    # they are overwritten below
    t = jnp.where(t >= texp_trunc, BIG, t)
    low10 = win & _LOW10
    sup_w = out2[1, :r].astype(I32)
    ctab_row = jnp.clip(
        (sup_w * SUPER + (low10 >> 4)) * CLUSTER_SIZE + (low10 & 0xF),
        0, ctab.shape[0] - 1)
    soup = jnp.clip(ctab[ctab_row, _SOUP_COL].astype(I32), 0,
                    scene.world_tris.shape[0] - 1)

    # POST: recover barycentrics/meta for the winning triangle (world
    # space — the same representation the kernel intersected)
    from .traverse import ray_triangle_moeller

    tv = scene.world_tris[soup]
    meta = scene.world_tri_meta[soup]
    t_m, u, v, back, ok_m = ray_triangle_moeller(
        origin, direction, F32(0.0), jnp.inf,
        tv[:, 0:3], tv[:, 3:6], tv[:, 6:9])
    # the kernel's best t is low-bit truncated (packed argmin); the
    # re-intersection gives the exact value
    t = jnp.where(ok_m & (t < BIG), t_m, t)
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
    """Occlusion query via the fused hierarchical sweep. The cull is
    t_max-aware per ray: clusters beyond a ray's occlusion range are
    never entered by it (shadow rays cull past the light)."""
    if origin.shape[0] > SLICE_RAYS:
        tmf = jnp.broadcast_to(jnp.asarray(t_max, F32),
                               (origin.shape[0],))
        (os_, ds_, tms), r = _slice_rays(origin, direction, tmf)
        occ = jax.lax.map(
            lambda odt_: _any_impl(scene, odt_[0], odt_[1], odt_[2],
                                   t_min, interpret), (os_, ds_, tms))
        return occ.reshape(-1)[:r]
    return _any_impl(scene, origin, direction, t_max, t_min, interpret)


def _any_impl(scene, origin, direction, t_max, t_min, interpret):
    od, odt, tm, r = _prep_rays_wl(origin, direction, t_max=t_max)
    rp = od.shape[1]
    ctab, cbox3, blkflags, sup, t_ent, fits, block_any, cap_s = _phases(
        scene, od, odt, interpret)
    tmin_arr = jnp.full((1, 1), t_min, F32)

    def wl_path(_):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(cap_s,),
            in_specs=_sweep_specs([
                pl.BlockSpec((1, RB),
                             lambda i, bf, su, te: (0, _block_idx(bf, i)),
                             memory_space=pltpu.VMEM),
            ]),
            out_specs=pl.BlockSpec(
                (1, RB), lambda i, bf, su, te: (0, _block_idx(bf, i)),
                memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((SUPER, 1), F32)],
        )
        occ = pl.pallas_call(
            _wl_any_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, rp), F32),
            interpret=interpret,
        )(blkflags, sup, t_ent, cbox3, ctab, od, tm, tmin_arr)
        return _mask_untouched(occ, block_any, 0.0)

    def fallback(_):
        from .pallas_brute import clustered_any_pallas

        occ = clustered_any_pallas(scene, origin, direction, t_max, t_min,
                                   interpret=interpret)
        return jnp.pad(jnp.where(occ, 1.0, 0.0), (0, rp - r))[None, :]

    occ = jax.lax.cond(fits, wl_path, fallback, 0)
    return occ[0, :r] > 0.5

"""Pair-expanded traversal for INCOHERENT ray batches (wavefront pools).

The bundle-synchronous work-list sweep (accel.worklist) pays one full
1024-lane item for every supercluster entered by ANY ray of a bundle.
Coherent camera bundles keep those lanes busy; a sorted-but-bounced
wavefront pool does not — measured occupancy of the bundle sweep on the
1080p stand-in pool is ~1-3% (most lanes' rays never enter the item's
super at all), which is why an incoherent 1024-ray bundle sweeps ~4 ms
of hierarchy regardless of granularity knobs (docs/PERF.md).

This module restructures the SAME hierarchy descent around per-(ray,
super) pairs so every sweep lane holds a ray that actually wants the
triangles being tested (the reference gets this for free from SIMT
per-thread stacks + caches, Shaders/BVHAccel.inc.hlsl:85-232; a TPU
vector lane cannot diverge, so occupancy must be rebuilt by data
movement instead):

 1. phases A-B of accel.worklist produce the (block, super) item list
    (bundle-exact cull, compacted, block-contiguous);
 2. a tiny EMISSION kernel refines each item to a per-ray enter row
    (one slab test of the super's box per lane) -> `eb` (cap_s, RB);
 3. pure-XLA glue assigns every set cell a PAIR SLOT, grouped by super
    and padded per super to RB multiples. No large sorts or scatters:
    one item-scale sort orders items by super, slot ownership inverts
    with a cummax over pair slots, and the set-bit -> lane step is a
    vectorized binary search over per-row prefix sums;
 4. the PAIR SWEEP kernel runs the familiar nearest-first cluster loop
    (same _fine_enter / _isect_rows / packed-argmin machinery) on
    (super, 1024 gathered pairs) items at ~full lane occupancy. Items
    are independent — per-ray front-to-back state across supers is
    replaced by the per-ray window cap (texp / t_cap), which the
    slab-marched pool casts already keep tight;
 5. the per-ray best is reduced WITHOUT scatters: pair results gather
    back onto the emission grid's cells and a segmented running-min
    over each block's contiguous item rows lands the answer on the
    block's last row (log2 shift passes, ~14 x one 64 MB elementwise
    op at pool scale).

Capacity overflows (pair slots or phase items) fall back to the
clustered dense sweep via lax.cond, like the work-list path. Instanced
(BLAS-sharing) scenes are not pair-swept in v1 — the resolver keeps
them on the bundle path.
"""

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cluster import CLUSTER_SIZE
from .pallas_brute import BIG
from .worklist import (RB, SUPER, _BLOCK_SHIFT, _LOWM, _cluster_keys,
                       _fine_enter, _instanced, _iota_sup, _isect_rows,
                       _pad_tables, _pair_tab, _phases, _pick_clusters,
                       _prep_rays_wl, _rows_pair, _scene_exit,
                       _seg_child_ok, _sublane_pad_boxes)

F32 = jnp.float32
I32 = jnp.int32

PAIR_K = int(_os.environ.get("DCRT_PAIR_K", "16"))
# pair-slot budget per ray (static capacity: P_cap = rp * PAIR_K,
# padded-per-super; overflow -> dense fallback)
PAIR_CAPM = int(_os.environ.get("DCRT_PAIR_CAPM", "192"))
# phase items-per-block budget for the pair path: incoherent pool
# blocks enter ~180 supers at 212k tris (experiments/pair_econ.py) —
# far past the bundle path's default 16
_INF32 = jnp.int32(0x7FFFFFFF)


# ---------------------------------------------------------------------------
# Emission: per-(item, ray) super-box enter bits
# ---------------------------------------------------------------------------

def _emit_kernel(bf_ref, sup_ref, sbox_ref, od_ref, cap_ref, tmin_ref,
                 out_ref):
    """One slab test of the item's SUPER box against the block's rays
    -> (1, RB) 0/1 enter row. The enter predicate is the same family as
    the sweep's _fine_enter, with the same per-ray window cap (texp /
    t_cap) and floor, so the emitted pair set is a superset of every
    ray's improving-hit candidates (child boxes are inside the super
    box) and a subset of the bundle-level item set."""
    i = pl.program_id(0)
    valid = (bf_ref[i] & 1) == 1
    rb = od_ref.shape[1]

    @pl.when(valid)
    def _():
        t_lo = jnp.full((1, rb), -BIG, F32)
        t_hi = jnp.full((1, rb), BIG, F32)
        for ax in range(3):
            inv = od_ref[6 + ax:7 + ax, :]
            b0 = sbox_ref[0, 0:1, ax:ax + 1]             # (1, 1)
            b1 = sbox_ref[0, 0:1, 3 + ax:4 + ax]
            o_c = od_ref[ax:ax + 1, :]
            a = (b0 - o_c) * inv
            b = (b1 - o_c) * inv
            t_lo = jnp.maximum(t_lo, jnp.minimum(a, b))
            t_hi = jnp.minimum(t_hi, jnp.maximum(a, b))
        enter = ((t_hi >= t_lo) & (t_hi >= 0.0)
                 & (t_lo < cap_ref[0:1, :]) & (t_hi >= tmin_ref[0, 0]))
        out_ref[0, :, :] = enter.astype(I32)

    @pl.when(~valid)
    def _():
        out_ref[0, :, :] = jnp.zeros((1, rb), I32)


def _emit_pairs(sbox3, blkflags, sup, od, cap_row, t_min, cap_s,
                interpret):
    """(cap_s, RB) i32 enter grid (rows follow the item order)."""
    tmin_arr = jnp.full((1, 1), t_min, F32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(cap_s,),
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda i, bf, su: (su[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, RB),
                         lambda i, bf, su:
                         (0, (bf[i] >> _BLOCK_SHIFT)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RB),
                         lambda i, bf, su:
                         (0, (bf[i] >> _BLOCK_SHIFT)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, bf, su: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, RB), lambda i, bf, su: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _emit_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cap_s, 1, RB), I32),
        interpret=interpret,
    )(blkflags, sup, sbox3, od, cap_row, tmin_arr)
    return out[:, 0, :]


# ---------------------------------------------------------------------------
# XLA glue: pair-slot assignment (super-grouped, RB-padded runs)
# ---------------------------------------------------------------------------

def _cummax(x):
    return jax.lax.associative_scan(jnp.maximum, x)


def _pair_layout(eb, blkflags, sup, cap_s, p_cap):
    """Assign every set cell of `eb` a pair slot. Returns
    (base_row (cap_s,) first-slot of each item row,
     lc (cap_s, RB) inclusive per-row prefix sums,
     sup_pb (p_cap//RB,) per-pair-block super id,
     srow (p_cap,) owning item row per slot, rank (p_cap,) within-item
     pair rank per slot, pvalid (p_cap,) slot holds a real pair,
     fits) — all static shapes; `fits` is the traced capacity check.

    Slots are grouped by super: items sort by super id (ONE item-scale
    sort), runs of equal super pad to RB multiples so each RB-slot
    pair block belongs to exactly one super, and slot ownership is
    recovered with a cummax over slot starts (no pair-scale sort or
    scatter anywhere)."""
    valid = (blkflags & 1) == 1
    lc = jnp.cumsum(eb, axis=1, dtype=I32)               # (cap_s, RB)
    cnt = lc[:, -1]                                      # (cap_s,)

    # --- order items by super (invalid rows last) ---
    key = jnp.where(valid, sup, _INF32)
    iot = jnp.arange(cap_s, dtype=I32)
    key_s, order = jax.lax.sort((key, iot), dimension=0, num_keys=1)
    cnt_s = cnt[order]
    valid_s = key_s < _INF32
    cnt_s = jnp.where(valid_s, cnt_s, 0)

    # --- per-run (equal super) RB-padded bases ---
    first_s = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), key_s[1:] != key_s[:-1]]) & valid_s
    run_id = jnp.cumsum(first_s.astype(I32)) - 1         # (cap_s,)
    run_tot = jnp.zeros((cap_s,), I32).at[
        jnp.where(valid_s, run_id, cap_s)].add(cnt_s, mode="drop")
    run_pad = ((run_tot + RB - 1) // RB) * RB
    run_base = jnp.cumsum(run_pad) - run_pad             # exclusive
    c = jnp.cumsum(cnt_s)
    run_c0 = _cummax(jnp.where(first_s, c - cnt_s, -1))
    base_s = run_base[jnp.clip(run_id, 0, cap_s - 1)] + (c - cnt_s) - run_c0
    p_total = jnp.sum(run_pad)
    fits = p_total <= p_cap

    # --- scatter small per-item results back to row order ---
    base_row = jnp.zeros((cap_s,), I32).at[order].set(base_s)

    # --- per-pair-block super id: run starts, forward-filled (sorted
    # supers are ascending so cummax IS the fill) ---
    npb = p_cap // RB
    rb_row = run_base[jnp.clip(run_id, 0, cap_s - 1)]    # per sorted row
    sup_pb = jnp.full((npb,), -1, I32).at[
        jnp.where(first_s, jnp.clip(rb_row // RB, 0, npb - 1), npb)
    ].max(key_s, mode="drop")
    sup_pb = jnp.clip(_cummax(sup_pb), 0, None)
    # pair blocks past the real total carry only dead lanes: mark them
    # -1 so the sweep kernels skip their DMA + fine cull entirely
    # (their output is garbage that the reduction never gathers)
    sup_pb = jnp.where(
        jnp.arange(npb, dtype=I32) * RB < p_total, sup_pb, -1)

    # --- slot ownership: item start positions -> cummax fill ---
    starts = jnp.full((p_cap,), -1, I32).at[
        jnp.where(valid_s & (cnt_s > 0), base_s, p_cap)
    ].max(iot, mode="drop")                              # sorted pos
    spos = _cummax(starts)                               # (p_cap,)
    spos_c = jnp.clip(spos, 0, cap_s - 1)
    rank = jnp.arange(p_cap, dtype=I32) - base_s[spos_c]
    pvalid = (spos >= 0) & (rank >= 0) & (rank < cnt_s[spos_c])
    srow = order[spos_c]                                 # item row id
    return base_row, lc, sup_pb, srow, rank, pvalid, fits


def _find_lane(lc, srow, rank, pvalid):
    """Per pair slot, the lane index of its rank-th set bit in row
    `srow`: largest l with (#set bits in [0, l)) <= rank, by a
    vectorized binary search over the row's inclusive prefix sums
    (log2(RB) gather rounds over the flat grid)."""
    flat = lc.reshape(-1)
    row0 = srow * RB
    lane = jnp.zeros_like(rank)
    b = RB // 2
    while b >= 1:
        mid = lane + b
        pe = flat[jnp.clip(row0 + mid - 1, 0, flat.shape[0] - 1)]
        lane = jnp.where(pe <= rank, mid, lane)
        b //= 2
    return jnp.clip(lane, 0, RB - 1)


def _seg_scan(x, blk_row, op, init):
    """Segmented running-`op` down the item rows (axis 0), segments =
    equal blk_row runs (items are block-contiguous). After the scan,
    each block's LAST row holds the block's full reduction."""
    n = x.shape[0]
    s = 1
    while s < n:
        same = jnp.concatenate(
            [jnp.zeros((s,), jnp.bool_), blk_row[s:] == blk_row[:-s]])
        shifted = jnp.concatenate(
            [jnp.full((s,) + x.shape[1:], init, x.dtype), x[:-s]],
            axis=0)
        x = op(x, jnp.where(same[:, None], shifted, init))
        s *= 2
    return x


def _block_rows(blkflags, cap_s, nb):
    """(blk_row, end mask, per-block end-row index) for the segmented
    reduction. Invalid items park on a virtual block `nb` so they never
    terminate a real block's run."""
    valid = (blkflags & 1) == 1
    blk_row = jnp.where(valid, blkflags >> _BLOCK_SHIFT, nb)
    nxt = jnp.concatenate([blk_row[1:], jnp.full((1,), -1, I32)])
    is_end = valid & (nxt != blk_row)
    end_row = jnp.full((nb,), -1, I32).at[
        jnp.where(is_end, jnp.clip(blk_row, 0, nb - 1), nb)
    ].max(jnp.arange(cap_s, dtype=I32), mode="drop")
    return blk_row, end_row


# ---------------------------------------------------------------------------
# Pair sweep kernels
# ---------------------------------------------------------------------------

def _pair_closest_kernel(wt, spb_ref, cbox_ref, slab_ref, prt_ref,
                         tmin_ref, out_ref, mask_scr):
    """Nearest-first cluster sweep of ONE super against 1024 gathered
    pairs (each lane a different ray that entered this super). Same
    packed-argmin machinery as worklist._wl_closest_kernel, minus the
    cross-item state: pair blocks are independent, the per-lane window
    cap (texp / t_cap, prt row 9) replaces the evolving best-t prune
    across supers."""
    i = pl.program_id(0)
    rt = prt_ref[:, :].T                                 # (16, RB)
    od = rt[0:9, :]
    cap0 = rt[9:10, :]
    t_min = tmin_ref[0, 0]
    rb = rt.shape[1]
    rows, rowmod = _rows_pair()

    cap_bits = jax.lax.bitcast_convert_type(cap0, I32) | _LOWM
    out_ref[0:1, :] = jax.lax.bitcast_convert_type(cap_bits, F32)
    out_ref[1:2, :] = cap0
    for j in range(2, 8):
        out_ref[j:j + 1, :] = jnp.zeros((1, rb), F32)

    enter, t_lo = _fine_enter(cbox_ref, od, out_ref[0:1, :],
                              floor=t_min)
    iota = _iota_sup()
    keys, n = _cluster_keys(enter, t_lo, iota)
    # pair blocks past the real pair total are all-dead capacity
    # padding (sup_pb = -1): skip their sweep loop outright
    n = jnp.where(spb_ref[i] >= 0, n, 0)
    mask_scr[:, :] = keys
    ox, oy, oz = od[0:1, :], od[1:2, :], od[2:3, :]
    dx, dy, dz = od[3:4, :], od[4:5, :], od[5:6, :]

    def cond(c):
        return (c[0] < n) & (c[1] == 0)

    def body(c):
        r, _ = c
        cs_, vs_, k_1 = _pick_clusters(mask_scr, iota)
        bnd = jnp.max(jax.lax.bitcast_convert_type(out_ref[0:1, :], I32))
        stop = (k_1 & ~_LOWM) >= bnd

        @pl.when(~stop)
        def _():
            tab = _pair_tab(slab_ref, cs_)
            t_b = out_ref[0:1, :]
            t, u, v, back, ok = _isect_rows(
                tab, ox, oy, oz, dx, dy, dz, t_min, t_b, watertight=wt)
            child, okv = _seg_child_ok(rows, cs_, vs_)
            if okv is not None:
                ok = ok & okv
            bits = ((jax.lax.bitcast_convert_type(t, I32) & ~_LOWM)
                    | ((child << 4) + rowmod))
            cand = jnp.where(ok, bits, jnp.int32(0x7FFFFFFF))
            pmin = jnp.min(cand, axis=0, keepdims=True)
            best = jax.lax.bitcast_convert_type(t_b, I32)
            better = pmin < best
            win = cand == pmin

            def pick(x):
                return jnp.sum(jnp.where(win, x, 0.0), axis=0,
                               keepdims=True)

            def sel(j, x):
                out_ref[j:j + 1, :] = jnp.where(better, pick(x),
                                                out_ref[j:j + 1, :])

            out_ref[0:1, :] = jax.lax.bitcast_convert_type(
                jnp.where(better, pmin, best), F32)
            mc = 9 if wt else 12
            sel(1, jnp.broadcast_to(t, cand.shape))
            sel(2, jnp.broadcast_to(u, cand.shape))
            sel(3, jnp.broadcast_to(v, cand.shape))
            sel(4, jnp.broadcast_to(tab[:, mc:mc + 1], cand.shape))
            sel(5, jnp.broadcast_to(tab[:, mc + 1:mc + 2], cand.shape))
            flipped = back ^ (tab[:, mc + 2:mc + 3] > 0.5)
            sel(6, jnp.where(flipped, 1.0, 0.0))
            swept = sum(jnp.where(vv, 1.0, 0.0) for vv in vs_)
            out_ref[7:8, :] = out_ref[7:8, :] + swept

        return r + len(cs_), stop.astype(I32)

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))


def _pair_any_kernel(wt, spb_ref, cbox_ref, slab_ref, prt_ref,
                     tmin_ref, occ_ref, mask_scr):
    """Occlusion sweep of one super against 1024 gathered pairs; the
    per-lane window (prt row 9) is each pair's ray t_max."""
    rt = prt_ref[:, :].T
    od = rt[0:9, :]
    t_max = rt[9:10, :]
    t_min = tmin_ref[0, 0]
    rb = rt.shape[1]
    occ_ref[0:1, :] = jnp.zeros((1, rb), F32)
    enter, t_lo = _fine_enter(cbox_ref, od, t_max, floor=t_min)
    iota = _iota_sup()
    keys, n = _cluster_keys(enter, t_lo, iota)
    n = jnp.where(spb_ref[pl.program_id(0)] >= 0, n, 0)
    mask_scr[:, :] = keys
    ox, oy, oz = od[0:1, :], od[1:2, :], od[2:3, :]
    dx, dy, dz = od[3:4, :], od[4:5, :], od[5:6, :]
    rows, _ = _rows_pair()

    def cond(c):
        return (c[0] < n) & (c[1] == 0)

    def body(c):
        r, _ = c
        cs_, vs_, _k1 = _pick_clusters(mask_scr, iota)
        tab = _pair_tab(slab_ref, cs_)
        cap_row = jnp.where(occ_ref[0:1, :] > 0.5, -BIG, t_max)
        _, _, _, _, ok = _isect_rows(
            tab, ox, oy, oz, dx, dy, dz, t_min, cap_row, watertight=wt)
        _, okv = _seg_child_ok(rows, cs_, vs_)
        if okv is not None:
            ok = ok & okv
        occ_ref[0:1, :] = jnp.maximum(occ_ref[0:1, :], jnp.where(
            jnp.any(ok, axis=0, keepdims=True), 1.0, 0.0))
        all_occ = jnp.min(occ_ref[0:1, :]) > 0.5
        return r + len(cs_), all_occ.astype(I32)

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))


def _run_pair_sweep(kernel, nout, sup_pb, cbox3, ctab, prt, t_min,
                    p_cap, sw, interpret):
    npb = p_cap // RB
    tmin_arr = jnp.full((1, 1), t_min, F32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(npb,),
        in_specs=[
            # dead capacity-padding blocks carry spb = -1: clamp the
            # DMA index (their lanes are parked; the kernel skips them)
            pl.BlockSpec((1, SUPER, 8),
                         lambda i, spb: (jnp.maximum(spb[i], 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUPER * CLUSTER_SIZE, sw),
                         lambda i, spb: (jnp.maximum(spb[i], 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 16), lambda i, spb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, spb: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((nout, RB), lambda i, spb: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((SUPER, 1), I32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nout, p_cap), F32),
        interpret=interpret,
    )(sup_pb, cbox3, ctab, prt, tmin_arr)


# ---------------------------------------------------------------------------
# Public casts
# ---------------------------------------------------------------------------

def _pair_prep(scene, origin, direction, t_min, t_cap, interpret,
               t_max=None):
    """Shared pipeline up to the assembled pair-ray table. Returns
    (od, tm, r, rp, texp, cap_row, phase outs..., pair layout...,
    prt, fits)."""
    od, tm, r = _prep_rays_wl(origin, direction, t_max=t_max)
    rp = od.shape[1]
    nb = rp // RB
    texp = _scene_exit(scene, od)
    if t_cap is not None:
        capp = jnp.asarray(t_cap, F32) * 1.001 + 1e-3
        if capp.ndim == 1:
            capp = jnp.pad(capp, (0, rp - r))[None, :]
        texp = jnp.minimum(texp, capp)
        tm = jnp.minimum(tm, capp)
    # closest casts window on texp; any casts window on the per-ray
    # t_max row itself
    cap_row = texp if t_max is None else tm
    tabs, cbox3, blkflags, sup, t_ent, fits, block_any, cap_s = _phases(
        scene, od, tm, interpret, cap_mult=PAIR_CAPM)

    # super boxes for the emission kernel (world-soup tables)
    _tabs2, _cb3, sboxv, _cpad, cs, _hyper = _pad_tables(scene)
    sbox3 = sboxv[:, None, :]                            # (cs_pad, 1, 8)

    p_cap = _p_cap(rp)
    eb = _emit_pairs(sbox3, blkflags, sup, od, cap_row, t_min, cap_s,
                     interpret=interpret)
    valid_items = (blkflags & 1) == 1
    eb = jnp.where(valid_items[:, None], eb, 0)
    base_row, lc, sup_pb, srow, rank, pvalid, fits_p = _pair_layout(
        eb, blkflags, sup, cap_s, p_cap)
    lane = _find_lane(lc, srow, rank, pvalid)
    blk_of_row = blkflags >> _BLOCK_SHIFT
    ray = jnp.clip(blk_of_row[srow], 0, nb - 1) * RB + lane

    # pair-ray table (p_cap, 16): [o, d, inv, window, spare]
    src = jnp.concatenate(
        [od, cap_row, jnp.zeros((6, rp), F32)], axis=0).T  # (rp, 16)
    prt = src[jnp.where(pvalid, ray, 0)]
    # dead slots (run padding / out of range): window -BIG enters
    # nothing in the sweep
    prt = prt.at[:, 9].set(jnp.where(pvalid, prt[:, 9], -BIG))
    return (od, tm, r, rp, nb, texp, tabs, cbox3, blkflags, sup,
            fits & fits_p, block_any, cap_s, eb, base_row, lc, sup_pb,
            prt, p_cap, ray, pvalid)


def _p_cap(rp):
    return rp * PAIR_K


@functools.partial(jax.jit, static_argnames=("interpret", "watertight"))
def pair_closest_pallas(scene, origin, direction, t_min=0.0,
                        interpret=False, watertight=False, t_cap=None):
    """Closest-hit via the pair-expanded sweep — same contract as
    worklist_closest_pallas ((t, u, v, tri, inst, backface, iters) with
    iters = clusters swept FOR THE RAY'S OWN PAIRS, a tighter
    production-cost counter than the bundle path's per-block figure).
    Built for incoherent pools; capacity overflow or instanced scenes
    fall back to the dense clustered sweep. interpret=True runs the
    Pallas kernels in interpret mode (tests)."""
    assert not _instanced(scene), \
        "pair sweep v1 requires world-soup tables (non-instanced)"
    return _pair_closest_impl(scene, origin, direction, t_min,
                              interpret, watertight, t_cap)


def _pair_closest_impl(scene, origin, direction, t_min, interpret,
                       watertight, t_cap):
    (od, tm, r, rp, nb, texp, tabs, cbox3, blkflags, sup, fits,
     block_any, cap_s, eb, base_row, lc, sup_pb, prt, p_cap, ray,
     pvalid) = _pair_prep(scene, origin, direction, t_min, t_cap,
                          interpret)
    ctab = tabs[0] if watertight else tabs[1]
    sw = 13 if watertight else 16

    def pair_path(_):
        out = _run_pair_sweep(
            functools.partial(_pair_closest_kernel, watertight), 8,
            sup_pb, cbox3, ctab, prt, t_min, p_cap, sw, interpret)
        # gather pair results back onto the emission grid and reduce
        # per block row-run (segmented running-min; each block's last
        # row ends with the block's per-ray minimum)
        pk = jax.lax.bitcast_convert_type(out[0], I32)   # (p_cap,)
        pgrid = base_row[:, None] + lc - 1               # (cap_s, RB)
        cell = eb == 1
        pg_c = jnp.clip(pgrid, 0, p_cap - 1)
        g = jnp.where(cell, pk[pg_c], _INF32)
        blk_row, end_row = _block_rows(blkflags, cap_s, nb)
        has = (end_row >= 0)[:, None]
        er_c = jnp.clip(end_row, 0, cap_s - 1)
        gmin = _seg_scan(g, blk_row, jnp.minimum, _INF32)
        best = jnp.where(has, gmin[er_c], _INF32)        # (nb, RB)
        # rays with no pairs (or no items in the whole block) reduce to
        # the int32 sentinel, whose decode is a NaN — clamp with the
        # per-ray miss sentinel (cap-packed, the kernels' own init;
        # every real pair result is <= it, so the clamp is lossless)
        cap_pk = (jax.lax.bitcast_convert_type(texp[0], I32)
                  | _LOWM).reshape(nb, RB)
        best = jnp.minimum(best, cap_pk)
        # winning pair slot: first cell matching the block best
        bcell = best[jnp.clip(blk_row, 0, nb - 1)]       # (cap_s, RB)
        wp = jnp.where(cell & (g == bcell) & (bcell < _INF32), pgrid,
                       p_cap)
        wmin = _seg_scan(wp, blk_row, jnp.minimum, p_cap)
        pwin = jnp.where(has, wmin[er_c], 0)
        pwin_c = jnp.clip(pwin, 0, p_cap - 1)
        attrs = out[1:8][:, pwin_c.reshape(-1)]          # (7, rp)
        # per-ray swept-cluster counter: sum of row 7 over the ray's
        # own pairs (segmented running-sum)
        it_g = jnp.where(cell, out[7][pg_c], 0.0)
        isum = _seg_scan(it_g, blk_row, jnp.add, F32(0.0))
        iters = jnp.where(has, isum[er_c], 0.0)
        packed_best = jax.lax.bitcast_convert_type(
            best.reshape(-1), F32)
        return jnp.concatenate(
            [packed_best[None, :], attrs,
             iters.reshape(-1)[None, :]], axis=0)        # (9, rp)

    def fallback(_):
        from .pallas_brute import clustered_closest_pallas

        t, u, v, tri, inst, back = clustered_closest_pallas(
            scene, origin, direction, t_min, interpret=interpret,
            watertight=watertight)
        t = jnp.where(jnp.isinf(t), BIG, t)
        packed = jnp.stack([t, t, u, v, tri.astype(F32),
                            inst.astype(F32),
                            jnp.where(back, 1.0, 0.0),
                            jnp.zeros_like(t), jnp.zeros_like(t)])
        return jnp.pad(packed, ((0, 0), (0, rp - r)))

    out9 = jax.lax.cond(fits, pair_path, fallback, 0)

    win = jax.lax.bitcast_convert_type(out9[0, :r], I32)
    t_dec = jax.lax.bitcast_convert_type(win & ~_LOWM, F32)
    texp_trunc = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(texp[0, :r], I32) & ~_LOWM, F32)
    t = jnp.where(t_dec >= texp_trunc, BIG, out9[1, :r])
    u = jnp.clip(out9[2, :r], 0.0, 1.0)
    v = jnp.clip(out9[3, :r], 0.0, 1.0)
    tri = out9[4, :r].astype(I32)
    inst = out9[5, :r].astype(I32)
    backface = out9[6, :r] > 0.5
    iters = out9[8, :r].astype(I32)

    hit = t < BIG
    t = jnp.where(hit, t, jnp.inf)
    u = jnp.where(hit, u, 0.0)
    v = jnp.where(hit, v, 0.0)
    tri = jnp.where(hit, tri, 0)
    inst = jnp.where(hit, inst, 0)
    backface = backface & hit
    return t, u, v, tri, inst, backface, iters


@functools.partial(jax.jit, static_argnames=("interpret", "watertight"))
def pair_any_pallas(scene, origin, direction, t_max, t_min=0.0,
                    interpret=False, watertight=False):
    """Occlusion query via the pair-expanded sweep (see
    pair_closest_pallas). The emission window is each ray's t_max, so
    shadow pairs never include supers past the light."""
    assert not _instanced(scene), \
        "pair sweep v1 requires world-soup tables (non-instanced)"
    (od, tm, r, rp, nb, texp, tabs, cbox3, blkflags, sup, fits,
     block_any, cap_s, eb, base_row, lc, sup_pb, prt, p_cap, ray,
     pvalid) = _pair_prep(scene, origin, direction, t_min, None,
                          interpret, t_max=t_max)
    ctab = tabs[0] if watertight else tabs[1]
    sw = 13 if watertight else 16

    def pair_path(_):
        occ = _run_pair_sweep(
            functools.partial(_pair_any_kernel, watertight), 1,
            sup_pb, cbox3, ctab, prt, t_min, p_cap, sw, interpret)
        pgrid = base_row[:, None] + lc - 1
        cell = eb == 1
        g = jnp.where(cell, occ[0][jnp.clip(pgrid, 0, p_cap - 1)], 0.0)
        blk_row, end_row = _block_rows(blkflags, cap_s, nb)
        gmax = _seg_scan(g, blk_row, jnp.maximum, F32(0.0))
        res = jnp.where((end_row >= 0)[:, None],
                        gmax[jnp.clip(end_row, 0, cap_s - 1)], 0.0)
        return res.reshape(-1)[None, :]

    def fallback(_):
        from .pallas_brute import clustered_any_pallas

        occ = clustered_any_pallas(scene, origin, direction, t_max,
                                   t_min, interpret=interpret,
                                   watertight=watertight)
        return jnp.pad(jnp.where(occ, 1.0, 0.0), (0, rp - r))[None, :]

    occ = jax.lax.cond(fits, pair_path, fallback, 0)
    return occ[0, :r] > 0.5

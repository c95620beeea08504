"""Hierarchical work-list traversal (the TPU fast path).

Re-designs the reference's per-thread stack-based two-level BVH descent
(reference: Shaders/BVHAccel.inc.hlsl:85-232 — front-to-back child
ordering, t_max pruning, small leaf loops) for the TPU vector model as
a bundle-synchronous descent over ray *bundles*:

  hypercluster (adaptive fan-out) -> supercluster (SUPER clusters)
      -> cluster (16 tris) -> triangle

 A. TOP CULL (Pallas, dense): EXACT per-ray slab test of every ray in
    an RB-ray bundle against every top-level AABB (hyperclusters for
    large scenes, superclusters for small), min-reduced over the
    bundle -> per-(bundle, box) entry distance t_lo (BIG = no ray
    enters, or every entering ray's t_max is closer — shadow rays cull
    everything past the light). Exactness matters: the round-1
    interval-arithmetic bundle cull admitted large false-positive sets.
 B. REFINE + COMPACT: surviving (block, hyper) pairs compact into work
    items via one cumsum+scatter (`_compact_pairs`); `_refine_kernel`
    culls each item's member supers exactly (boxes on sublanes, rays
    on lanes — full 128-lane vregs), and `_expand_level` scatters the
    surviving (block, super) items. The super item list is ordered
    per-block front-to-back by ONE two-key sort over the item list
    (orders of magnitude cheaper than sorting the full cull grid).
 C. FUSED SWEEP (Pallas, `PrefetchScalarGridSpec`): grid = one step
    per (block, super) item. Each step DMAs the super's child AABBs
    and its SUPERx16-triangle slab via index maps on the
    scalar-prefetched super ids (auto double-buffered). In-kernel:
      1. exact per-ray slab test of the SUPER children, pruned against
         each ray's CURRENT best t (the per-ray front-to-back pruning
         the reference gets from its t_max test; expanding clusters
         breadth-first WITHOUT this evolving prune measured 8x worse —
         most clusters a ray's line pierces are behind its first hit);
      2. a dynamic-trip-count loop sweeps the entered 16-triangle
         clusters NEAREST-FIRST (the pick key bit-packs each cluster's
         bundle entry distance with its id, so one integer min is
         "nearest remaining") from the VMEM-resident slab, running
         Baldwin-Weber on precomputed transform rows (~40 VPU ops vs
         Moeller's ~60; watertight mode keeps PBRT permute+shear on
         the raw-vertex slab); the loop BREAKS once the nearest
         remaining cluster's entry lies beyond every ray's current
         best;
      3. the best hit is BIT-PACKED as (t & ~_LOWM)|(child<<4)|row so
         one integer min IS the argmin, and the winner's EXACT
         t/u/v/triangle/instance/facing are picked in-kernel by masked
         sums (replacing three 1M-row HBM gathers in the old
         post-pass, ~4x);
      4. items arrive front-to-back per block and the early-
         termination bound lives in an SMEM scalar refreshed only when
         a body runs, so skipped items cost a scalar compare. Best-t
         starts at each ray's scene-bbox EXIT distance (not +inf), so
         rays that miss everything stop blocking termination.

Work-item encoding (scalar-prefetched to SMEM):
    blkflags (cap,) i32: bits[2,16) ray-block; bit1 first-of-run;
                         bit0 valid
    sup      (cap,) i32: supercluster id (index-maps the box+slab DMA)
    t_ent    (cap,) f32: item entry distance (front-to-back key)

Rays must arrive in compact-frustum order (square pixel tiles): a
raster-order 1024-ray bundle spans the image and measured ~10x slower.
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
SUPER = int(_os.environ.get("DCRT_WL_SUPER", "32"))  # clusters / super
HIER_MIN = 192               # supers above which phase A goes
                             # hyper -> super hierarchical; the hyper
                             # fan-out adapts so the dense hyper cull
                             # stays at 64-128 lanes (_hyper_fanout)
MAX_COARSE = int(_os.environ.get("DCRT_WL_MAXC", "49152"))  # SMEM budget
MAX_HYPER = int(_os.environ.get("DCRT_WL_MAXH", "16384"))
                             # (block, hyper) refine items per dispatch
PAIR = int(_os.environ.get("DCRT_WL_PAIR", "2"))
# one-shot per-item re-key of the remaining cluster worklist against
# the tightened per-ray best-t (closest kernel; see body comment)
_REKEY = _os.environ.get("DCRT_WL_REKEY", "0") == "1"
# per-128-lane-group gating of the bundle closest sweep (shared
# worklist, groups whose best-t bound beats a cluster's entry skip its
# vector work; see _wl_closest_kernel)
_GG = _os.environ.get("DCRT_WL_GG", "0") == "1"
# gate the pack+argmin+selection phase on any in-window candidate
_TSKIP = _os.environ.get("DCRT_WL_TSKIP", "0") == "1"
                             # clusters fused per sweep iteration (1|2)
CAPM = int(_os.environ.get("DCRT_WL_CAPM", "16"))
                             # sweep items per block (capacity budget)
GL = 128                     # lanes per sweep group (one vreg lane tile)
GN = RB // GL                # groups per bundle (grouped sweep kernels)
GROUP_CAPM = int(_os.environ.get("DCRT_WLG_CAPM", "192"))
                             # grouped-sweep items per block: incoherent
                             # pool bundles enter ~180 supers at 212k
                             # tris (experiments/pair_econ.py), so the
                             # grouped path budgets like the pair sweep
_NOSEL = _os.environ.get("DCRT_WL_DEBUG_NOSEL") == "1"
                             # diagnostic: skip winner-attribute
                             # selection (WRONG results; isolates the
                             # sel-chain share of sweep time)
_PREP_ENV = _os.environ.get("DCRT_WL_PREP", "")
                             # "xla" forces the XLA concat+transpose
                             # ray prep (A/B against the Pallas kernel)
SLICE_RAYS = 1 << int(_os.environ.get("DCRT_WL_SLICE_LOG2", "20"))
                             # larger batches run as lax.map slices so
                             # item counts stay inside the SMEM budget
_BLOCK_SHIFT = 2
_BLOCK_MASK = 0x3FFF
_SOUP_COL = 12               # world-soup row column in the cluster table
_FAR = 2.0 * BIG ** 0.5      # padding-ray origin: misses all geometry


def _prep_rays_wl(origin, direction, t_max=None):
    """(R, 3) x2 [+ per-ray t_max] -> (od (9, Rpad) [o; d; inv_d]
    rays-on-lanes operand shared by EVERY phase, tm (1, Rpad) per-ray
    t_max row, R). The direction reciprocals are precomputed here
    (fused XLA elementwise): (1, RB) divisions inside the per-item
    kernels cost ~3 vector divides per item. Pads to 8 bundles with
    far-away zero-range rays that enter nothing. (The old second
    rays-on-sublanes (Rp, 16) layout for the coarse cull cost ~8 ms/1M
    rays in narrow transposes + concats — the cull now runs
    boxes-on-sublanes off this same layout.)"""
    r = origin.shape[0]
    quantum = 8 * RB
    pad = -(-r // quantum) * quantum - r
    # sanitize: dead integrator lanes carry inf/NaN origins or zero
    # directions — park them on the never-hits ray instead of feeding
    # non-finite values into the cull/sort pipeline
    bad = ~(jnp.all(jnp.isfinite(origin), axis=1)
            & jnp.all(jnp.isfinite(direction), axis=1)
            & (jnp.sum(direction * direction, axis=1) > 0.0))
    origin = jnp.where(bad[:, None], _FAR, origin)
    direction = jnp.where(bad[:, None],
                          jnp.asarray([1.0, 0.0, 0.0], F32), direction)
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
    # XLA concat+transpose route by default: a fused Pallas layout
    # kernel reading (RB, 3) blocks measured WORSE (13.2 vs 7.7 ms/1M
    # rays — narrow-lane block reads). DCRT_WL_PREP=pallas re-enables
    # it for A/B.
    if _PREP_ENV != "pallas" or jax.default_backend() != "tpu":
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-30,
                              jnp.where(d >= 0, 1e-30, -1e-30), d)
        od = jnp.concatenate([o, d, inv], axis=1).T
        return od, tm[None, :], r
    od = _prep_od_pallas(o, d)
    return od, tm[None, :], r


def _prep_rays_wl_rows(o_rows, d_rows, t_max=None):
    """Rows-layout prep fast path: (3, R) origin/direction component
    rows -> the same (od (9, Rpad), tm (1, Rpad), R) contract as
    _prep_rays_wl, with no (R, 3) relayout anywhere (pure row concat +
    lane pad; the (R, 3) -> (9, R) transpose costs ~7 ms/M rays
    because narrow-minor-dim tables tile at 3/128 lane utilization).
    Producers that keep rays in component rows (camera.
    generate_ray_rows) feed the traversal at full bandwidth."""
    r = o_rows.shape[1]
    quantum = 8 * RB
    pad = -(-r // quantum) * quantum - r
    bad = ~(jnp.all(jnp.isfinite(o_rows), axis=0)
            & jnp.all(jnp.isfinite(d_rows), axis=0)
            & (jnp.sum(d_rows * d_rows, axis=0) > 0.0))
    dfix = jnp.asarray([1.0, 0.0, 0.0], F32)[:, None]
    o_rows = jnp.where(bad[None, :], _FAR, o_rows)
    d_rows = jnp.where(bad[None, :], dfix, d_rows)
    o = jnp.pad(o_rows, ((0, 0), (0, pad)), constant_values=_FAR)
    d = (jnp.concatenate([d_rows, jnp.tile(dfix, (1, pad))], axis=1)
         if pad else d_rows)
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-30,
                          jnp.where(d >= 0, 1e-30, -1e-30), d)
    od = jnp.concatenate([o, d, inv], axis=0)
    if t_max is None:
        tm = jnp.concatenate([jnp.full((r,), BIG, F32),
                              jnp.zeros((pad,), F32)])
    else:
        tm = jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray(t_max, F32), (r,)),
             jnp.zeros((pad,), F32)])
    return od, tm[None, :], r


def _prep_od_kernel(o_ref, d_ref, od_ref):
    """(RB, 3) ray blocks -> (9, RB) [o; d; inv] layout rotation done
    where it is cheap: one in-VMEM transpose per block instead of an
    XLA relayout of the whole (R, 9) table (measured ~7.5 ms/1M rays,
    a quarter of the closest pass; this kernel replaces it)."""
    ot = o_ref[:, :].T                                 # (3, RB)
    dt = d_ref[:, :].T
    inv = 1.0 / jnp.where(jnp.abs(dt) < 1e-30,
                          jnp.where(dt >= 0, 1e-30, -1e-30), dt)
    od_ref[0:3, :] = ot
    od_ref[3:6, :] = dt
    od_ref[6:9, :] = inv


def _prep_od_pallas(o, d):
    rp = o.shape[0]
    return pl.pallas_call(
        _prep_od_kernel,
        grid=(rp // RB,),
        in_specs=[
            pl.BlockSpec((RB, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9, RB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9, rp), F32),
    )(o, d)


_INVERTED_BOX = [[1.0, 1.0, 1.0, -1.0, -1.0, -1.0, 0.0, 0.0]]
BT = 64                      # coarse-cull boxes per sublane tile


def _sublane_pad_boxes(box):
    """(n, 8) boxes -> (n_pad, 8) row-padded with inverted
    never-entered boxes to a BT multiple (sublane tiles of the
    boxes-on-sublanes coarse cull)."""
    n = box.shape[0]
    bt = BT if n > BT else max(8, -(-n // 8) * 8)
    n_pad = -(-n // bt) * bt
    if n_pad != n:
        pad_rows = jnp.tile(jnp.asarray(_INVERTED_BOX, F32),
                            (n_pad - n, 1))
        box = jnp.concatenate([box, pad_rows], axis=0)
    return box


def _pad_tables(scene):
    """Cluster tables + box hierarchy padded to SUPER multiples.

    Returns (tabs = (ctab (Cs*SLAB, 13) raw-vertex slabs for the
    watertight sweep, bwtab (Cs*SLAB, 16) Baldwin-Weber slabs for the
    default sweep), cbox3 (Cs, SUPER, 8) child boxes (never-hit
    padding), sbox (Cs_pad, 8) super box rows padded to a BT
    sublane-tile multiple, Cpad, Cs, hyper) where hyper is None (small
    scenes) or the phase-A hierarchy operands (hsup (NH, HS, 8)
    per-hyper member-super boxes, hbox (NH_pad, 8), NH, HS)."""
    ctab = scene.cluster_tris
    bwtab = scene.cluster_bw
    cbox = scene.cluster_bbox
    c = cbox.shape[0]
    cpad = -(-c // SUPER) * SUPER
    if cpad != c:
        ctab = jnp.pad(ctab, ((0, (cpad - c) * CLUSTER_SIZE), (0, 0)))
        bwtab = jnp.pad(bwtab, ((0, (cpad - c) * CLUSTER_SIZE), (0, 0)))
        pad_rows = jnp.tile(jnp.asarray(_INVERTED_BOX, cbox.dtype),
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
    return (ctab, bwtab), cbox3, _sublane_pad_boxes(sbox), cpad, cs, \
        _build_hyper(sbox, cs)


def _build_hyper(sbox, cs):
    """Group (cs, 8) super boxes into the phase-A hyper level (None for
    small scenes)."""
    if cs <= HIER_MIN:
        return None
    hs = _hyper_fanout(cs)
    nh = -(-cs // hs)
    if nh * hs != cs:
        pad_rows = jnp.tile(jnp.asarray(_INVERTED_BOX, F32),
                            (nh * hs - cs, 1))
        sbox_h = jnp.concatenate([sbox, pad_rows], axis=0)
    else:
        sbox_h = sbox
    hsup = sbox_h.reshape(nh, hs, 8)
    # min/max against inverted padding members only loosens bounds
    hb_min = jnp.min(sbox_h.reshape(nh, hs, 8)[:, :, 0:3], axis=1)
    hb_max = jnp.max(sbox_h.reshape(nh, hs, 8)[:, :, 3:6], axis=1)
    all_pad = jnp.all(
        sbox_h.reshape(nh, hs, 8)[:, :, 0] == 1.0, axis=1)
    hbox = jnp.concatenate(
        [jnp.where(all_pad[:, None], 1.0, hb_min),
         jnp.where(all_pad[:, None], -1.0, hb_max),
         jnp.zeros((nh, 2), F32)], axis=1)
    return (hsup, _sublane_pad_boxes(hbox), nh, hs)


def _instanced(scene):
    """True when the scene carries the BLAS-sharing instanced tables
    (built for scenes too big or too instanced for the world soup)."""
    return scene.isup_inst.shape[0] > 1


def _pad_tables_instanced(scene):
    """Instanced-mode phase tables: per-(instance, super) world boxes
    drive the cull exactly like world-soup supers; the slab tables are
    mesh-local and indexed separately (isup_local)."""
    sbox = scene.isup_sbox
    cs = sbox.shape[0]
    return ((scene.icl_slab, scene.icl_bw), scene.isup_cbox,
            _sublane_pad_boxes(sbox), None, cs, _build_hyper(sbox, cs))


def _hyper_fanout(cs):
    """Supers per hyper, sized so the dense hyper cull runs at 64-128
    lanes: tight hyper boxes matter more than lane count (too-coarse
    hypers admit most blocks and overflow the refine capacity)."""
    return int(min(16, max(4, cs // 64)))


# ---------------------------------------------------------------------------
# Phase A: exact bundle-vs-supercluster cull
# ---------------------------------------------------------------------------

def _tlo_rows(box_ref, od, tm, n_rows):
    """Exact slab test of every box (sublanes) against every ray
    (lanes): box_ref (n_rows, 8) box rows, od (9, RB) [o; d; inv],
    tm (1, RB) per-ray t_max. Returns the (n_rows, 1) per-box min
    entry over entering rays (BIG = no ray enters within its t_max).
    Rays-on-lanes keeps every vreg 128-lane-full — the old
    rays-on-sublanes formulation paid 2x the vregs at <=64 boxes and
    needed its own (Rp, 16) ray layout."""
    rb = od.shape[1]
    t_lo = jnp.full((n_rows, rb), -BIG, F32)
    t_hi = jnp.full((n_rows, rb), BIG, F32)
    for ax in range(3):
        inv = od[6 + ax:7 + ax, :]                     # (1, RB)
        o_c = od[ax:ax + 1, :]
        b0 = box_ref[:, ax:ax + 1]                     # (n_rows, 1)
        b1 = box_ref[:, 3 + ax:4 + ax]
        a = (b0 - o_c) * inv                           # (n_rows, RB)
        b = (b1 - o_c) * inv
        t_lo = jnp.maximum(t_lo, jnp.minimum(a, b))
        t_hi = jnp.minimum(t_hi, jnp.maximum(a, b))
    enter = (t_hi >= t_lo) & (t_hi >= 0.0) & (t_lo <= tm)
    per_ray = jnp.where(enter, jnp.maximum(t_lo, 0.0), BIG)
    return jnp.min(per_ray, axis=1, keepdims=True)


def _cull_super_kernel(bt, box_ref, od_ref, tm_ref, tlo_ref):
    tlo_ref[0, :, :] = _tlo_rows(box_ref[:, :], od_ref[:, :],
                                 tm_ref[0:1, :], bt)


def _cull_super(sbox, od, tm, interpret=False):
    rp = od.shape[1]
    nb = rp // RB
    n_pad = sbox.shape[0]
    bt = BT if n_pad >= BT else n_pad
    out = pl.pallas_call(
        functools.partial(_cull_super_kernel, bt),
        grid=(nb, n_pad // bt),
        in_specs=[
            pl.BlockSpec((bt, 8), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, RB), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RB), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bt, 1), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, n_pad, 1), F32),
        interpret=interpret,
    )(sbox, od, tm)
    return out[:, :, 0]


def _exact_tlo_super(sbox, od, tm):
    """XLA mirror of the coarse cull (test oracle)."""
    nb = od.shape[1] // RB
    od3 = od.T.reshape(nb, RB, 9).transpose(0, 2, 1)   # (nb, 9, RB)
    tm3 = tm.reshape(nb, 1, RB)
    rows = jax.vmap(
        lambda o, t: _tlo_rows(sbox, o, t, sbox.shape[0]))(od3, tm3)
    return rows[:, :, 0]


# ---------------------------------------------------------------------------
# Phase B: compact coarse items, front-to-back per block
# ---------------------------------------------------------------------------

def _scatter_items(gm, blk_grid, idx_grid, t_grid, nb, cap):
    """Compact a validity grid into (blk, idx, t_ent, total) item
    arrays via one cumsum+scatter. Row-major flatten keeps items
    block-contiguous when blk_grid rows are block-sorted."""
    flat = gm.ravel()
    cum = jnp.cumsum(flat, dtype=I32)
    total = cum[-1]
    pos = jnp.where(flat, cum - 1, cap)
    blk = jnp.full((cap,), nb - 1, I32).at[pos].set(
        blk_grid.ravel(), mode="drop")
    idx = jnp.zeros((cap,), I32).at[pos].set(
        idx_grid.ravel(), mode="drop")
    t_ent = jnp.full((cap,), BIG, F32).at[pos].set(
        t_grid.ravel(), mode="drop")
    return blk, idx, t_ent, total


def _finish_items(blk, sup, t_ent, total, cap_s):
    """Order compacted items per-block front-to-back (one two-key sort
    over the item list — orders of magnitude fewer elements than
    sorting the full cull grid) and pack the valid/first-of-run flag
    word the sweep kernels consume."""
    blk, t_ent, sup = jax.lax.sort((blk, t_ent, sup), dimension=0,
                                   num_keys=2)
    valid = jnp.arange(cap_s) < total
    bf = (blk << _BLOCK_SHIFT) | valid.astype(I32)
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), bf[1:] != bf[:-1]])
    first = first & valid
    blkflags = bf | (first.astype(I32) << 1)
    return blkflags, sup, t_ent


# ---------------------------------------------------------------------------
# Phase A (large scenes): hyper cull -> per-item super refine
# ---------------------------------------------------------------------------

def _refine_kernel(hs, bfh_ref, hyp_ref, hsup_ref, od_ref, tm_ref,
                   out_ref):
    """Exact per-ray cull of one work item's hs child boxes; writes
    the (hs, 1) min-entry column (BIG for invalid padding items). One
    kernel serves every level of the descent (hyper->super and
    super->cluster). Boxes ride sublanes and rays ride lanes — full
    128-lane utilization (the odt rays-on-sublanes layout would waste
    7/8 of every vreg at hs<=16 lanes)."""
    i = pl.program_id(0)
    valid = (bfh_ref[i] & 1) == 1

    @pl.when(valid)
    def _():
        rb = od_ref.shape[1]
        t_lo = jnp.full((hs, rb), -BIG, F32)
        t_hi = jnp.full((hs, rb), BIG, F32)
        for ax in range(3):
            inv = od_ref[6 + ax:7 + ax, :]             # (1, RB)
            b0 = hsup_ref[0, :, ax:ax + 1]             # (hs, 1)
            b1 = hsup_ref[0, :, 3 + ax:4 + ax]
            o_c = od_ref[ax:ax + 1, :]
            a = (b0 - o_c) * inv                       # (hs, RB)
            b = (b1 - o_c) * inv
            t_lo = jnp.maximum(t_lo, jnp.minimum(a, b))
            t_hi = jnp.minimum(t_hi, jnp.maximum(a, b))
        enter = (t_hi >= t_lo) & (t_hi >= 0.0) & (t_lo <= tm_ref[0:1, :])
        per_ray = jnp.where(enter, jnp.maximum(t_lo, 0.0), BIG)
        out_ref[0, :, :] = jnp.min(per_ray, axis=1, keepdims=True)

    @pl.when(~valid)
    def _():
        out_ref[0, :, :] = jnp.full((hs, 1), BIG, F32)


def _refine_items(boxes3, hs, bfh, hyp, od, tm, cap_h, interpret):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(cap_h,),
        in_specs=[
            pl.BlockSpec((1, hs, 8), lambda i, bfh, hyp: (hyp[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, RB),
                         lambda i, bfh, hyp: (0, bfh[i] >> _BLOCK_SHIFT),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RB),
                         lambda i, bfh, hyp: (0, bfh[i] >> _BLOCK_SHIFT),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hs, 1), lambda i, bfh, hyp: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_refine_kernel, hs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cap_h, hs, 1), F32),
        interpret=interpret,
    )(bfh, hyp, boxes3, od, tm)
    return out[:, :, 0]


def _compact_pairs(tlo, n, cap):
    """Dense cull grid (nb, n_pad) -> unsorted parent items
    (bf (cap,) = (blk<<2)|valid, idx (cap,), t_ent, total,
    block_any)."""
    nb = tlo.shape[0]
    g = tlo[:, :n]
    gm = g < BIG
    blk_iota = jax.lax.broadcasted_iota(I32, g.shape, 0)
    idx_iota = jax.lax.broadcasted_iota(I32, g.shape, 1)
    blk, idx, t_ent, total = _scatter_items(gm, blk_iota, idx_iota, g,
                                            nb, cap)
    valid = jnp.arange(cap) < total
    bf = (blk << _BLOCK_SHIFT) | valid.astype(I32)
    return bf, idx, t_ent, total, jnp.any(gm, axis=1)


def _expand_level(tlo_child, bf_parent, parent_idx, k, bound, nb, cap):
    """Refined per-item child entries (cap_p, k) -> unsorted child
    items (bf, idx, t_ent, total). Child ids = parent*k + member."""
    valid_p = ((bf_parent & 1) == 1)
    ids = (parent_idx[:, None] * k
           + jnp.arange(k, dtype=I32)[None, :])
    gm = (tlo_child < BIG) & valid_p[:, None] & (ids < bound)
    blk_grid = jnp.broadcast_to(
        (bf_parent >> _BLOCK_SHIFT)[:, None], gm.shape)
    blk, idx, t_ent, total = _scatter_items(gm, blk_grid, ids,
                                            tlo_child, nb, cap)
    valid = jnp.arange(cap) < total
    bf = (blk << _BLOCK_SHIFT) | valid.astype(I32)
    return bf, idx, t_ent, total


# ---------------------------------------------------------------------------
# Phase C: fused fine-cull + sweep kernels
# ---------------------------------------------------------------------------

_LOWM = (SUPER << 4) - 1     # packed best-hit low bits: (child<<4)|row


def _isect_rows(tab, ox, oy, oz, dx, dy, dz, t_min, t_max,
                watertight=False):
    """(S, RB) triangle test for one cluster slab -> (t, u, v, back,
    ok). Non-watertight sweeps run Baldwin-Weber on the precomputed
    transform table (cluster.baldwin_table: ~40 VPU ops vs Moeller's
    ~60 — the sweep loop is compute-bound, so this is a direct ~1.3x);
    watertight runs the PBRT permute+shear test on the raw-vertex
    table. den = n.d is exactly Moeller's -det, so the degeneracy
    threshold and the backface sign carry over."""
    c = lambda i: tab[:, i:i + 1]                     # (S, 1)
    if watertight:
        from .pallas_brute import watertight_rows

        return watertight_rows(c, ox, oy, oz, dx, dy, dz, t_min, t_max)
    nx, ny, nz, c0 = c(0), c(1), c(2), c(3)
    den = nx * dx + ny * dy + nz * dz
    den_ok = jnp.abs(den) >= 1e-10
    inv_den = 1.0 / jnp.where(den_ok, den, 1.0)
    t = (c0 - (nx * ox + ny * oy + nz * oz)) * inv_den
    hx = ox + t * dx
    hy = oy + t * dy
    hz = oz + t * dz
    u = c(4) * hx + c(5) * hy + c(6) * hz + c(7)
    v = c(8) * hx + c(9) * hy + c(10) * hz + c(11)
    ok = (den_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
          & (t >= t_min) & (t < t_max))
    return t, u, v, den < 1e-10, ok


def _fine_enter(cbox_ref, od_ref, cap_row, floor=None):
    """Exact per-ray slab test of the item's SUPER child boxes against
    the bundle, pruned per ray by cap_row (current best t / t_max /
    occlusion state — the per-ray front-to-back pruning the reference
    gets from its t_max test, BVHAccel.inc.hlsl:119). floor (the SMEM
    t_min scalar) additionally drops boxes the ray exits before the
    window opens — the same `t1 >= t_min` the stack walker's ray_aabb
    applies, and what makes a floored phase-2 slab-march cast skip the
    near field. Returns ((SUPER, RB) enter mask, (SUPER, RB) clamped
    entry distances)."""
    rb = od_ref.shape[1]
    t_lo = jnp.full((SUPER, rb), -BIG, F32)
    t_hi = jnp.full((SUPER, rb), BIG, F32)
    for ax in range(3):
        inv = od_ref[6 + ax:7 + ax, :]                 # (1, RB)
        b0 = cbox_ref[0, :, ax:ax + 1]                 # (SUPER, 1)
        b1 = cbox_ref[0, :, 3 + ax:4 + ax]
        o_c = od_ref[ax:ax + 1, :]
        a = (b0 - o_c) * inv                           # (SUPER, RB)
        b = (b1 - o_c) * inv
        t_lo = jnp.maximum(t_lo, jnp.minimum(a, b))
        t_hi = jnp.minimum(t_hi, jnp.maximum(a, b))
    enter = (t_hi >= t_lo) & (t_hi >= 0.0) & (t_lo < cap_row)
    if floor is not None:
        enter = enter & (t_hi >= floor)
    return enter, jnp.maximum(t_lo, 0.0)


_KEYM = 63                    # pick-key low bits: cluster id
_INF_KEY = 0x7FFFFFFF         # plain int: jnp constants may not be
                              # captured by pallas kernel closures
assert SUPER <= _KEYM + 1, "pick keys pack the cluster id in 6 bits"


def _cluster_keys(enter, t_lo, iota):
    """(SUPER, RB) enter/entry -> ((SUPER, 1) packed front-to-back pick
    keys (t_entry bits | cluster id — the integer min IS 'nearest
    remaining cluster', the same bit-packed-argmin trick as the hit
    selection), n entered). The t-order is what makes the in-loop
    early break possible: once the nearest remaining cluster's entry
    lies beyond every ray's current best, nothing left can hit."""
    ent = jnp.any(enter, axis=1, keepdims=True)
    t_ent = jnp.min(jnp.where(enter, t_lo, BIG), axis=1, keepdims=True)
    keys = jnp.where(
        ent, (jax.lax.bitcast_convert_type(t_ent, I32) & ~_KEYM) | iota,
        _INF_KEY)
    return keys, jnp.sum(ent.astype(I32))


def _iota_sup():
    return jax.lax.broadcasted_iota(I32, (SUPER, 1), 0)


def _pick_clusters(key_scr, iota):
    """Pop the PAIR nearest remaining clusters from the key scratch:
    (c_ids, valid_flags, nearest_key). Fusing PAIR clusters into one
    (PAIR*S, RB) sweep amortizes the pick/argmin chain and loop fixed
    costs; each extra pick is one masked tiny-vector min."""
    keys = key_scr[:, :]
    cs_, vs_ = [], []
    taken = jnp.zeros_like(iota, dtype=jnp.bool_)
    k_1 = None
    for _ in range(PAIR):
        k = jnp.min(jnp.where(taken, _INF_KEY, keys))
        if k_1 is None:
            k_1 = k
        c = k & _KEYM
        v = k < _INF_KEY
        cs_.append(jnp.where(v, c, 0) if len(cs_) else c)
        vs_.append(v)
        taken = taken | (iota == c)
    key_scr[:, :] = jnp.where(taken, _INF_KEY, keys)
    return cs_, vs_, k_1


def _pair_tab(slab_ref, cs_, base=0):
    """Concatenate the PAIR picked cluster slabs (single dynamic slice
    when PAIR=1)."""
    parts = [slab_ref[pl.ds(base + c * CLUSTER_SIZE, CLUSTER_SIZE), :]
             for c in cs_]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts,
                                                            axis=0)


def _seg_child_ok(rows, cs_, vs_):
    """Per-row cluster id + validity mask for the fused (PAIR*CS, RB)
    slab (None mask when PAIR == 1 — a single picked cluster is always
    valid under the loop guard)."""
    if PAIR == 1:
        return cs_[0], None
    seg = rows // CLUSTER_SIZE
    child = jnp.zeros_like(rows)
    okv = jnp.zeros_like(rows, dtype=jnp.bool_)
    for i, (c, v) in enumerate(zip(cs_, vs_)):
        m = seg == i
        child = jnp.where(m, c, child)
        okv = okv | (m & v)
    return child, okv


def _rows_pair():
    rows = jax.lax.broadcasted_iota(I32, (PAIR * CLUSTER_SIZE, 1), 0)
    return rows, rows & (CLUSTER_SIZE - 1)


def _wl_closest_kernel(wt, gg, bf_ref, sup_ref, tent_ref, cbox_ref,
                       slab_ref, od_ref, texp_ref, tmin_ref, out_ref,
                       mask_scr, term_scr):
    i = pl.program_id(0)
    item = bf_ref[i]
    first = (item & 2) != 0
    # early termination: items arrive front-to-back per block, so once
    # every ray's best hit is closer than this item's entry distance,
    # nothing behind can improve. The bound max(best) lives in an SMEM
    # scalar refreshed only when a body actually runs — the per-item
    # check is then scalar-vs-scalar.
    # out_ref[0] is the bit-packed best (t | child | row): as f32 it
    # still compares like t (positive floats are bit-monotone).
    # gg (group gating): each 128-lane group skips a picked cluster
    # whose entry lies beyond that GROUP's own best-t bound — the
    # shared worklist still sweeps nearest-first once per cluster (no
    # wlg-style per-group duplication), but a straggler ray only keeps
    # its OWN group's vector work alive, not the whole bundle's (the
    # round-3 census: a cluster is needed by ~1.9 of 8 groups on
    # bounced pools; coherent tiles also split across sub-frusta).
    live = first | (term_scr[0] > tent_ref[i])

    @pl.when(((item & 1) == 1) & live)
    def _():
        ox, oy, oz = od_ref[0:1, :], od_ref[1:2, :], od_ref[2:3, :]
        dx, dy, dz = od_ref[3:4, :], od_ref[4:5, :], od_ref[5:6, :]
        t_min = tmin_ref[0, 0]
        rb = od_ref.shape[1]
        rows, rowmod = _rows_pair()

        # best starts at the ray's scene-bbox exit (+pad), NOT +inf:
        # rays that miss everything then stop blocking termination.
        # Setting the low id bits makes any true hit at the same
        # truncated t win the integer min.
        @pl.when(first)
        def _():
            texp_bits = jax.lax.bitcast_convert_type(
                texp_ref[0:1, :], I32) | _LOWM
            out_ref[0:1, :] = jax.lax.bitcast_convert_type(
                texp_bits, F32)
            out_ref[1:2, :] = texp_ref[0:1, :]
            for j in range(2, 8):
                out_ref[j:j + 1, :] = jnp.zeros((1, rb), F32)
            term_scr[0] = BIG

        enter, t_lo = _fine_enter(cbox_ref, od_ref, out_ref[0:1, :],
                                     floor=t_min)
        iota = _iota_sup()
        keys, n = _cluster_keys(enter, t_lo, iota)
        # Mosaic legalizes while loops with scalar carries only: the
        # remaining-children keys and best-hit state live in scratch /
        # the output ref, the loop carries the trip counter + stop flag
        mask_scr[:, :] = keys

        def cond(c):
            return (c[0] < n) & (c[1] == 0)

        def body(c):
            r, _ = c
            if _REKEY:
                # one-shot re-key: after the first pair (the nearest
                # clusters, where most coherent rays find their hit),
                # re-run the per-ray enter test against the TIGHTENED
                # best-t and drop remaining clusters no surviving ray
                # still enters (never revives popped clusters). Costs
                # ~half a sweep step once per item; prunes the tail
                # the bundle-max break keeps alive.
                @pl.when(r == PAIR)
                def _():
                    ent2, tl2 = _fine_enter(cbox_ref, od_ref,
                                            out_ref[0:1, :],
                                            floor=t_min)
                    keys2, _n2 = _cluster_keys(ent2, tl2, iota)
                    cur = mask_scr[:, :]
                    mask_scr[:, :] = jnp.where(cur == _INF_KEY,
                                               _INF_KEY, keys2)
            cs_, vs_, k_1 = _pick_clusters(mask_scr, iota)
            # in-item early break: picks arrive nearest-first, so once
            # the nearest remaining cluster's entry (t bits, truncated
            # like the hit packing) is past EVERY ray's current best,
            # no remaining cluster can produce an improving hit
            bnd = jnp.max(jax.lax.bitcast_convert_type(
                out_ref[0:1, :], I32))
            stop = (k_1 & ~_LOWM) >= bnd

            @pl.when(~stop)
            def _():
                tab = _pair_tab(slab_ref, cs_)
                child, okv = _seg_child_ok(rows, cs_, vs_)
                # row 7: clusters swept for this block (the
                # production-path traversal-cost counter the iteration
                # AOV reads; the reference counts per-thread loop
                # iterations, MegakernelPathTracing.hlsl:286-288)
                swept = sum(jnp.where(vv, 1.0, 0.0) for vv in vs_)

                def sweep_cols(sl):
                    t_b = out_ref[0:1, sl]
                    t, u, v, back, ok = _isect_rows(
                        tab, ox[:, sl], oy[:, sl], oz[:, sl],
                        dx[:, sl], dy[:, sl], dz[:, sl], t_min, t_b,
                        watertight=wt)
                    if okv is not None:
                        ok = ok & okv

                    def pack_and_select():
                        # pack (t & ~0x1FF) | (child << 4) | row: the
                        # integer min IS the argmin, the id bits make
                        # every candidate unique, and the winner's
                        # EXACT attributes are picked right here with
                        # masked sums (replacing three 1M-row HBM
                        # gathers in the old post-pass, ~4x)
                        bits = ((jax.lax.bitcast_convert_type(t, I32)
                                 & ~_LOWM) | ((child << 4) + rowmod))
                        cand = jnp.where(ok, bits,
                                         jnp.int32(0x7FFFFFFF))
                        pmin = jnp.min(cand, axis=0, keepdims=True)
                        best = jax.lax.bitcast_convert_type(t_b, I32)
                        better = pmin < best

                        # the selection chain (~6 masked sums over the
                        # full slab) only runs when this step improved
                        # SOME ray — with nearest-first sweeping most
                        # late steps improve nothing, so the scalar
                        # any() gate pays for itself
                        @pl.when(jnp.any(better))
                        def _():
                            win = cand == pmin       # exactly one row

                            def pick(x):
                                return jnp.sum(jnp.where(win, x, 0.0),
                                               axis=0, keepdims=True)

                            def sel(j, x):
                                out_ref[j:j + 1, sl] = jnp.where(
                                    better, pick(x),
                                    out_ref[j:j + 1, sl])

                            out_ref[0:1, sl] = \
                                jax.lax.bitcast_convert_type(
                                    jnp.where(better, pmin, best), F32)
                            if not _NOSEL:
                                mc = 9 if wt else 12  # tri|inst|flip
                                sel(1, jnp.broadcast_to(t, cand.shape))
                                sel(2, jnp.broadcast_to(u, cand.shape))
                                sel(3, jnp.broadcast_to(v, cand.shape))
                                sel(4, jnp.broadcast_to(
                                    tab[:, mc:mc + 1], cand.shape))
                                sel(5, jnp.broadcast_to(
                                    tab[:, mc + 1:mc + 2], cand.shape))
                                flipped = back ^ (tab[:, mc + 2:mc + 3]
                                                  > 0.5)
                                sel(6, jnp.where(flipped, 1.0, 0.0))

                    if _TSKIP:
                        # skip packing + argmin + selection entirely
                        # when no lane's candidate survived the window
                        # test (tail clusters entered on a conservative
                        # box test often produce zero in-window plane
                        # hits)
                        @pl.when(jnp.any(ok))
                        def _():
                            pack_and_select()
                    else:
                        pack_and_select()
                    out_ref[7:8, sl] = out_ref[7:8, sl] + swept

                if gg:
                    kbits = k_1 & ~_LOWM
                    for g in range(GN):
                        slg = slice(g * GL, (g + 1) * GL)
                        bnd_g = jnp.max(jax.lax.bitcast_convert_type(
                            out_ref[0:1, slg], I32))

                        @pl.when(kbits < bnd_g)
                        def _(slg=slg):
                            sweep_cols(slg)
                else:
                    sweep_cols(slice(None))

            return r + PAIR, stop.astype(I32)

        jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))

        @pl.when(n > 0)
        def _():
            term_scr[0] = jnp.max(out_ref[0:1, :])


def _wl_any_kernel(wt, gg, bf_ref, sup_ref, tent_ref, cbox_ref,
                   slab_ref, od_ref, tmax_ref, tmin_ref, occ_ref,
                   mask_scr, term_scr):
    i = pl.program_id(0)
    item = bf_ref[i]
    first = (item & 2) != 0
    # all-occluded short circuit, cached as an SMEM scalar (see the
    # closest kernel). gg: fully-occluded 128-lane groups skip a
    # cluster's vector work under a scalar pl.when (binary analogue of
    # the closest kernel's per-group distance bound).
    live = first | (term_scr[0] < 0.5)

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
            term_scr[0] = F32(0.0)

        # occluded rays stop entering anything (per-ray prune)
        cap_row = jnp.where(occ_ref[0:1, :] > 0.5, -BIG, t_max)
        enter, t_lo = _fine_enter(cbox_ref, od_ref, cap_row,
                                     floor=t_min)
        iota = _iota_sup()
        keys, n = _cluster_keys(enter, t_lo, iota)
        mask_scr[:, :] = keys
        rows, _ = _rows_pair()

        def cond(c):
            return (c[0] < n) & (c[1] == 0)

        def body(c):
            # paired nearest-first sweep (see the closest kernel); the
            # in-item break fires once every ray is occluded
            r, _ = c
            cs_, vs_, _k1 = _pick_clusters(mask_scr, iota)
            tab = _pair_tab(slab_ref, cs_)
            _, okv = _seg_child_ok(rows, cs_, vs_)

            def sweep_cols(sl):
                _, _, _, _, ok = _isect_rows(
                    tab, ox[:, sl], oy[:, sl], oz[:, sl], dx[:, sl],
                    dy[:, sl], dz[:, sl], t_min, t_max[:, sl],
                    watertight=wt)
                if okv is not None:
                    ok = ok & okv
                occ_ref[0:1, sl] = jnp.maximum(
                    occ_ref[0:1, sl],
                    jnp.where(jnp.any(ok, axis=0, keepdims=True),
                              1.0, 0.0))

            if gg:
                for g in range(GN):
                    slg = slice(g * GL, (g + 1) * GL)

                    @pl.when(jnp.min(occ_ref[0:1, slg]) < 0.5)
                    def _(slg=slg):
                        sweep_cols(slg)
            else:
                sweep_cols(slice(None))
            all_occ = jnp.min(occ_ref[0:1, :]) > 0.5
            return r + PAIR, all_occ.astype(I32)

        jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))

        @pl.when(n > 0)
        def _():
            term_scr[0] = jnp.min(occ_ref[0:1, :])


# ---------------------------------------------------------------------------
# Grouped sweep kernels: each 128-lane group pops its own nearest cluster
# ---------------------------------------------------------------------------
#
# The bundle-synchronous sweep above pays one full 1024-lane step per
# cluster entered by ANY ray of the bundle. Coherent camera bundles keep
# those lanes busy; an incoherent (bounced-pool) bundle does not — the
# round-3 sparsity census (experiments/analyze_sparsity.py) measured
# each entered cluster needed by ~10 rays in ~1.9 of the bundle's eight
# 128-lane groups, i.e. the dense step wastes ~75% of its vector work
# and, worse, the bundle-max early-termination bound stays loose while
# any one ray's best-t is far. These kernels restructure the per-item
# loop so every GROUP (one vreg lane tile) maintains its own
# front-to-back cluster worklist, pops its own nearest remaining
# cluster each iteration (a static Python unroll over GN groups —
# per-group (CLUSTER_SIZE, GL) ops are exactly 1/GN of the dense step's
# vregs, so the vector cost of a step scales with the number of LIVE
# groups), and terminates on its own 128-lane bound. Groups that never
# entered the item's super, exhausted their clusters, or beat their
# bound skip entirely under a scalar pl.when. The reference gets this
# per-ray adaptivity from SIMT per-thread stacks (BVHAccel.inc.hlsl:
# 85-232); a TPU lane cannot diverge, so divergence is rebuilt at
# lane-group granularity instead.


def _group_keys(enter, t_lo, key_scr):
    """Per-group front-to-back cluster keys into the (SUPER, GN) key
    scratch; returns the whole-item 'anything entered' scalar."""
    iota = _iota_sup()
    for g in range(GN):
        sl = slice(g * GL, (g + 1) * GL)
        t_g = jnp.min(jnp.where(enter[:, sl], t_lo[:, sl], BIG),
                      axis=1, keepdims=True)            # (SUPER, 1)
        key_scr[:, g:g + 1] = jnp.where(
            t_g < BIG,
            (jax.lax.bitcast_convert_type(t_g, I32) & ~_KEYM) | iota,
            _INF_KEY)
    return jnp.min(key_scr[:, :]) < _INF_KEY


def _pop_pair_keys(key_scr):
    """Pop the TWO nearest remaining clusters of EVERY group with two
    vectorized column reductions (the per-group pick chain was the
    grouped sweep's scalar bottleneck at ~2 reduces per group per
    step). Returns ((1, GN) nearest keys, (1, GN) second keys)."""
    keys = key_scr[:, :]
    kv1 = jnp.min(keys, axis=0, keepdims=True)
    keys2 = jnp.where(keys == kv1, _INF_KEY, keys)
    kv2 = jnp.min(keys2, axis=0, keepdims=True)
    key_scr[:, :] = jnp.where(keys2 == kv2, _INF_KEY, keys2)
    return kv1, kv2


def _pair_rows16():
    rows = jax.lax.broadcasted_iota(I32, (2 * CLUSTER_SIZE, 1), 0)
    return rows, rows & (CLUSTER_SIZE - 1)


def _wlg_closest_kernel(wt, bf_ref, sup_ref, tent_ref, cbox_ref,
                        slab_ref, od_ref, texp_ref, tmin_ref, out_ref,
                        key_scr, term_scr, alive_scr):
    i = pl.program_id(0)
    item = bf_ref[i]
    first = (item & 2) != 0
    live = first | (term_scr[0] > tent_ref[i])

    @pl.when(((item & 1) == 1) & live)
    def _():
        t_min = tmin_ref[0, 0]
        rb = od_ref.shape[1]

        @pl.when(first)
        def _():
            texp_bits = jax.lax.bitcast_convert_type(
                texp_ref[0:1, :], I32) | _LOWM
            out_ref[0:1, :] = jax.lax.bitcast_convert_type(
                texp_bits, F32)
            out_ref[1:2, :] = texp_ref[0:1, :]
            for j in range(2, 8):
                out_ref[j:j + 1, :] = jnp.zeros((1, rb), F32)
            term_scr[0] = BIG

        enter, t_lo = _fine_enter(cbox_ref, od_ref, out_ref[0:1, :],
                                  floor=t_min)
        any0 = _group_keys(enter, t_lo, key_scr)
        rows, rowmod = _pair_rows16()

        def cond(c):
            return (c[0] < SUPER) & (c[1] == 1)

        def body(c):
            r, _ = c
            kv1, kv2 = _pop_pair_keys(key_scr)
            alive_scr[0] = jnp.int32(0)
            for g in range(GN):
                sl = slice(g * GL, (g + 1) * GL)
                k1 = kv1[0, g]

                @pl.when(k1 < _INF_KEY)
                def _(g=g, sl=sl, k1=k1):
                    bnd_g = jnp.max(jax.lax.bitcast_convert_type(
                        out_ref[0:1, sl], I32))

                    @pl.when((k1 & ~_LOWM) < bnd_g)
                    def _(g=g, sl=sl, k1=k1):
                        alive_scr[0] = jnp.int32(1)
                        k2 = kv2[0, g]
                        c1 = k1 & _KEYM
                        c2 = jnp.where(k2 < _INF_KEY, k2 & _KEYM, c1)
                        tab = jnp.concatenate([
                            slab_ref[pl.ds(c1 * CLUSTER_SIZE,
                                           CLUSTER_SIZE), :],
                            slab_ref[pl.ds(c2 * CLUSTER_SIZE,
                                           CLUSTER_SIZE), :]], axis=0)
                        t_b = out_ref[0:1, sl]
                        t, u, v, back, ok = _isect_rows(
                            tab, od_ref[0:1, sl], od_ref[1:2, sl],
                            od_ref[2:3, sl], od_ref[3:4, sl],
                            od_ref[4:5, sl], od_ref[5:6, sl], t_min,
                            t_b, watertight=wt)
                        lo = rows < CLUSTER_SIZE
                        ok = ok & (lo | (k2 < _INF_KEY))
                        child = jnp.where(lo, c1, c2)
                        bits = ((jax.lax.bitcast_convert_type(t, I32)
                                 & ~_LOWM) | ((child << 4) + rowmod))
                        cand = jnp.where(ok, bits,
                                         jnp.int32(0x7FFFFFFF))
                        pmin = jnp.min(cand, axis=0, keepdims=True)
                        best = jax.lax.bitcast_convert_type(t_b, I32)
                        better = pmin < best

                        @pl.when(jnp.any(better))
                        def _(g=g, sl=sl):
                            win = cand == pmin

                            def pick(x):
                                return jnp.sum(jnp.where(win, x, 0.0),
                                               axis=0, keepdims=True)

                            def sel(j, x):
                                out_ref[j:j + 1, sl] = jnp.where(
                                    better, pick(x),
                                    out_ref[j:j + 1, sl])

                            out_ref[0:1, sl] = \
                                jax.lax.bitcast_convert_type(
                                    jnp.where(better, pmin, best), F32)
                            if not _NOSEL:
                                mc = 9 if wt else 12
                                sel(1, jnp.broadcast_to(t, cand.shape))
                                sel(2, jnp.broadcast_to(u, cand.shape))
                                sel(3, jnp.broadcast_to(v, cand.shape))
                                sel(4, jnp.broadcast_to(
                                    tab[:, mc:mc + 1], cand.shape))
                                sel(5, jnp.broadcast_to(
                                    tab[:, mc + 1:mc + 2], cand.shape))
                                flipped = back ^ (
                                    tab[:, mc + 2:mc + 3] > 0.5)
                                sel(6, jnp.where(flipped, 1.0, 0.0))
                        out_ref[7:8, sl] = out_ref[7:8, sl] + 2.0

            return r + 2, alive_scr[0]

        jax.lax.while_loop(cond, body,
                           (jnp.int32(0), any0.astype(I32)))

        @pl.when(any0)
        def _():
            term_scr[0] = jnp.max(out_ref[0:1, :])


def _wlg_any_kernel(wt, bf_ref, sup_ref, tent_ref, cbox_ref, slab_ref,
                    od_ref, tmax_ref, tmin_ref, occ_ref, key_scr,
                    term_scr, alive_scr):
    i = pl.program_id(0)
    item = bf_ref[i]
    first = (item & 2) != 0
    live = first | (term_scr[0] < 0.5)

    @pl.when(((item & 1) == 1) & live)
    def _():
        t_min = tmin_ref[0, 0]
        t_max = tmax_ref[0:1, :]
        rb = od_ref.shape[1]

        @pl.when(first)
        def _():
            occ_ref[0:1, :] = jnp.zeros((1, rb), F32)
            term_scr[0] = F32(0.0)

        cap_row = jnp.where(occ_ref[0:1, :] > 0.5, -BIG, t_max)
        enter, t_lo = _fine_enter(cbox_ref, od_ref, cap_row,
                                  floor=t_min)
        any0 = _group_keys(enter, t_lo, key_scr)
        rows, _ = _pair_rows16()

        def cond(c):
            return (c[0] < SUPER) & (c[1] == 1)

        def body(c):
            r, _ = c
            kv1, kv2 = _pop_pair_keys(key_scr)
            alive_scr[0] = jnp.int32(0)
            for g in range(GN):
                sl = slice(g * GL, (g + 1) * GL)
                k1 = kv1[0, g]

                @pl.when(k1 < _INF_KEY)
                def _(g=g, sl=sl, k1=k1):
                    unocc = jnp.min(occ_ref[0:1, sl]) < 0.5

                    @pl.when(unocc)
                    def _(g=g, sl=sl, k1=k1):
                        alive_scr[0] = jnp.int32(1)
                        k2 = kv2[0, g]
                        c1 = k1 & _KEYM
                        c2 = jnp.where(k2 < _INF_KEY, k2 & _KEYM, c1)
                        tab = jnp.concatenate([
                            slab_ref[pl.ds(c1 * CLUSTER_SIZE,
                                           CLUSTER_SIZE), :],
                            slab_ref[pl.ds(c2 * CLUSTER_SIZE,
                                           CLUSTER_SIZE), :]], axis=0)
                        _, _, _, _, ok = _isect_rows(
                            tab, od_ref[0:1, sl], od_ref[1:2, sl],
                            od_ref[2:3, sl], od_ref[3:4, sl],
                            od_ref[4:5, sl], od_ref[5:6, sl], t_min,
                            tmax_ref[0:1, sl], watertight=wt)
                        ok = ok & ((rows < CLUSTER_SIZE)
                                   | (k2 < _INF_KEY))
                        occ_ref[0:1, sl] = jnp.maximum(
                            occ_ref[0:1, sl],
                            jnp.where(jnp.any(ok, axis=0,
                                              keepdims=True),
                                      1.0, 0.0))

            return r + 2, alive_scr[0]

        jax.lax.while_loop(cond, body,
                           (jnp.int32(0), any0.astype(I32)))

        @pl.when(any0)
        def _():
            term_scr[0] = jnp.min(occ_ref[0:1, :])


def _local_rays(inst_ref, od_ref):
    """World (1, RB) ray rows -> mesh-local rows via the item's
    instance inverse transform (the reference's TLAS->BLAS ray
    re-transform, Shaders/BVHAccel.inc.hlsl:127-140). The local
    direction stays unnormalized so Moeller's t remains the WORLD ray
    parameter — packed-argmin t bits stay comparable across items of
    different instances."""
    ox, oy, oz = od_ref[0:1, :], od_ref[1:2, :], od_ref[2:3, :]
    dx, dy, dz = od_ref[3:4, :], od_ref[4:5, :], od_ref[5:6, :]

    def m(j):
        return inst_ref[0, 0:1, j:j + 1]               # (1, 1)

    ol = [ox * m(0 + ax) + oy * m(3 + ax) + oz * m(6 + ax) + m(9 + ax)
          for ax in range(3)]
    dl = [dx * m(0 + ax) + dy * m(3 + ax) + dz * m(6 + ax)
          for ax in range(3)]
    flip = inst_ref[0, 0:1, 12:13] > 0.5
    return ol[0], ol[1], ol[2], dl[0], dl[1], dl[2], flip


def _wl_closest_inst_kernel(wt, gg, bf_ref, su_ref, sl_ref, it_ref,
                            tent_ref, cbox_ref, slab_ref, inst_ref,
                            od_ref, texp_ref, tmin_ref, out_ref,
                            mask_scr, term_scr):
    """Instanced variant of _wl_closest_kernel: world-space cull
    against the item's per-instance child boxes, mesh-local Moeller
    sweep on rays transformed in-kernel. gg = per-128-lane-group
    gating (see _wl_closest_kernel): instanced items are smaller and
    more numerous (per-instance supers), so a tile's sub-frusta skip
    even more of each other's instances."""
    i = pl.program_id(0)
    item = bf_ref[i]
    first = (item & 2) != 0
    live = first | (term_scr[0] > tent_ref[i])

    @pl.when(((item & 1) == 1) & live)
    def _():
        t_min = tmin_ref[0, 0]
        rb = od_ref.shape[1]
        rows2, rowmod = _rows_pair()

        @pl.when(first)
        def _():
            texp_bits = jax.lax.bitcast_convert_type(
                texp_ref[0:1, :], I32) | _LOWM
            out_ref[0:1, :] = jax.lax.bitcast_convert_type(
                texp_bits, F32)
            out_ref[1:2, :] = texp_ref[0:1, :]
            for j in range(2, 8):
                out_ref[j:j + 1, :] = jnp.zeros((1, rb), F32)
            term_scr[0] = BIG

        enter, t_lo = _fine_enter(cbox_ref, od_ref, out_ref[0:1, :],
                                     floor=t_min)
        iota = _iota_sup()
        keys, n = _cluster_keys(enter, t_lo, iota)
        mask_scr[:, :] = keys
        oxl, oyl, ozl, dxl, dyl, dzl, flip = _local_rays(inst_ref,
                                                         od_ref)
        inst_f = it_ref[i].astype(F32)

        def cond(c):
            return (c[0] < n) & (c[1] == 0)

        def body(c):
            r, _ = c
            if _REKEY:
                # one-shot re-key after the first pair, as in
                # _wl_closest_kernel: drop remaining clusters no
                # surviving ray still enters under the tightened best-t
                @pl.when(r == PAIR)
                def _():
                    ent2, tl2 = _fine_enter(cbox_ref, od_ref,
                                            out_ref[0:1, :],
                                            floor=t_min)
                    keys2, _n2 = _cluster_keys(ent2, tl2, iota)
                    cur = mask_scr[:, :]
                    mask_scr[:, :] = jnp.where(cur == _INF_KEY,
                                               _INF_KEY, keys2)
            cs_, vs_, k_1 = _pick_clusters(mask_scr, iota)
            # in-item early break (see _wl_closest_kernel): the cull is
            # in WORLD space and the Moeller t stays the world ray
            # parameter (unnormalized local direction), so entry keys
            # and hit bits stay comparable
            bnd = jnp.max(jax.lax.bitcast_convert_type(
                out_ref[0:1, :], I32))
            stop = (k_1 & ~_LOWM) >= bnd

            @pl.when(~stop)
            def _():
                tab = _pair_tab(slab_ref, cs_)
                child, okv = _seg_child_ok(rows2, cs_, vs_)
                swept = sum(jnp.where(vv, 1.0, 0.0) for vv in vs_)

                def sweep_cols(sl):
                    t_b = out_ref[0:1, sl]
                    t, u, v, back, ok = _isect_rows(
                        tab, oxl[:, sl], oyl[:, sl], ozl[:, sl],
                        dxl[:, sl], dyl[:, sl], dzl[:, sl], t_min,
                        t_b, watertight=wt)
                    if okv is not None:
                        ok = ok & okv
                    bits = ((jax.lax.bitcast_convert_type(t, I32)
                             & ~_LOWM) | ((child << 4) + rowmod))
                    cand = jnp.where(ok, bits, jnp.int32(0x7FFFFFFF))
                    pmin = jnp.min(cand, axis=0, keepdims=True)
                    best = jax.lax.bitcast_convert_type(t_b, I32)
                    better = pmin < best

                    @pl.when(jnp.any(better))
                    def _():
                        win = cand == pmin

                        def pick(x):
                            return jnp.sum(jnp.where(win, x, 0.0),
                                           axis=0, keepdims=True)

                        def sel(j, x):
                            out_ref[j:j + 1, sl] = jnp.where(
                                better, pick(x), out_ref[j:j + 1, sl])

                        out_ref[0:1, sl] = \
                            jax.lax.bitcast_convert_type(
                                jnp.where(better, pmin, best), F32)
                        mc = 9 if wt else 12       # tri-id col
                        sel(1, jnp.broadcast_to(t, cand.shape))
                        sel(2, jnp.broadcast_to(u, cand.shape))
                        sel(3, jnp.broadcast_to(v, cand.shape))
                        sel(4, jnp.broadcast_to(tab[:, mc:mc + 1],
                                                cand.shape))
                        # instance is the item's (scalar); facing
                        # flips with a negative-determinant instance
                        # transform
                        out_ref[5:6, sl] = jnp.where(better, inst_f,
                                                     out_ref[5:6, sl])
                        flipped = back ^ flip      # flip: (1, 1) bcast
                        sel(6, jnp.where(flipped, 1.0, 0.0))
                    out_ref[7:8, sl] = out_ref[7:8, sl] + swept

                if gg:
                    kbits = k_1 & ~_LOWM
                    for g in range(GN):
                        slg = slice(g * GL, (g + 1) * GL)
                        bnd_g = jnp.max(jax.lax.bitcast_convert_type(
                            out_ref[0:1, slg], I32))

                        @pl.when(kbits < bnd_g)
                        def _(slg=slg):
                            sweep_cols(slg)
                else:
                    sweep_cols(slice(None))

            return r + PAIR, stop.astype(I32)

        jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))

        @pl.when(n > 0)
        def _():
            term_scr[0] = jnp.max(out_ref[0:1, :])


def _wl_any_inst_kernel(wt, bf_ref, su_ref, sl_ref, it_ref, tent_ref,
                        cbox_ref, slab_ref, inst_ref, od_ref, tmax_ref,
                        tmin_ref, occ_ref, mask_scr, term_scr):
    i = pl.program_id(0)
    item = bf_ref[i]
    first = (item & 2) != 0
    live = first | (term_scr[0] < 0.5)

    @pl.when(((item & 1) == 1) & live)
    def _():
        t_min = tmin_ref[0, 0]
        t_max = tmax_ref[0:1, :]
        rb = od_ref.shape[1]

        @pl.when(first)
        def _():
            occ_ref[0:1, :] = jnp.zeros((1, rb), F32)
            term_scr[0] = F32(0.0)

        cap_row = jnp.where(occ_ref[0:1, :] > 0.5, -BIG, t_max)
        enter, t_lo = _fine_enter(cbox_ref, od_ref, cap_row,
                                     floor=t_min)
        iota = _iota_sup()
        keys, n = _cluster_keys(enter, t_lo, iota)
        mask_scr[:, :] = keys
        rows2, _ = _rows_pair()
        oxl, oyl, ozl, dxl, dyl, dzl, _flip = _local_rays(inst_ref,
                                                          od_ref)

        def cond(c):
            return (c[0] < n) & (c[1] == 0)

        def body(c):
            r, _ = c
            cs_, vs_, _k1 = _pick_clusters(mask_scr, iota)
            tab = _pair_tab(slab_ref, cs_)
            _, _, _, _, ok = _isect_rows(
                tab, oxl, oyl, ozl, dxl, dyl, dzl, t_min, t_max,
                watertight=wt)
            _, okv = _seg_child_ok(rows2, cs_, vs_)
            if okv is not None:
                ok = ok & okv
            occ_ref[0:1, :] = jnp.maximum(occ_ref[0:1, :], jnp.where(
                jnp.any(ok, axis=0, keepdims=True), 1.0, 0.0))
            all_occ = jnp.min(occ_ref[0:1, :]) > 0.5
            return r + PAIR, all_occ.astype(I32)

        jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))

        @pl.when(n > 0)
        def _():
            term_scr[0] = jnp.min(occ_ref[0:1, :])


def _sweep_specs_inst(extra_row_specs, sw):
    """in_specs for the instanced sweep: per-(instance, super) child
    boxes by global super id, mesh-local slab (width sw) by local super
    id, the instance transform row, the block's rays, extras, SMEM
    t_min."""
    return [
        pl.BlockSpec((1, SUPER, 8),
                     lambda i, bf, su, sl, it, te: (su[i], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((SUPER * CLUSTER_SIZE, sw),
                     lambda i, bf, su, sl, it, te: (sl[i], 0),
                     memory_space=pltpu.VMEM),
        # (1, 1, 16) on a (I, 1, 16) view: a plain (1, 16) block on
        # (I, 16) violates Mosaic's sublane-divisibility rule and only
        # fails at COMPILE on hardware (interpret mode accepts it)
        pl.BlockSpec((1, 1, 16),
                     lambda i, bf, su, sl, it, te: (it[i], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9, RB),
                     lambda i, bf, su, sl, it, te:
                     (0, _block_idx(bf, i)),
                     memory_space=pltpu.VMEM),
    ] + extra_row_specs + [
        pl.BlockSpec((1, 1), lambda i, bf, su, sl, it, te: (0, 0),
                     memory_space=pltpu.SMEM),
    ]


def _item_locals(scene, sup):
    """Per-item local-slab super ids + instance ids from the global
    super ids (clipped: invalid items' ids are never dereferenced by a
    live kernel step)."""
    s = jnp.clip(sup, 0, scene.isup_local.shape[0] - 1)
    return (scene.isup_local[s].astype(I32),
            scene.isup_inst[s].astype(I32))


def _stack_fallback_closest(scene, origin, direction, t_min, watertight,
                            rp):
    """Capacity-overflow fallback for instanced mode: the XLA stack
    walker (no world soup exists to brute-sweep)."""
    from .traverse import _traverse

    s = _traverse(scene, origin, direction, F32(t_min), jnp.inf,
                  64, any_hit=False, watertight=watertight,
                  opacity_u=None, alpha_textures=False)
    t = jnp.where(jnp.isfinite(s.hit_t), s.hit_t, BIG)
    packed = jnp.stack([t, t, s.hit_u, s.hit_v,
                        s.hit_tri.astype(F32), s.hit_inst.astype(F32),
                        jnp.where(s.hit_back, 1.0, 0.0),
                        jnp.zeros_like(t)])
    return jnp.pad(packed, ((0, 0), (0, rp - origin.shape[0])))


def _capacity(nb, cs, mult=None):
    """Sweep-item capacity scales with the block count (smaller RB =
    more, tighter blocks = proportionally more items) under the SMEM
    hard cap; the round-2 RB=512 'collapse' was this cap not scaling —
    2048 blocks overflowed 16384 items and hit the dense fallback.

    `mult` (DCRT_WL_CAPM default) is the items-per-block budget:
    coherent camera bundles need ~16, but an INCOHERENT pool block
    enters ~180 supers at 212k tris (experiments/pair_econ.py) — the
    1080p pool silently rode the dense fallback until the pair-sweep
    path raised its own multiplier (pairsweep.PAIR_CAPM)."""
    m = CAPM if mult is None else mult
    return int(min(max(nb * m, 2048), MAX_COARSE, nb * cs))


def _mask_untouched(out, block_any, miss_value):
    keep = jnp.repeat(block_any, RB)[None, :]
    return jnp.where(keep, out, miss_value)


def _block_idx(it, i):
    return (it[i] >> _BLOCK_SHIFT) & _BLOCK_MASK


def _scene_exit(scene, od):
    """(1, rp) per-ray scene-bbox exit distance (+ pad), 0 = ray misses
    the whole scene. Initialising best-t here (instead of +inf) is what
    lets miss rays participate in early termination."""
    cbox = (scene.isup_sbox if _instanced(scene)
            else scene.cluster_bbox)
    bmin = jnp.min(cbox[:, 0:3], axis=0)
    bmax = jnp.max(cbox[:, 3:6], axis=0)
    t_lo = jnp.full((od.shape[1],), -BIG, F32)
    t_hi = jnp.full((od.shape[1],), BIG, F32)
    for ax in range(3):
        inv = od[6 + ax]
        a = (bmin[ax] - od[ax]) * inv
        b = (bmax[ax] - od[ax]) * inv
        t_lo = jnp.maximum(t_lo, jnp.minimum(a, b))
        t_hi = jnp.minimum(t_hi, jnp.maximum(a, b))
    tex = jnp.where((t_hi >= t_lo) & (t_hi >= 0.0), t_hi, 0.0)
    # the pad must exceed the packed-argmin truncation quantum
    # (_LOWM: ~2^-14 relative at SUPER=32) so a true hit at the
    # scene-bbox exit still truncates strictly below the miss sentinel
    return (tex * 1.001 + 1e-3)[None, :]


def _phases(scene, od, tm, interpret, cap_mult=None):
    """Phases A-B: descend to a per-block front-to-back SUPER item
    list for the fused sweep. Large scenes add a hyper level (dense
    hyper cull + one generic refine) so the dense cull never exceeds
    BT sublanes; the evolving best-t pruning below super level lives in
    the fused sweep kernel itself (a pre-expanded cluster frontier
    without it measured 8x worse — most clusters a ray's infinite line
    pierces are behind its first hit). cap_mult overrides the
    items-per-block capacity budget (incoherent-pool callers)."""
    tabs, cbox3, sboxv, cpad, cs, hyper = (
        _pad_tables_instanced(scene) if _instanced(scene)
        else _pad_tables(scene))
    nb = od.shape[1] // RB
    cap_s = _capacity(nb, cs, cap_mult)
    if hyper is not None:
        hsup, hboxv, nh, hs = hyper
        hm = 8 if cap_mult is None else max(8, cap_mult // 2)
        cap_h = int(min(max(nb * hm, 1024), MAX_HYPER, nb * nh))
        tlo_h = _cull_super(hboxv, od, tm, interpret=interpret)
        bfh, hyp, _th, total_h, _ = _compact_pairs(tlo_h, nh, cap_h)
        tlo_s = _refine_items(hsup, hs, bfh, hyp, od, tm, cap_h,
                              interpret)
        bf_s, sup, t_s, total_s = _expand_level(tlo_s, bfh, hyp, hs,
                                                cs, nb, cap_s)
        fits = (total_h <= cap_h) & (total_s <= cap_s)
    else:
        tlo_sd = _cull_super(sboxv, od, tm, interpret=interpret)
        bf_s, sup, t_s, total_s, _ = _compact_pairs(
            tlo_sd, cs, cap_s)
        fits = total_s <= cap_s
    # block_any must come from the FINAL super item list, not a coarser
    # level: the refine can cull every super of a block whose looser
    # hyper union-AABB was entered, and such a block gets no sweep item
    # (no 'first' write) — its output rows must be masked as misses,
    # never decoded (zero-filled buffers decode as t=0 false hits).
    block_any = jnp.zeros((nb,), jnp.bool_).at[
        jnp.clip(bf_s >> _BLOCK_SHIFT, 0, nb - 1)].max(
        (bf_s & 1) == 1, mode="drop")
    blkflags, sup, t_ent = _finish_items(
        bf_s >> _BLOCK_SHIFT, sup, t_s, total_s, cap_s)
    return tabs, cbox3, blkflags, sup, t_ent, fits, block_any, cap_s


def _sweep_specs(extra_row_specs, sw):
    """Common in_specs for the fused sweep: child boxes + triangle slab
    (width sw: 16 Baldwin-Weber cols, 13 raw-vertex cols watertight)
    index-mapped by the item's super id, the block's rays, then
    per-kernel extra (1, RB) rows and the SMEM t_min."""
    return [
        pl.BlockSpec((1, SUPER, 8), lambda i, bf, su, te: (su[i], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((SUPER * CLUSTER_SIZE, sw),
                     lambda i, bf, su, te: (su[i], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9, RB),
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


@functools.partial(jax.jit,
                   static_argnames=("interpret", "watertight",
                                    "grouped"))
def worklist_closest_pallas(scene, origin, direction, t_min=0.0,
                            interpret=False, watertight=False,
                            rows=None, t_cap=None, grouped=False):
    """Closest-hit via the fused hierarchical sweep. Returns
    (t, u, v, tri, inst, backface, iters) with t = +inf on miss and
    iters = clusters swept for the ray's block (traversal-cost
    counter). Batches over SLICE_RAYS run as sequential lax.map slices
    (one compiled body). rows=(o_rows, d_rows) each (3, R) is the
    rows-layout fast path (origin/direction then None): skips the
    ~7 ms/M-ray (R, 3) relayout.

    t_cap (traced scalar or per-ray (R,) row; scalar only with rows=)
    caps the search window: only hits with t < ~t_cap are reported
    (hits within one argmin-truncation quantum above t_cap may still
    be reported; anything decoding as a miss is guaranteed to have no
    hit strictly below t_cap). Capping tightens BOTH prunes — the
    per-ray fine-enter cull and the bundle-max early break start at
    min(scene_exit, t_cap) instead of the scene exit — which is the
    slab-marching lever for incoherent pools: a capped pass answers
    most rays cheaply, the compacted remainder re-casts with the full
    window (accel.traverse.intersect_closest_slab)."""
    cap_arr = (t_cap is not None
               and getattr(jnp.asarray(t_cap), "ndim", 0) == 1)
    if rows is not None:
        assert not cap_arr, "per-ray t_cap unsupported with rows="
        if rows[0].shape[1] > SLICE_RAYS:
            (os_, ds_), r = _slice_rays_rows(rows)
            outs = jax.lax.map(
                lambda od: _closest_impl(scene, None, None, t_min,
                                         interpret, watertight,
                                         rows=(od[0], od[1]),
                                         t_cap=t_cap, grouped=grouped),
                (os_, ds_))
            return jax.tree_util.tree_map(
                lambda x: x.reshape(-1, *x.shape[2:])[:r], outs)
        return _closest_impl(scene, None, None, t_min, interpret,
                             watertight, rows=rows, t_cap=t_cap,
                             grouped=grouped)
    if origin.shape[0] > SLICE_RAYS:
        if cap_arr:
            (os_, ds_, cs_), r = _slice_rays(
                origin, direction, extra=jnp.asarray(t_cap, F32))
            outs = jax.lax.map(
                lambda odc: _closest_impl(scene, odc[0], odc[1], t_min,
                                          interpret, watertight,
                                          t_cap=odc[2],
                                          grouped=grouped),
                (os_, ds_, cs_))
        else:
            (os_, ds_), r = _slice_rays(origin, direction)
            outs = jax.lax.map(
                lambda od: _closest_impl(scene, od[0], od[1], t_min,
                                         interpret, watertight,
                                         t_cap=t_cap, grouped=grouped),
                (os_, ds_))
        return jax.tree_util.tree_map(
            lambda x: x.reshape(-1, *x.shape[2:])[:r], outs)
    return _closest_impl(scene, origin, direction, t_min, interpret,
                         watertight, t_cap=t_cap, grouped=grouped)


def _slice_rays_rows(rows, extra=None):
    """Rows variant of _slice_rays: (3, R) pads on the lane axis and
    reshapes to (k, 3, SLICE_RAYS) for lax.map."""
    o_rows, d_rows = rows
    r = o_rows.shape[1]
    k = -(-r // SLICE_RAYS)
    pad = k * SLICE_RAYS - r
    dfix = jnp.asarray([1.0, 0.0, 0.0], F32)[:, None]
    o = jnp.pad(o_rows, ((0, 0), (0, pad)), constant_values=_FAR)
    d = (jnp.concatenate([d_rows, jnp.tile(dfix, (1, pad))], axis=1)
         if pad else d_rows)
    out = (jnp.moveaxis(o.reshape(3, k, SLICE_RAYS), 1, 0),
           jnp.moveaxis(d.reshape(3, k, SLICE_RAYS), 1, 0))
    if extra is not None:
        e = jnp.concatenate([extra, jnp.zeros((pad,), F32)], axis=0)
        out = out + (e.reshape(k, SLICE_RAYS),)
    return out, r


def _closest_impl(scene, origin, direction, t_min, interpret,
                  watertight=False, rows=None, t_cap=None,
                  grouped=False):
    if rows is not None:
        od, tm, r = _prep_rays_wl_rows(rows[0], rows[1])
    else:
        od, tm, r = _prep_rays_wl(origin, direction)
    rp = od.shape[1]
    texp = _scene_exit(scene, od)
    if t_cap is not None:
        # cap the search window: the init sentinel AND the cull t
        # ceiling shrink to ~t_cap (padded past the argmin truncation
        # quantum like _scene_exit, so a true hit just below the cap
        # still truncates strictly under the miss sentinel). t_cap is
        # a scalar or a per-ray (R,) row (slab marching uses
        # entry-relative caps so stand-off camera rays get a useful
        # window too).
        capp = jnp.asarray(t_cap, F32) * 1.001 + 1e-3
        if capp.ndim == 1:
            capp = jnp.pad(capp, (0, rp - r))[None, :]
        texp = jnp.minimum(texp, capp)
        tm = jnp.minimum(tm, capp)
    tabs, cbox3, blkflags, sup, t_ent, fits, block_any, cap_s = _phases(
        scene, od, tm, interpret,
        cap_mult=(GROUP_CAPM if grouped else None))
    ctab = tabs[0] if watertight else tabs[1]
    tmin_arr = jnp.full((1, 1), t_min, F32)
    inst_mode = _instanced(scene)
    assert not (grouped and inst_mode), \
        "grouped sweep: instanced scenes resolve to the bundle kernels"

    def wl_path(_):
        scratch = [pltpu.VMEM((SUPER, GN if grouped else 1), I32),
                   pltpu.SMEM((1,), F32)]
        if grouped:
            scratch.append(pltpu.SMEM((1,), I32))
        if inst_mode:
            sl, it = _item_locals(scene, sup)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=5,
                grid=(cap_s,),
                in_specs=_sweep_specs_inst([
                    pl.BlockSpec((1, RB),
                                 lambda i, bf, su, sl, it, te:
                                 (0, _block_idx(bf, i)),
                                 memory_space=pltpu.VMEM),
                ], 13 if watertight else 16),
                out_specs=pl.BlockSpec(
                    (8, RB),
                    lambda i, bf, su, sl, it, te:
                    (0, _block_idx(bf, i)),
                    memory_space=pltpu.VMEM),
                scratch_shapes=scratch,
            )
            out = pl.pallas_call(
                functools.partial(_wl_closest_inst_kernel, watertight,
                                  _GG),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((8, rp), F32),
                interpret=interpret,
            )(blkflags, sup, sl, it, t_ent, cbox3, ctab,
              scene.inst_rows[:, None, :], od, texp, tmin_arr)
        else:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(cap_s,),
                in_specs=_sweep_specs([
                    pl.BlockSpec((1, RB),
                                 lambda i, bf, su, te:
                                 (0, _block_idx(bf, i)),
                                 memory_space=pltpu.VMEM),
                ], 13 if watertight else 16),
                out_specs=pl.BlockSpec(
                    (8, RB),
                    lambda i, bf, su, te: (0, _block_idx(bf, i)),
                    memory_space=pltpu.VMEM),
                scratch_shapes=scratch,
            )
            kern = (functools.partial(_wlg_closest_kernel, watertight)
                    if grouped
                    else functools.partial(_wl_closest_kernel,
                                           watertight, _GG))
            out = pl.pallas_call(
                kern,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((8, rp), F32),
                interpret=interpret,
            )(blkflags, sup, t_ent, cbox3, ctab, od, texp, tmin_arr)
        miss = jnp.asarray([BIG, BIG, 0, 0, 0, 0, 0, 0], F32)[:, None]
        return _mask_untouched(out, block_any, miss)

    def fallback(_):
        # rows-path callers materialize (R, 3) only inside this branch
        # (lax.cond branch bodies run only when taken, so the relayout
        # is paid exclusively on capacity overflow)
        o_rect = rows[0].T if origin is None else origin
        d_rect = rows[1].T if direction is None else direction
        if inst_mode:
            return _stack_fallback_closest(scene, o_rect, d_rect,
                                           t_min, watertight, rp)
        from .pallas_brute import clustered_closest_pallas

        t, u, v, tri, inst, back = clustered_closest_pallas(
            scene, o_rect, d_rect, t_min, interpret=interpret,
            watertight=watertight)
        t = jnp.where(jnp.isinf(t), BIG, t)
        packed = jnp.stack([t, t, u, v, tri.astype(F32),
                            inst.astype(F32),
                            jnp.where(back, 1.0, 0.0),
                            jnp.zeros_like(t)])
        return jnp.pad(packed, ((0, 0), (0, rp - r)))

    out7 = jax.lax.cond(fits, wl_path, fallback, 0)

    # POST is pure slicing: the kernel already picked the winner's
    # exact t / u / v / triangle / instance / facing via the packed
    # argmin (no gathers — measured 4x cheaper than re-fetching the
    # winning triangle from HBM at 1M rays)
    win = jax.lax.bitcast_convert_type(out7[0, :r], I32)
    t_dec = jax.lax.bitcast_convert_type(win & ~_LOWM, F32)
    # compare truncated-to-truncated: the miss sentinel is texp's
    # packed init, whose decode is trunc(texp); the fallback's plain t
    # decodes to trunc(t) <= t and its misses are already BIG
    texp_trunc = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(texp[0, :r], I32) & ~_LOWM, F32)
    t = jnp.where(t_dec >= texp_trunc, BIG, out7[1, :r])
    u = jnp.clip(out7[2, :r], 0.0, 1.0)
    v = jnp.clip(out7[3, :r], 0.0, 1.0)
    tri = out7[4, :r].astype(I32)
    inst = out7[5, :r].astype(I32)
    backface = out7[6, :r] > 0.5
    iters = out7[7, :r].astype(I32)

    hit = t < BIG
    t = jnp.where(hit, t, jnp.inf)
    u = jnp.where(hit, u, 0.0)
    v = jnp.where(hit, v, 0.0)
    tri = jnp.where(hit, tri, 0)
    inst = jnp.where(hit, inst, 0)
    backface = backface & hit
    return t, u, v, tri, inst, backface, iters


@functools.partial(jax.jit,
                   static_argnames=("interpret", "watertight",
                                    "grouped"))
def worklist_any_pallas(scene, origin, direction, t_max, t_min=0.0,
                        interpret=False, watertight=False, rows=None,
                        grouped=False):
    """Occlusion query via the fused hierarchical sweep. The cull is
    t_max-aware per ray: clusters beyond a ray's occlusion range are
    never entered by it (shadow rays cull past the light).
    rows=(o_rows, d_rows) each (3, R) is the rows-layout fast path
    (origin/direction then None)."""
    if rows is not None:
        nr = rows[0].shape[1]
        if nr > SLICE_RAYS:
            tmf = jnp.broadcast_to(jnp.asarray(t_max, F32), (nr,))
            (os_, ds_, tms), r = _slice_rays_rows(rows, tmf)
            occ = jax.lax.map(
                lambda odt_: _any_impl(scene, None, None, odt_[2],
                                       t_min, interpret, watertight,
                                       rows=(odt_[0], odt_[1]),
                                       grouped=grouped),
                (os_, ds_, tms))
            return occ.reshape(-1)[:r]
        return _any_impl(scene, None, None, t_max, t_min, interpret,
                         watertight, rows=rows, grouped=grouped)
    if origin.shape[0] > SLICE_RAYS:
        tmf = jnp.broadcast_to(jnp.asarray(t_max, F32),
                               (origin.shape[0],))
        (os_, ds_, tms), r = _slice_rays(origin, direction, tmf)
        occ = jax.lax.map(
            lambda odt_: _any_impl(scene, odt_[0], odt_[1], odt_[2],
                                   t_min, interpret, watertight,
                                   grouped=grouped),
            (os_, ds_, tms))
        return occ.reshape(-1)[:r]
    return _any_impl(scene, origin, direction, t_max, t_min, interpret,
                     watertight, grouped=grouped)


def _any_impl(scene, origin, direction, t_max, t_min, interpret,
              watertight=False, rows=None, grouped=False):
    if rows is not None:
        od, tm, r = _prep_rays_wl_rows(rows[0], rows[1], t_max=t_max)
    else:
        od, tm, r = _prep_rays_wl(origin, direction, t_max=t_max)
    rp = od.shape[1]
    tabs, cbox3, blkflags, sup, t_ent, fits, block_any, cap_s = _phases(
        scene, od, tm, interpret,
        cap_mult=(GROUP_CAPM if grouped else None))
    ctab = tabs[0] if watertight else tabs[1]
    tmin_arr = jnp.full((1, 1), t_min, F32)
    inst_mode = _instanced(scene)
    assert not (grouped and inst_mode), \
        "grouped sweep: instanced scenes resolve to the bundle kernels"

    def wl_path(_):
        scratch = [pltpu.VMEM((SUPER, GN if grouped else 1), I32),
                   pltpu.SMEM((1,), F32)]
        if grouped:
            scratch.append(pltpu.SMEM((1,), I32))
        if inst_mode:
            sl, it = _item_locals(scene, sup)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=5,
                grid=(cap_s,),
                in_specs=_sweep_specs_inst([
                    pl.BlockSpec((1, RB),
                                 lambda i, bf, su, sl, it, te:
                                 (0, _block_idx(bf, i)),
                                 memory_space=pltpu.VMEM),
                ], 13 if watertight else 16),
                out_specs=pl.BlockSpec(
                    (1, RB),
                    lambda i, bf, su, sl, it, te:
                    (0, _block_idx(bf, i)),
                    memory_space=pltpu.VMEM),
                scratch_shapes=scratch,
            )
            occ = pl.pallas_call(
                functools.partial(_wl_any_inst_kernel, watertight),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((1, rp), F32),
                interpret=interpret,
            )(blkflags, sup, sl, it, t_ent, cbox3, ctab,
              scene.inst_rows[:, None, :], od, tm, tmin_arr)
        else:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(cap_s,),
                in_specs=_sweep_specs([
                    pl.BlockSpec((1, RB),
                                 lambda i, bf, su, te:
                                 (0, _block_idx(bf, i)),
                                 memory_space=pltpu.VMEM),
                ], 13 if watertight else 16),
                out_specs=pl.BlockSpec(
                    (1, RB),
                    lambda i, bf, su, te: (0, _block_idx(bf, i)),
                    memory_space=pltpu.VMEM),
                scratch_shapes=scratch,
            )
            kern = (functools.partial(_wlg_any_kernel, watertight)
                    if grouped
                    else functools.partial(_wl_any_kernel, watertight,
                                           _GG))
            occ = pl.pallas_call(
                kern,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((1, rp), F32),
                interpret=interpret,
            )(blkflags, sup, t_ent, cbox3, ctab, od, tm, tmin_arr)
        return _mask_untouched(occ, block_any, 0.0)

    def fallback(_):
        # rows-path callers materialize (R, 3) only inside this branch
        o_rect = rows[0].T if origin is None else origin
        d_rect = rows[1].T if direction is None else direction
        if inst_mode:
            from .traverse import _traverse

            s = _traverse(scene, o_rect, d_rect, F32(t_min),
                          jnp.broadcast_to(jnp.asarray(t_max, F32),
                                           (r,)),
                          64, any_hit=True, watertight=watertight,
                          opacity_u=None, alpha_textures=False)
            return jnp.pad(jnp.where(s.occluded, 1.0, 0.0),
                           (0, rp - r))[None, :]
        from .pallas_brute import clustered_any_pallas

        occ = clustered_any_pallas(scene, o_rect, d_rect, t_max, t_min,
                                   interpret=interpret,
                                   watertight=watertight)
        return jnp.pad(jnp.where(occ, 1.0, 0.0), (0, rp - r))[None, :]

    occ = jax.lax.cond(fits, wl_path, fallback, 0)
    return occ[0, :r] > 0.5

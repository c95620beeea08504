"""Wavefront integrator: fixed path pool, masked stages, block-cursor refill.

TPU re-design of the reference's persistent streaming path tracer
(reference: Source/WavefrontPathTracer.cpp + Shaders/WavefrontPathTracing.hlsl
— a 262,144-path pool in SoA buffers driven by CONTROL / NEW_PATH /
MATERIAL / EXTENSION_RAY_CAST / SHADOW_RAY_CAST kernels, with wave-ballot
queue compaction, ExecuteIndirect variable dispatch, and a global atomic
block cursor handing 32-pixel blocks to idle waves).

The TPU mapping (SURVEY.md §2d): queues become fixed-capacity masked
lanes (no atomics — whole-pool masks and cumsum ranks replace ballots and
interlocked adds); ExecuteIndirect becomes full-width masked stages;
the block cursor becomes a scalar pixel cursor carried in the loop state;
and one `lax.while_loop` iteration fuses the reference's per-iteration
kernel chain (control -> new-path -> material -> extension cast -> shadow
cast) into a single compiled step, merging primary and extension rays
into ONE closest-hit traversal per iteration.

Per-path arithmetic (RNG draw order, NEE + MIS, BSDF sampling, implicit
light evaluation) is the megakernel's, op for op, which makes the two
integrators mutual oracles at a fixed seed — the reference relies on the
same property (Samples.inc.hlsl:59-70 counter seeding).
"""

import os as _os
import time

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..accel.traverse import intersect_any, intersect_closest
from ..bsdf.dispatch import evaluate_bsdf, evaluate_bsdf_pdf, sample_bsdf
from ..camera.camera import generate_ray
from ..core.constants import LIGHT_INDEX_INVALID
from ..lights.lights import (
    evaluate_env,
    evaluate_light_direct,
    sample_light_direct,
)
from ..rng.xoshiro import init_rng, next_sample_1d, next_sample_2d, \
    next_sample_3d
from ..sampling.montecarlo import power_heuristic
from .common import (
    RenderConfig,
    offset_ray_origin,
    pool_cast_backend,
    pool_slab_cfg as _pool_slab_cfg,
    shade_hit,
    slab_depth as _slab_depth,
    slab_enabled as _slab_enabled,
)
from .megakernel import _mesh_light_camera_eval

F32 = jnp.float32
I32 = jnp.int32
U32 = jnp.uint32

# Telemetry from the most recent chunked render_samples_wavefront call
# (the reference reads the same facts back from its queue-counter
# staging ring, Source/WavefrontPathTracer.cpp:476-523): iteration
# count, dispatch count, pause time, resolved pool backend, per-chunk
# wall times. bench.py copies this into its JSON `extra` so driver runs
# record WHERE the headline time goes, not just the total.
LAST_STATS = {}


def _sel(mask, new, old):
    if new.ndim > mask.ndim:
        mask = mask.reshape(mask.shape + (1,) * (new.ndim - mask.ndim))
    return jnp.where(mask, new, old)


class PoolState(NamedTuple):
    """SoA path-pool state (the analogue of the reference's ray / rayHit /
    pixelPosition / rng / pathAccumulation / flags buffers,
    WavefrontPathTracer.cpp:120-210)."""
    rng: jnp.ndarray        # (P, 4) u32 xoshiro state
    pixel: jnp.ndarray      # (P,) i32 pixel index into the frame batch
    ray_o: jnp.ndarray      # (P, 3)
    ray_d: jnp.ndarray      # (P, 3)
    throughput: jnp.ndarray  # (P, 3)
    li: jnp.ndarray         # (P, 3)
    bsdf_pdf: jnp.ndarray   # (P,) pdf of the sampled BSDF dir (for MIS)
    is_delta: jnp.ndarray   # (P,) bool delta-lobe flag
    bounce: jnp.ndarray     # (P,) i32
    opacity_u: jnp.ndarray  # (P,) f32 pre-drawn alpha-test sample
    busy: jnp.ndarray       # (P,) bool lane holds a live path
    cursor: jnp.ndarray     # () i32 next unassigned pixel
    # film accumulation (per-pixel)
    out_pos: jnp.ndarray    # (R, 2) sample jitter
    out_val: jnp.ndarray    # (R, 3) radiance


def render_samples_wavefront(scene, luts, cam, cfg: RenderConfig, pixel_x,
                             pixel_y, frame_seed, pool_size=None,
                             iterations_per_dispatch=None, spp_batch=1,
                             sample_slots=False):
    """Trace spp_batch samples per pixel (default 1; same contract as
    megakernel.render_samples), computed through the path pool.

    With iterations_per_dispatch=N the streaming loop runs as a host
    loop of bounded N-iteration device dispatches — the reference's
    m_IterationPerFrame chunking (WavefrontPathTracer.cpp:84, 470-473).
    Besides frame pacing, bounded dispatches matter operationally: the
    axon TPU tunnel kills single dispatches longer than a few minutes
    (docs/KNOWN_ISSUES.md), which an unbounded 1080p pool drain hits.
    None = one fused dispatch (fastest when it fits).

    spp_batch > 1 interleaves S progressive samples in ONE pool pass
    (lane seed = frame_seed + sample index, so every (pixel, sample)
    path's ARITHMETIC is identical op-for-op to S sequential passes;
    the per-pixel radiance sum can differ from the sequential order by
    fp addition association only — samples of one pixel retire in lane
    order, not sample order — an envelope bench.py gates at RMSE 1e-3
    on the stand-in scene). Beyond amortizing sorts and
    dispatch latency S-fold, this is the TPU coherence lever: cursor
    slots go pixel-major, so a refilled ray bundle holds S samples of
    each pixel instead of one — same-origin rays that the coherence
    sort then groups, keeping bundle frusta tight at every bounce
    depth (one sample per pixel leaves ~8 rays per Morton cell at
    1080p, so 1024-ray bundles span ~128 cells and sweep most of the
    hierarchy). Box-filter accumulation sums per pixel by default;
    sample_slots=True returns per-(pixel, sample) position/value slots
    (pixel-major) so splatting reconstruction filters work on this
    path too (see render_samples_wavefront_pure)."""
    if iterations_per_dispatch is None:
        return _render_whole(scene, luts, cam, cfg, pixel_x, pixel_y,
                             frame_seed, pool_size, spp_batch,
                             sample_slots)
    RT = pixel_x.shape[0] * spp_batch
    state = _init_state(scene, luts, cam, cfg, pixel_x, pixel_y,
                        frame_seed, pool_size, spp_batch, sample_slots)
    pause = dispatch_pause_s()
    stats = {"iters": 0, "dispatches": 0, "pause_s": 0.0,
             "chunk_s": [], "cursor": [],
             "pool_backend": pool_cast_backend(cfg),
             "pool_size": int(state.busy.shape[0]),
             "spp_batch": int(spp_batch), "items": int(RT)}
    LAST_STATS.clear()
    LAST_STATS.update(stats)
    while True:
        t0 = time.perf_counter()
        state, it = _chunk(scene, luts, cam, cfg, pixel_x, pixel_y,
                           frame_seed, state, pool_size,
                           int(iterations_per_dispatch), spp_batch,
                           sample_slots)
        done = not (int(state.cursor) < RT or bool(jnp.any(state.busy)))
        stats["chunk_s"].append(round(time.perf_counter() - t0, 3))
        stats["cursor"].append(int(state.cursor))
        stats["iters"] += int(it)
        stats["dispatches"] += 1
        if done:
            break
        if pause:
            # through the axon tunnel the chip must go IDLE between
            # dispatches: back-to-back ~55 s dispatches (readback-only
            # gaps) kill the worker after ~400 s of continuous
            # occupancy, while the same sequence with short host
            # sleeps completes (docs/KNOWN_ISSUES.md, measured on the
            # 1080p stand-in drain)
            time.sleep(pause)
            stats["pause_s"] += pause
    stats["pause_s"] = round(stats["pause_s"], 1)
    LAST_STATS.update(stats)
    return state.out_pos, state.out_val


def tunnel_paced():
    """True when dispatches run through the axon TPU tunnel, whose
    watchdog kills the worker after ~400 s of CONTINUOUS device
    occupancy (docs/KNOWN_ISSUES.md) — host loops must then bound
    per-dispatch wall time AND leave idle gaps between dispatches.

    Gated on the RESOLVED backend, not just the env var: tests (and
    any in-process platform redirect) run on a virtual CPU mesh while
    JAX_PLATFORMS still says "axon" in the shell env — those runs must
    not pay real host sleeps per dispatch."""
    if "axon" not in _os.environ.get("JAX_PLATFORMS", ""):
        return False
    try:
        import jax
        return jax.default_backend() == "tpu"
    except Exception:
        return True  # can't resolve: assume tunnel, pacing is cheap


def paced_iterations_per_dispatch():
    """Pool iterations per bounded dispatch on the paced tunnel.
    Sized so a dispatch stays well inside the proven-safe occupancy
    envelope (~29 s busy + 2 s idle ran clean, docs/KNOWN_ISSUES.md):
    grouped-sweep pool iterations run ~0.8-1.3 s at 1080p, so 16
    iterations ≈ 13-21 s busy per dispatch and the fixed 2 s idle gap
    costs ~10% instead of the old 8-iteration ~20%."""
    return int(_os.environ.get("DCRT_WF_PACED_ITERS", "16"))


def dispatch_pause_s():
    """Idle gap to insert between chunked dispatches (0 off-tunnel)."""
    if not tunnel_paced():
        return 0.0
    return float(_os.environ.get("DCRT_DISPATCH_PAUSE_S", "2.0"))


@partial(jax.jit, static_argnames=("cfg", "pool_size", "spp_batch",
                                   "sample_slots"))
def _init_state(scene, luts, cam, cfg, pixel_x, pixel_y, frame_seed,
                pool_size=None, spp_batch=1, sample_slots=False):
    return _make_state(cfg, pixel_x.shape[0], pool_size, spp_batch,
                       sample_slots)


@partial(jax.jit, static_argnames=("cfg", "pool_size", "max_iters",
                                   "spp_batch", "sample_slots"))
def _chunk(scene, luts, cam, cfg, pixel_x, pixel_y, frame_seed, state,
           pool_size, max_iters, spp_batch=1, sample_slots=False):
    """One bounded dispatch of the streaming loop. Returns
    (state, iterations_executed) — the count feeds LAST_STATS, the
    analogue of the reference's queue-counter readback telemetry."""
    cond, step = _loop_fns(scene, luts, cam, cfg, pixel_x, pixel_y,
                           frame_seed, pixel_x.shape[0], spp_batch,
                           sample_slots)

    def cond2(carry):
        s, j = carry
        return cond(s) & (j < max_iters)

    def step2(carry):
        s, j = carry
        return step(s), j + 1

    out, it = jax.lax.while_loop(cond2, step2, (state, jnp.int32(0)))
    return out, it


def _pool_capacity(R, pool_size):
    if pool_size is not None:
        return pool_size
    # a pool ~R/4 keeps occupancy high while idle lanes refill
    # (measured at 256^2 glossy Cornell: P=R/4 runs 90.8 ms/spp vs
    # 167 at P=2R — within 1.12x of the megakernel's 80.9);
    # clamped to [2^13, cap]. The reference stops at a 262,144-path
    # pool (WavefrontPathTracer.cpp:25-28) because its queues live in
    # fixed GPU buffers; HBM has no such reason — at 1080p a fatter
    # pool packs MORE DISTINCT PIXELS into flight, so the sorted
    # bounce bundles cover a denser image footprint with tighter
    # frusta (the per-iteration sweep cost at a fixed pool was
    # measured to GROW with resolution for exactly this sparsity
    # reason). DCRT_POOL_LOG2 overrides the cap.
    cap = int(_os.environ.get("DCRT_POOL_LOG2", "18"))
    quarter = max(R // 4, 1)
    P = 1 << max(13, min(cap, quarter.bit_length() - 1))
    return min(P, 1 << (R - 1).bit_length())


def _make_state(cfg, R, pool_size, spp_batch=1, sample_slots=False):
    P = _pool_capacity(R * spp_batch, pool_size)
    OUT = R * spp_batch if sample_slots else R
    rng0 = init_rng(jnp.zeros(P, U32), jnp.zeros(P, U32), jnp.uint32(0))
    return PoolState(
        rng=rng0,
        pixel=jnp.full(P, -1, I32),
        ray_o=jnp.zeros((P, 3), F32),
        ray_d=jnp.zeros((P, 3), F32),
        throughput=jnp.ones((P, 3), F32),
        li=jnp.zeros((P, 3), F32),
        bsdf_pdf=jnp.zeros(P, F32),
        is_delta=jnp.zeros(P, bool),
        bounce=jnp.zeros(P, I32),
        opacity_u=jnp.zeros(P, F32),
        busy=jnp.zeros(P, bool),
        cursor=jnp.asarray(0, I32),
        out_pos=jnp.zeros((OUT, 2), F32),
        out_val=jnp.zeros((OUT, 3), F32),
    )


def render_samples_wavefront_pure(scene, luts, cam, cfg: RenderConfig,
                                  pixel_x, pixel_y, frame_seed,
                                  pool_size=None, spp_batch=1,
                                  sample_slots=False):
    """Un-jitted whole-loop wavefront pass: trace spp_batch samples per
    pixel draining the pool to completion. For embedding in larger
    programs (e.g. a shard_map distributed step); same contract as
    megakernel.render_samples. sample_slots=True keeps EVERY
    (pixel, sample) position/value in its own output slot
    (pixel-major, slot = pixel * spp_batch + sample) so non-box
    reconstruction filters can convolve each interleaved sample — the
    reference's splatting film keeps per-sample position textures the
    same way (Source/SampleConvolution.cpp:89-170)."""
    R = pixel_x.shape[0]
    state = _make_state(cfg, R, pool_size, spp_batch, sample_slots)
    cond, step = _loop_fns(scene, luts, cam, cfg, pixel_x, pixel_y,
                           frame_seed, R, spp_batch, sample_slots)
    out = jax.lax.while_loop(cond, step, state)
    return out.out_pos, out.out_val


@partial(jax.jit, static_argnames=("cfg", "pool_size", "spp_batch",
                                   "sample_slots"))
def _render_whole(scene, luts, cam, cfg: RenderConfig, pixel_x,
                  pixel_y, frame_seed, pool_size=None, spp_batch=1,
                  sample_slots=False):
    return render_samples_wavefront_pure(scene, luts, cam, cfg,
                                         pixel_x, pixel_y, frame_seed,
                                         pool_size, spp_batch,
                                         sample_slots)


def _park(mask, o, d):
    """Replace masked-out lanes' rays with a far off-scene ray (finite
    stale rays left in place form garbage bundles that sweep the whole
    hierarchy)."""
    far = jnp.float32(2e9)
    return (jnp.where(mask[:, None], o, far),
            jnp.where(mask[:, None], d,
                      jnp.asarray([1.0, 0.0, 0.0], jnp.float32)))


def _pool_closest(scene, cfg, busy, ray_o, ray_d, opacity_u):
    """Closest-hit cast over the pool IN LANE ORDER (the step permutes
    the whole pool into coherent key order once per iteration — see
    _permute_pool — so no per-cast sort is needed). Idle lanes cast a
    parked far ray. With the effective pool slab config enabled
    (pool_slab_march / slab_march) the cast marches geometric distance
    windows (accel.traverse.intersect_closest_slab)."""
    ray_o, ray_d = _park(busy, ray_o, ray_d)
    bk = pool_cast_backend(cfg)
    cfg = _pool_slab_cfg(cfg)
    if not _slab_enabled(scene, cfg, bk):
        return intersect_closest(
            scene, ray_o, ray_d, cfg.stack_size,
            backend=bk, watertight=cfg.watertight,
            opacity_u=opacity_u, alpha_textures=cfg.any_hit_texture)
    from ..accel.traverse import intersect_closest_slab

    return intersect_closest_slab(
        scene, ray_o, ray_d, cfg.stack_size, _slab_depth(scene, cfg),
        backend=bk, watertight=cfg.watertight,
        opacity_u=opacity_u, alpha_textures=cfg.any_hit_texture,
        live=busy, phases=cfg.slab_phases)


def _pool_any(scene, cfg, active, shadow_o, shadow_d, distance,
              opacity_u):
    """Any-hit cast over the pool in lane order (shadow origins sit at
    the bounced hit points, so they inherit the pool permutation's
    coherence). Inactive lanes park and cast a zero-length ray.

    cfg.slab_march > 0 runs the occlusion query in two distance slabs
    (no kernel change needed — the any cast's t_max is already the
    per-ray window): phase 1 over (0, min(dist, D)), then the
    still-unoccluded rays with dist > D compact to the front and
    re-run the full window floored at D. Exact: phase 1's verdict is
    exhaustive for its window, so occluded = occ1 | occ2 on the
    remainder."""
    dist = jnp.where(active, distance, 0.0)
    # park inactive lanes' stale rays (see _pool_closest): the
    # zero-length t_max alone does not protect the alpha path, whose
    # recast loop runs a closest cast with no t_max cap
    o_s, d_s = _park(active, shadow_o, shadow_d)
    bk = pool_cast_backend(cfg)
    cfg = _pool_slab_cfg(cfg)
    if not _slab_enabled(scene, cfg, bk):
        return intersect_any(
            scene, o_s, d_s, dist, cfg.stack_size,
            backend=bk, watertight=cfg.watertight,
            opacity_u=opacity_u, alpha_textures=cfg.any_hit_texture)

    D = _slab_depth(scene, cfg)
    occ1 = intersect_any(
        scene, o_s, d_s, jnp.minimum(dist, D), cfg.stack_size,
        backend=bk, watertight=cfg.watertight,
        opacity_u=opacity_u, alpha_textures=cfg.any_hit_texture)
    need = active & ~occ1 & (dist > D)
    liv = need.astype(I32)
    n_need = jnp.sum(liv)
    pos = jnp.where(need, jnp.cumsum(liv) - 1,
                    n_need + jnp.cumsum(1 - liv) - 1)

    def perm(x):
        return jnp.zeros_like(x).at[pos].set(x)

    o2, d2 = _park(need, o_s, d_s)
    # phase 2 floors the window at D (kernel t_min + fine-enter prune
    # skip the near field; phase 1 was exhaustive below D; alpha casts
    # floor the recast loop's first pass only — see _alpha_recast)
    occ2 = intersect_any(
        scene, perm(o2), perm(d2), perm(jnp.where(need, dist, 0.0)),
        cfg.stack_size, t_min=D, backend=bk,
        watertight=cfg.watertight,
        opacity_u=None if opacity_u is None else perm(opacity_u),
        alpha_textures=cfg.any_hit_texture)
    return occ1 | (need & occ2[pos])


def _permute_pool(scene, busy, ray_o, ray_d, lanes):
    """Permute the pool's whole lane-space working set into coherent
    extension-ray key order (octant + origin-Morton, idle lanes last).
    ONE argsort + one gather per array per iteration replaces the old
    per-cast sort/unsort pair, and the shadow cast inherits the order
    for free (its origins are these rays' hit points; sort keys are
    origin-window-dominated, docs/PERF.md). Lane identity is invisible
    to the film — seeds and film indices are pixel-based — so the
    radiance sum is bit-identical to the unpermuted pool. The
    reference gets the equivalent locality from block-local pixel
    assignment + wave compaction (WavefrontPathTracing.hlsl:444-478,
    558-602)."""
    from .common import ray_sort_key

    root_lo = scene.node_bbox_min[0]
    root_hi = scene.node_bbox_max[0]
    inv_ext = 1.0 / jnp.maximum(root_hi - root_lo, 1e-6)
    key = ray_sort_key(ray_o, ray_d, root_lo, inv_ext)
    key = jnp.where(busy, key, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(key)
    return tuple(x[order] for x in (busy, ray_o, ray_d) + tuple(lanes))


def _loop_fns(scene, luts, cam, cfg, pixel_x, pixel_y, frame_seed, R,
              spp_batch=1, sample_slots=False):
    """(cond, step) for the streaming loop — shared by the fused
    single-dispatch path and the host-chunked driver. The cursor walks
    R * spp_batch virtual (pixel, sample) items pixel-major (sample s
    of pixel p at p * spp_batch + s; lane seed = frame_seed + s)."""
    env_idx = U32(cfg.env_light_index if cfg.has_env_light
                  else LIGHT_INDEX_INVALID)
    RT = R * spp_batch

    def cond(s):
        return (s.cursor < RT) | jnp.any(s.busy)

    def step(s):
        # ---- NEW_PATH: refill idle lanes from the pixel cursor ----------
        # (reference: CONTROL's idle-wave block pull,
        # WavefrontPathTracing.hlsl:558-602, + NEW_PATH :176-255)
        idle = ~s.busy
        rank = jnp.cumsum(idle.astype(I32)) - 1          # rank among idle
        navail = jnp.maximum(RT - s.cursor, 0)
        take = idle & (rank < navail)
        pixel_new = jnp.where(take, s.cursor + rank, s.pixel)
        cursor_new = s.cursor + jnp.minimum(jnp.sum(idle.astype(I32)),
                                            navail)
        vidx = jnp.clip(pixel_new, 0, RT - 1)
        pidx = vidx // spp_batch if spp_batch > 1 else vidx
        px = pixel_x[pidx]
        py = pixel_y[pidx]

        seed = frame_seed
        if spp_batch > 1:
            seed = frame_seed + (vidx % spp_batch).astype(U32)
        fresh_rng = init_rng(px, py, seed)
        rng = _sel(take, fresh_rng, s.rng)
        rng, pixel_sample = _m2(rng, take)
        res = jnp.asarray([cfg.width, cfg.height], F32)
        pix = jnp.stack([px, py], axis=-1).astype(F32)
        film_sample = (pixel_sample + pix) / res
        rng, aperture_sample = _m3(rng, take)
        cam_o, cam_d = generate_ray(cam, film_sample, aperture_sample)
        opacity_u = s.opacity_u
        if cfg.any_hit:
            # primary cast's pre-drawn opacity sample (megakernel draw
            # site: right after the aperture sample)
            rng, ou_new = _m1(rng, take)
            opacity_u = jnp.where(take, ou_new, opacity_u)

        ray_o = _sel(take, cam_o, s.ray_o)
        ray_d = _sel(take, cam_d, s.ray_d)
        throughput = _sel(take, jnp.ones_like(s.throughput), s.throughput)
        li = _sel(take, jnp.zeros_like(s.li), s.li)
        bounce = jnp.where(take, 0, s.bounce)
        busy = s.busy | take
        is_primary = take

        out_n = RT if sample_slots else R
        out_pos = s.out_pos.at[jnp.where(
            take, vidx if sample_slots else pidx, out_n)].set(
            pixel_sample, mode="drop")

        bsdf_pdf_prev = s.bsdf_pdf
        is_delta_prev = s.is_delta
        # ---- permute the pool into coherent key order (ONE sort per
        # iteration; both casts then run in lane order) ----------------
        if cfg.sort_bounce_rays:
            (busy, ray_o, ray_d, rng, pixel_new, pidx, throughput, li,
             bounce, is_primary, opacity_u, bsdf_pdf_prev,
             is_delta_prev) = _permute_pool(
                scene, busy, ray_o, ray_d,
                (rng, pixel_new, pidx, throughput, li, bounce,
                 is_primary, opacity_u, bsdf_pdf_prev, is_delta_prev))

        # ---- EXTENSION_RAY_CAST: primary + extension rays together ------
        # alpha sample was pre-drawn at this cast's generation site
        # (refill for primaries, MATERIAL for extensions) — exactly the
        # megakernel's draw order
        if cfg.sort_bounce_rays:
            hit = _pool_closest(
                scene, cfg, busy, ray_o, ray_d,
                opacity_u if cfg.any_hit else None)
        else:
            hit = intersect_closest(
                scene, ray_o, ray_d, cfg.stack_size,
                backend=cfg.traversal_backend, watertight=cfg.watertight,
                opacity_u=opacity_u if cfg.any_hit else None,
                alpha_textures=cfg.any_hit_texture)
        itx = shade_hit(scene, ray_o, ray_d, hit)
        itx = itx._replace(position=_sel(hit.hit, itx.position, ray_o))

        # ---- implicit light on the hit (MATERIAL :331-349 / camera view)
        light_idx = jnp.where(hit.hit, itx.light_index, env_idx)
        if cfg.light_visible:
            # primary rays: direct camera view of lights
            cam_light = is_primary & hit.hit \
                & (itx.light_index != U32(LIGHT_INDEX_INVALID))
            li = li + _sel(
                cam_light,
                _mesh_light_camera_eval(scene, itx.light_index, -ray_d,
                                        itx.geometry_normal),
                jnp.zeros_like(li))
            if cfg.has_env_light:
                li = _sel(is_primary & ~hit.hit,
                          evaluate_env(scene, ray_d, cfg.env_light_index,
                                       cfg.has_env_texture), li)
        # secondary rays: MIS-weighted implicit light
        sec = busy & ~is_primary
        rad, l_pdf = evaluate_light_direct(
            scene, max(cfg.light_count, 1), cfg.has_env_texture, light_idx,
            itx.triangle_index, itx.geometry_normal, ray_d, hit.t)
        w = jnp.where(is_delta_prev, 1.0,
                      power_heuristic(1, bsdf_pdf_prev, 1, l_pdf))
        ok = sec & (l_pdf > 0.0)
        li = li + _sel(ok, throughput * rad * w[..., None],
                       jnp.zeros_like(rad))

        # ---- retire misses / bounce-capped paths ------------------------
        alive = busy & hit.hit & (bounce <= cfg.max_bounce)

        # ---- MATERIAL: NEE + BSDF sample for alive lanes ----------------
        wo = -ray_d
        if cfg.light_count > 0:
            rng, u_sel = _m1(rng, alive)
            rng, u_tri = _m1(rng, alive)
            rng, u2 = _m2(rng, alive)
            ls = sample_light_direct(scene, cfg.light_count,
                                     cfg.has_env_texture, itx.position,
                                     u_sel, u_tri, u2)
            shadow_o = offset_ray_origin(itx.position, itx.geometry_normal,
                                         ls.wi)
            ou_s = None
            if cfg.any_hit:
                rng, ou_s = _m1(rng, alive)
            # ---- SHADOW_RAY_CAST ----
            if cfg.sort_bounce_rays:
                occluded = _pool_any(scene, cfg, alive, shadow_o,
                                     ls.wi, ls.distance, ou_s)
            else:
                occluded = intersect_any(
                    scene, shadow_o, ls.wi, ls.distance,
                    cfg.stack_size, backend=cfg.traversal_backend,
                    watertight=cfg.watertight, opacity_u=ou_s,
                    alpha_textures=cfg.any_hit_texture)
            f = evaluate_bsdf(luts, ls.wi, wo, itx, cfg.use_vndf)
            f_pdf = evaluate_bsdf_pdf(luts, ls.wi, wo, itx, cfg.use_vndf)
            n_dot_wi = jnp.abs(jnp.sum(itx.normal * ls.wi, axis=-1))
            w_nee = jnp.where(ls.is_delta, 1.0,
                              power_heuristic(1, ls.pdf, 1, f_pdf))
            contrib = (throughput * ls.radiance * f
                       * (n_dot_wi * w_nee
                          / jnp.maximum(ls.pdf, 1e-20))[..., None])
            nee_ok = (alive & ~occluded & (ls.pdf > 0.0)
                      & jnp.any(ls.radiance > 0.0, axis=-1))
            li = li + _sel(nee_ok, contrib, jnp.zeros_like(contrib))

        rng, u_sel_b = _m1(rng, alive)
        rng, u2_b = _m2(rng, alive)
        wi_new, f, f_pdf, is_delta = sample_bsdf(
            luts, wo, u2_b, u_sel_b, itx, cfg.use_vndf)
        dead = (jnp.all(f == 0.0, axis=-1) | (f_pdf == 0.0))
        n_dot_wi = jnp.abs(jnp.sum(itx.normal * wi_new, axis=-1))
        tp_new = throughput * f * (
            n_dot_wi / jnp.maximum(f_pdf, 1e-20))[..., None]
        throughput = _sel(alive & ~dead, tp_new, throughput)
        ext_o = offset_ray_origin(itx.position, itx.geometry_normal, wi_new)

        still = alive & ~dead
        if cfg.any_hit:
            # extension cast's opacity sample (megakernel: after the BSDF
            # draws, masked on the surviving lanes)
            rng, ou_e = _m1(rng, still)
            opacity_u = jnp.where(still, ou_e, opacity_u)
        ray_o = _sel(still, ext_o, ray_o)
        ray_d = _sel(still, wi_new, ray_d)
        bsdf_pdf = jnp.where(still, f_pdf, bsdf_pdf_prev)
        is_delta_new = jnp.where(still, is_delta, is_delta_prev)
        bounce = jnp.where(still, bounce + 1, bounce)

        # ---- CONTROL: write finished samples to the film ----------------
        finish = busy & ~still
        ridx = (jnp.clip(pixel_new, 0, RT - 1) if sample_slots
                else pidx)
        out_val = s.out_val.at[jnp.where(
            finish, ridx, RT if sample_slots else R)].add(
            jnp.where(finish[:, None], li, 0.0), mode="drop")

        return PoolState(
            rng=rng, pixel=pixel_new, ray_o=ray_o, ray_d=ray_d,
            throughput=throughput, li=li, bsdf_pdf=bsdf_pdf,
            is_delta=is_delta_new, bounce=bounce, opacity_u=opacity_u,
            busy=still, cursor=cursor_new, out_pos=out_pos,
            out_val=out_val)

    return cond, step


def _m1(rng, active):
    rng2, u = next_sample_1d(rng)
    return _sel(active, rng2, rng), u


def _m2(rng, active):
    rng2, u = next_sample_2d(rng)
    return _sel(active, rng2, rng), u


def _m3(rng, active):
    rng2, u = next_sample_3d(rng)
    return _sel(active, rng2, rng), u

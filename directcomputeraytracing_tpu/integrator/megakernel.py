"""Megakernel integrator: the full path loop fused into one jitted program.

TPU re-design of the reference's monolithic compute kernel
(reference: Shaders/MegakernelPathTracing.hlsl:110-209 — per-pixel RNG,
thin-lens ray, NEE light sample + occlusion + MIS, BSDF sample +
throughput update, implicit-light MIS on the extension hit, iterate to
the bounce cap): one batch of pixels runs the entire loop in lock-step
with a `lax.fori_loop` over bounces; terminated paths are masked out and
stop consuming RNG samples (identical stream semantics to the per-thread
early exit, which is what makes megakernel and wavefront mutual oracles).
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..accel.traverse import intersect_closest, intersect_any
from ..bsdf.dispatch import evaluate_bsdf, evaluate_bsdf_pdf, sample_bsdf
from ..camera.camera import generate_ray
from ..core.constants import LIGHT_INDEX_INVALID
from ..lights.lights import (
    evaluate_env,
    evaluate_light_direct,
    sample_light_direct,
)
from ..rng.xoshiro import init_rng, next_sample_1d, next_sample_2d, next_sample_3d
from ..sampling.montecarlo import power_heuristic
from .common import (
    RenderConfig,
    offset_ray_origin,
    shade_hit,
    slab_depth,
    slab_enabled,
)

F32 = jnp.float32
U32 = jnp.uint32


def _sel(mask, new, old):
    if new.ndim > mask.ndim:
        mask = mask.reshape(mask.shape + (1,) * (new.ndim - mask.ndim))
    return jnp.where(mask, new, old)


def _masked_1d(rng, active):
    rng2, u = next_sample_1d(rng)
    return _sel(active, rng2, rng), u


def _masked_2d(rng, active):
    rng2, u = next_sample_2d(rng)
    return _sel(active, rng2, rng), u


def _mesh_light_camera_eval(scene, light_index, wo, geometry_normal):
    """Direct camera view of a mesh light (reference Light.inc.hlsl:22-25)."""
    idx = jnp.clip(light_index.astype(jnp.int32), 0,
                   scene.light_radiance.shape[0] - 1)
    rad = scene.light_radiance[idx]
    facing = jnp.sum(wo * geometry_normal, axis=-1) > 0.0
    return jnp.where(facing[..., None], rad, 0.0)


@partial(jax.jit, static_argnames=("cfg",))
def render_samples(scene, luts, cam, cfg: RenderConfig, pixel_x, pixel_y,
                   frame_seed):
    """Trace one sample per pixel for a pixel batch.

    pixel_x/pixel_y: (R,) u32. Returns (sample_position (R, 2) in-pixel
    jitter, sample_value (R, 3) radiance).
    """
    rng = init_rng(pixel_x, pixel_y, frame_seed)
    rng, pixel_sample = next_sample_2d(rng)
    res = jnp.asarray([cfg.width, cfg.height], F32)
    pix = jnp.stack([pixel_x, pixel_y], axis=-1).astype(F32)
    film_sample = (pixel_sample + pix) / res
    rng, aperture_sample = next_sample_3d(rng)
    origin, wi = generate_ray(cam, film_sample, aperture_sample)

    # alpha-tested scenes pre-draw one opacity sample per traversal
    # (reference: MegakernelPathTracing.hlsl:28,58)
    ou = None
    if cfg.any_hit:
        rng, ou = next_sample_1d(rng)
    with jax.named_scope("primary_raycast"):
        if slab_enabled(scene, cfg):
            from ..accel.traverse import intersect_closest_slab

            hit = intersect_closest_slab(
                scene, origin, wi, cfg.stack_size,
                slab_depth(scene, cfg), backend=cfg.traversal_backend,
                watertight=cfg.watertight, opacity_u=ou,
                alpha_textures=cfg.any_hit_texture,
                phases=cfg.slab_phases)
        else:
            hit = intersect_closest(scene, origin, wi, cfg.stack_size,
                                    backend=cfg.traversal_backend,
                                    watertight=cfg.watertight,
                                    opacity_u=ou,
                                    alpha_textures=cfg.any_hit_texture)
    with jax.named_scope("shade_hit"):
        itx = shade_hit(scene, origin, wi, hit)
    itx = itx._replace(position=_sel(hit.hit, itx.position, origin))

    l = jnp.zeros_like(origin)
    if cfg.light_visible:
        cam_light = hit.hit & (itx.light_index != U32(LIGHT_INDEX_INVALID))
        l = l + _sel(cam_light,
                     _mesh_light_camera_eval(scene, itx.light_index, -wi,
                                             itx.geometry_normal),
                     jnp.zeros_like(l))
        if cfg.has_env_light:
            l = _sel(~hit.hit,
                     evaluate_env(scene, wi, cfg.env_light_index,
                                  cfg.has_env_texture), l)

    class Carry(NamedTuple):
        rng: jnp.ndarray
        l: jnp.ndarray
        throughput: jnp.ndarray
        wi: jnp.ndarray
        itx: object
        hit_t: jnp.ndarray
        active: jnp.ndarray

    def bounce(_, c):
        active = c.active
        itx = c.itx
        wo = -c.wi

        # ---- next-event estimation -------------------------------------
        l_acc = c.l
        if cfg.light_count > 0:
            rng, u_sel = _masked_1d(c.rng, active)
            rng, u_tri = _masked_1d(rng, active)
            rng, u2 = _masked_2d(rng, active)
            ls = sample_light_direct(scene, cfg.light_count,
                                     cfg.has_env_texture, itx.position,
                                     u_sel, u_tri, u2)
            shadow_o = offset_ray_origin(itx.position, itx.geometry_normal,
                                         ls.wi)
            ou_s = None
            if cfg.any_hit:
                rng, ou_s = _masked_1d(rng, active)
            with jax.named_scope("shadow_raycast"):
                # inactive lanes: zero-length far ray (their stale
                # origins otherwise traverse at full cost; the alpha
                # recast path has no t_max cap on its closest casts)
                sh_o = jnp.where(active[:, None], shadow_o,
                                 jnp.float32(2e9))
                sh_d = jnp.where(active[:, None], ls.wi,
                                 jnp.asarray([1.0, 0.0, 0.0],
                                             jnp.float32))
                occluded = intersect_any(scene, sh_o, sh_d,
                                         jnp.where(active, ls.distance,
                                                   0.0),
                                         cfg.stack_size,
                                         backend=cfg.traversal_backend,
                                         watertight=cfg.watertight,
                                         opacity_u=ou_s,
                                         alpha_textures=cfg.any_hit_texture)
            f = evaluate_bsdf(luts, ls.wi, wo, itx, cfg.use_vndf)
            f_pdf = evaluate_bsdf_pdf(luts, ls.wi, wo, itx, cfg.use_vndf)
            n_dot_wi = jnp.abs(jnp.sum(itx.normal * ls.wi, axis=-1))
            w = jnp.where(ls.is_delta, 1.0,
                          power_heuristic(1, ls.pdf, 1, f_pdf))
            contrib = (c.throughput * ls.radiance * f
                       * (n_dot_wi * w / jnp.maximum(ls.pdf, 1e-20))[..., None])
            ok = (active & ~occluded & (ls.pdf > 0.0)
                  & jnp.any(ls.radiance > 0.0, axis=-1))
            l_acc = l_acc + _sel(ok, contrib, jnp.zeros_like(contrib))
        else:
            rng = c.rng

        # ---- BSDF sampling + extension ray -----------------------------
        rng, u_sel_b = _masked_1d(rng, active)
        rng, u2_b = _masked_2d(rng, active)
        wi_new, f, f_pdf, is_delta = sample_bsdf(
            luts, wo, u2_b, u_sel_b, itx, cfg.use_vndf)
        dead = (jnp.all(f == 0.0, axis=-1) | (f_pdf == 0.0))
        n_dot_wi = jnp.abs(jnp.sum(itx.normal * wi_new, axis=-1))
        throughput = c.throughput * f * (
            n_dot_wi / jnp.maximum(f_pdf, 1e-20))[..., None]
        throughput = _sel(active & ~dead, throughput, c.throughput)

        ext_o = offset_ray_origin(itx.position, itx.geometry_normal, wi_new)
        alive = active & ~dead
        ou_e = None
        if cfg.any_hit:
            # masked on alive (not active): a path whose BSDF sample died
            # never casts the extension ray, so it must not consume the
            # opacity sample -- keeps the wavefront stream identical
            rng, ou_e = _masked_1d(rng, alive)
        with jax.named_scope("extension_raycast"):
            if cfg.sort_bounce_rays:
                from .common import ray_sort_key

                root_lo = scene.node_bbox_min[0]
                root_hi = scene.node_bbox_max[0]
                inv_ext = 1.0 / jnp.maximum(root_hi - root_lo, 1e-6)
                key = ray_sort_key(ext_o, wi_new, root_lo, inv_ext)
                # dead lanes hold stale finite rays: sort them last AND
                # park them off-scene, or the bundles they land in
                # sweep the hierarchy for dead work
                key = jnp.where(alive, key, jnp.uint32(0xFFFFFFFF))
                order = jnp.argsort(key)
                far = jnp.float32(2e9)
                cast_o = jnp.where(alive[:, None], ext_o, far)
                cast_d = jnp.where(alive[:, None], wi_new,
                                   jnp.asarray([1.0, 0.0, 0.0],
                                               jnp.float32))
                if slab_enabled(scene, cfg):
                    from ..accel.traverse import intersect_closest_slab

                    hit2s = intersect_closest_slab(
                        scene, cast_o[order], cast_d[order],
                        cfg.stack_size, slab_depth(scene, cfg),
                        backend=cfg.traversal_backend,
                        watertight=cfg.watertight,
                        opacity_u=None if ou_e is None else ou_e[order],
                        alpha_textures=cfg.any_hit_texture,
                        live=alive[order], phases=cfg.slab_phases)
                else:
                    hit2s = intersect_closest(
                        scene, cast_o[order], cast_d[order],
                        cfg.stack_size, backend=cfg.traversal_backend,
                        watertight=cfg.watertight,
                        opacity_u=None if ou_e is None else ou_e[order],
                        alpha_textures=cfg.any_hit_texture)
                inv_order = jnp.argsort(order)
                hit2 = jax.tree.map(lambda a: a[inv_order], hit2s)
            else:
                hit2 = intersect_closest(
                    scene, ext_o, wi_new, cfg.stack_size,
                    backend=cfg.traversal_backend,
                    watertight=cfg.watertight,
                    opacity_u=ou_e,
                    alpha_textures=cfg.any_hit_texture)
        with jax.named_scope("shade_hit"):
            itx2 = shade_hit(scene, ext_o, wi_new, hit2)

        # ---- implicit light hit (MIS) ----------------------------------
        env_idx = U32(cfg.env_light_index if cfg.has_env_light
                      else LIGHT_INDEX_INVALID)
        light_idx = jnp.where(hit2.hit, itx2.light_index, env_idx)
        rad, l_pdf = evaluate_light_direct(
            scene, max(cfg.light_count, 1), cfg.has_env_texture, light_idx,
            itx2.triangle_index, itx2.geometry_normal, wi_new, hit2.t)
        w = jnp.where(is_delta, 1.0, power_heuristic(1, f_pdf, 1, l_pdf))
        ok = alive & (l_pdf > 0.0)
        l_acc = l_acc + _sel(ok, throughput * rad * w[..., None],
                             jnp.zeros_like(rad))

        itx_next = jax.tree.map(lambda new, old: _sel(alive, new, old),
                                itx2, itx)
        itx_next = itx_next._replace(
            position=_sel(alive & hit2.hit, itx2.position, itx.position))
        return Carry(
            rng=rng,
            l=l_acc,
            throughput=throughput,
            wi=_sel(alive, wi_new, c.wi),
            itx=itx_next,
            hit_t=_sel(alive, hit2.t, c.hit_t),
            active=alive & hit2.hit,
        )

    init = Carry(rng=rng, l=l, throughput=jnp.ones_like(origin), wi=wi,
                 itx=itx, hit_t=hit.t, active=hit.hit)
    out = jax.lax.fori_loop(0, cfg.max_bounce + 1, bounce, init)
    return pixel_sample, out.l


@partial(jax.jit, static_argnames=("cfg", "n_samples"))
def render_samples_accumulated(scene, luts, cam, cfg: RenderConfig,
                               pixel_x, pixel_y, base_seed, n_samples):
    """n_samples progressive passes fused into ONE dispatch, summing the
    radiance (box-filter accumulation). Amortizes the fixed host->device
    dispatch latency that dominates small frames (the reference instead
    amortizes via its 2-frames-in-flight pipelining,
    D3D12Adapter.cpp:414-448)."""

    def body(k, acc):
        _, v = render_samples(scene, luts, cam, cfg, pixel_x, pixel_y,
                              base_seed + k.astype(U32))
        return acc + v

    total = jax.lax.fori_loop(
        0, n_samples, body,
        jnp.zeros((pixel_x.shape[0], 3), F32))
    return total


def _pad_to_chunk(arrs, chunk):
    r = arrs[0].shape[0]
    pad = -(-r // chunk) * chunk - r
    return [jnp.concatenate([a, jnp.broadcast_to(a[-1:], (pad,))])
            for a in arrs], r


def render_samples_chunked(scene, luts, cam, cfg, pixel_x, pixel_y,
                           frame_seed, chunk_pixels):
    """render_samples split into bounded per-dispatch pixel chunks (the
    reference renders one 512^2 tile per frame and round-robins,
    MegakernelPathTracer.cpp:131-157; here chunking bounds single-
    dispatch wall time — the axon tunnel kills dispatches that run
    minutes, docs/KNOWN_ISSUES.md). Pixels are padded to a chunk
    multiple by repeating the last pixel (traced, then dropped) so
    every dispatch shares one compiled shape. Per-pixel results are
    bit-identical to the unchunked call."""
    R = pixel_x.shape[0]
    if R <= chunk_pixels:
        return render_samples(scene, luts, cam, cfg, pixel_x, pixel_y,
                              frame_seed)
    (pxp, pyp), _ = _pad_to_chunk([pixel_x, pixel_y], chunk_pixels)
    pos, val = [], []
    for i in range(0, pxp.shape[0], chunk_pixels):
        p, v = render_samples(scene, luts, cam, cfg,
                              pxp[i:i + chunk_pixels],
                              pyp[i:i + chunk_pixels], frame_seed)
        pos.append(p)
        val.append(v)
        _pace_chunk(v)
    return (jnp.concatenate(pos)[:R], jnp.concatenate(val)[:R])


def _pace_chunk(x):
    """Idle-gap pacing between back-to-back megakernel chunk
    dispatches: the tunnel watchdog kills ~400 s of CONTINUOUS
    occupancy even when each single dispatch is bounded
    (docs/KNOWN_ISSUES.md) — the chip must go genuinely idle between
    dispatches. Zero cost off-tunnel (no sync, no sleep)."""
    from .wavefront import dispatch_pause_s
    pause = dispatch_pause_s()
    if pause:
        import time
        jax.block_until_ready(x)
        time.sleep(pause)


def render_samples_accumulated_chunked(scene, luts, cam, cfg, pixel_x,
                                       pixel_y, base_seed, n_samples,
                                       chunk_pixels):
    """render_samples_accumulated over bounded pixel chunks (see
    render_samples_chunked)."""
    R = pixel_x.shape[0]
    if R <= chunk_pixels:
        return render_samples_accumulated(scene, luts, cam, cfg,
                                          pixel_x, pixel_y, base_seed,
                                          n_samples)
    (pxp, pyp), _ = _pad_to_chunk([pixel_x, pixel_y], chunk_pixels)
    parts = []
    for i in range(0, pxp.shape[0], chunk_pixels):
        parts.append(render_samples_accumulated(
            scene, luts, cam, cfg, pxp[i:i + chunk_pixels],
            pyp[i:i + chunk_pixels], base_seed, n_samples))
        _pace_chunk(parts[-1])
    return jnp.concatenate(parts)[:R]


def full_frame_pixels(cfg: RenderConfig):
    """Raster-order pixel coordinate arrays for a whole frame."""
    ys, xs = jnp.meshgrid(
        jnp.arange(cfg.height, dtype=U32),
        jnp.arange(cfg.width, dtype=U32), indexing="ij")
    return xs.ravel(), ys.ravel()


def tiled_frame_pixels(cfg: RenderConfig, tile_h=32, tile_w=32):
    """Tile-major pixel ordering + inverse permutation to raster order.

    Feeding the intersectors square 32x32-pixel tiles instead of image
    rows gives every 1024-ray kernel block the most compact frustum,
    which is what lets the clustered cull-and-sweep kernel skip most
    clusters per block (the reference gets the same locality from its
    16x8 thread groups and 512^2 dispatch tiles,
    MegakernelPathTracer.cpp:19-20,131-157). Measured on the 212k-tri
    sphere grid (experiments/prof_tileshape.py): 32x32 sweeps 37%
    fewer clusters per camera-ray block than the old 8x128 layout
    (12.65 -> 7.99 swept/ray, closest 42.1 -> 49.1 Mrays/s); width
    >128 collapses (a 1024-ray block then spans two tile rows with a
    disjoint footprint).

    Frame edges not divisible by the tile size produce clipped tiles
    (e.g. 1080/32 leaves a 24-row bottom band), so blocks there
    straddle two clipped tiles instead of mapping 1:1 onto one square
    tile — a perf-only ragged-edge effect, results are exact either
    way.

    Returns (px, py, inv) with values[inv] mapping tile-order results back
    to raster order.
    """
    import numpy as np

    h, w = cfg.height, cfg.width
    order = np.empty(h * w, np.int64)
    pos = 0
    for ty in range(0, h, tile_h):
        for tx in range(0, w, tile_w):
            ys = np.arange(ty, min(ty + tile_h, h))
            xs = np.arange(tx, min(tx + tile_w, w))
            yy, xx = np.meshgrid(ys, xs, indexing="ij")
            idx = (yy * w + xx).ravel()
            order[pos: pos + idx.size] = idx
            pos += idx.size
    inv = np.empty_like(order)
    inv[order] = np.arange(h * w)
    px = jnp.asarray((order % w).astype(np.uint32))
    py = jnp.asarray((order // w).astype(np.uint32))
    return px, py, jnp.asarray(inv)

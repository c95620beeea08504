"""Multi-chip distribution: device mesh, pixel/SPP sharding, psum film merge.

The reference is single-GPU (SURVEY.md §2d): its scaling axes are tiles
(512^2 round-robin, MegakernelPathTracer.cpp:131-157), a fixed path pool,
and progressive accumulation over frames. On TPU those same axes shard
across chips:

  * "tile" axis  — the frame is split into contiguous raster ROW BANDS,
    one per device; each chip traverses the replicated scene for its own
    band. Within its band every chip re-orders pixels into 32x32 tiles
    before tracing (device-local permutation — the work-list traversal
    needs compact per-bundle frustums; raster-order bundles measured
    ~10x slower) and restores raster order before touching the film.
  * "spp"  axis  — every chip renders the *same* pixels with a different
    frame seed and the per-sample film contribution is `psum`-merged
    over ICI (the analogue of progressive accumulation, but parallel).

Film reconstruction runs distributed too: each band convolves its own
samples (film.filters shifted-array formulation) with a `ppermute` halo
exchange of the boundary sample rows, so non-box filters are exact
across band seams — contributions match the single-device convolution
bit-for-bit in structure (fp association aside).

Scene arrays, LUTs and camera are replicated (read-only and small next
to the ray state); only pixel coordinates and the film are sharded. All
collectives are XLA collectives over a `jax.sharding.Mesh`, so they
ride ICI on real hardware and work identically on a forced
host-platform device mesh in tests.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..film.filters import FilterParams, convolve_sample_pass
from ..integrator.megakernel import render_samples

F32 = jnp.float32
U32 = jnp.uint32


def make_mesh(n_devices=None, spp_parallel=1, devices=None):
    """Build a ("spp", "tile") mesh over the first n_devices devices.

    spp_parallel devices cooperate on the same pixels with different
    seeds; the remaining factor splits pixels spatially.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    assert n_devices % spp_parallel == 0, (
        f"{n_devices} devices not divisible by spp_parallel={spp_parallel}")
    tile_parallel = n_devices // spp_parallel
    dev_array = np.asarray(devices).reshape(spp_parallel, tile_parallel)
    return Mesh(dev_array, axis_names=("spp", "tile"))


def band_rows(cfg, mesh):
    """Rows per device band (frame height padded to a tile multiple)."""
    t = mesh.shape["tile"]
    return (cfg.height + t - 1) // t


def _band_tile_perm(hb, w, tile_h=32, tile_w=32):
    """Device-local square-tile permutation for an (hb, w) band:
    (perm, inv) with band_raster[perm] = tile order. 32x32 tiles (one
    1024-ray kernel block per tile) measured the most compact block
    frustums (docs/PERF.md); ragged band edges clip the tile."""
    order = np.empty(hb * w, np.int64)
    pos = 0
    for ty in range(0, hb, tile_h):
        for tx in range(0, w, tile_w):
            ys = np.arange(ty, min(ty + tile_h, hb))
            xs = np.arange(tx, min(tx + tile_w, w))
            yy, xx = np.meshgrid(ys, xs, indexing="ij")
            idx = (yy * w + xx).ravel()
            order[pos: pos + idx.size] = idx
            pos += idx.size
    inv = np.empty_like(order)
    inv[order] = np.arange(hb * w)
    return jnp.asarray(order.astype(np.int32)), \
        jnp.asarray(inv.astype(np.int32))


def _filter_halo_rows(fp: FilterParams):
    """Rows of neighbor samples a band needs for an exact convolution
    at its seams (0 for the box fast path)."""
    if fp.kind == "box" and fp.radius <= 0.5:
        return 0
    return max(1, int(math.ceil(fp.radius + 0.5)))


def distributed_render_step(mesh, cfg, integrator="megakernel",
                            filter_params=None, tile_order=True,
                            spp_batch=1):
    """Build the jitted distributed progressive step for a static config.

    Returned fn: (scene, luts, cam, pixel_x, pixel_y, base_seed,
                  film_value, film_weight) -> (film_value, film_weight)

    pixel_x/pixel_y: (R,) u32 raster order padded to tile_axis * band
    rows * width; film is flat (R, 3) value + (R,) weight in the same
    order. Each "spp" replica traces with seed = base_seed + spp_index;
    per-replica film contributions psum over "spp".

    spp_batch (wavefront + box filter only) additionally interleaves S
    samples per pixel inside each replica's pool pass (the single-chip
    coherence batching, integrator/wavefront.py) — one step then
    accumulates n_spp * spp_batch samples, seeds
    base_seed + spp_index * spp_batch + s.
    """
    fp = filter_params or FilterParams(kind=cfg.filter_type,
                                       radius=cfg.filter_radius)
    n_spp = mesh.shape["spp"]
    t_axis = mesh.shape["tile"]
    hb = band_rows(cfg, mesh)
    w = cfg.width
    hr = min(_filter_halo_rows(fp), hb)
    perm, inv = (_band_tile_perm(hb, w) if tile_order
                 else (None, None))
    if spp_batch > 1 and (integrator != "wavefront" or hr != 0):
        raise ValueError("spp_batch needs the wavefront integrator "
                         "and a box filter (per-sample film positions "
                         "collide)")

    def render(scene, luts, cam, px, py, seed):
        if integrator == "wavefront":
            from ..integrator.wavefront import (
                render_samples_wavefront_pure,
            )

            return render_samples_wavefront_pure(
                scene, luts, cam, cfg, px, py, seed,
                spp_batch=spp_batch)
        return render_samples(scene, luts, cam, cfg, px, py, seed)

    def step(scene, luts, cam, px, py, valid, base_seed, film_v,
             film_w):
        s = jax.lax.axis_index("spp").astype(U32) * U32(spp_batch)
        pxb, pyb, vb = px[0], py[0], valid[0]
        if tile_order:
            pos_t, val_t = render(scene, luts, cam, pxb[perm], pyb[perm],
                                  base_seed + s)
            pos, values = pos_t[inv], val_t[inv]
        else:
            pos, values = render(scene, luts, cam, pxb, pyb,
                                 base_seed + s)

        if hr == 0:
            # box fast path: every sample lands in its own pixel
            values = jnp.where(vb[:, None], values, 0.0)
            v = jax.lax.psum(values, "spp")
            return film_v + v[None], film_w + F32(n_spp * spp_batch)

        # filtered path: convolve the band with a ppermute halo of the
        # neighbor bands' boundary sample rows (reference gathers
        # neighbors within the filter radius, SampleConvolution.hlsl)
        pos = jnp.where(vb[:, None], pos, 1e9)   # padded lanes: w = 0
        pos2 = pos.reshape(hb, w, 2)
        val2 = values.reshape(hb, w, 3)
        ti = jax.lax.axis_index("tile")
        fwd = [(i, (i + 1) % t_axis) for i in range(t_axis)]
        bwd = [(i, (i - 1) % t_axis) for i in range(t_axis)]

        def halo(x):
            prev = jax.lax.ppermute(x[-hr:], "tile", fwd)
            nxt = jax.lax.ppermute(x[:hr], "tile", bwd)
            # no wraparound: first band has no prev, last no next
            prev = jnp.where(ti == 0, jnp.full_like(prev, 1e9)
                             if x.shape[-1] == 2 else
                             jnp.zeros_like(prev), prev)
            nxt = jnp.where(ti == t_axis - 1, jnp.full_like(nxt, 1e9)
                            if x.shape[-1] == 2 else
                            jnp.zeros_like(nxt), nxt)
            return jnp.concatenate([prev, x, nxt], axis=0)

        v_ext, w_ext = convolve_sample_pass(halo(pos2), halo(val2), fp)
        v_band = v_ext[hr: hr + hb].reshape(-1, 3)
        w_band = w_ext[hr: hr + hb].reshape(-1)
        v = jax.lax.psum(v_band, "spp")
        wgt = jax.lax.psum(w_band, "spp")
        return film_v + v[None], film_w + wgt[None]

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(), P(), P(None, "tile"), P(None, "tile"),
                  P(None, "tile"), P(), P(None, "tile"),
                  P(None, "tile")),
        out_specs=(P(None, "tile"), P(None, "tile")),
        check_rep=False,
    )

    def run(scene, luts, cam, px, py, valid, base_seed, film_v, film_w):
        # shard_map wants the sharded axis visible: lift (R,) -> (1, R)
        v, w_ = sharded(scene, luts, cam, px[None], py[None],
                        valid[None], base_seed, film_v[None],
                        film_w[None])
        return v[0], w_[0]

    return jax.jit(run)


class DistributedRenderer:
    """Progressive multi-chip renderer: film sharded by raster band
    ("tile"), samples merged over "spp" replicas each step. Supports
    both integrators, device-local tile-order tracing, and exact
    distributed film filtering (halo exchange)."""

    def __init__(self, mesh, arrays, luts, cam, cfg,
                 integrator="megakernel", filter_params=None,
                 tile_order=True, spp_batch=1):
        self.mesh = mesh
        self.arrays = arrays
        self.luts = luts
        self.cam = cam
        self.cfg = cfg
        self.spp_batch = spp_batch
        self._step = distributed_render_step(
            mesh, cfg, integrator=integrator,
            filter_params=filter_params, tile_order=tile_order,
            spp_batch=spp_batch)

        t = mesh.shape["tile"]
        hb = band_rows(cfg, mesh)
        n_pad = t * hb * cfg.width
        n = cfg.width * cfg.height
        ys, xs = np.meshgrid(np.arange(t * hb), np.arange(cfg.width),
                             indexing="ij")
        self.n_rays = n
        px = np.minimum(xs.ravel(), cfg.width - 1).astype(np.uint32)
        py = np.minimum(ys.ravel(), cfg.height - 1).astype(np.uint32)
        valid = (ys.ravel() < cfg.height)
        ray_sharding = NamedSharding(mesh, P("tile"))
        self.px = jax.device_put(jnp.asarray(px), ray_sharding)
        self.py = jax.device_put(jnp.asarray(py), ray_sharding)
        self.valid = jax.device_put(jnp.asarray(valid), ray_sharding)
        self.film_v = jax.device_put(
            jnp.zeros((n_pad, 3), F32),
            NamedSharding(mesh, P("tile", None)))
        self.film_w = jax.device_put(jnp.zeros(n_pad, F32), ray_sharding)
        self.spp = 0

    def render_step(self, base_seed=None):
        """One progressive step = mesh.shape['spp'] * spp_batch samples
        per pixel."""
        seed = U32(self.spp if base_seed is None else base_seed)
        self.film_v, self.film_w = self._step(
            self.arrays, self.luts, self.cam, self.px, self.py,
            self.valid, seed, self.film_v, self.film_w)
        self.spp += self.mesh.shape["spp"] * self.spp_batch

    def image(self):
        v = np.asarray(self.film_v)[: self.n_rays]
        w = np.asarray(self.film_w)[: self.n_rays]
        img = v / np.maximum(w[:, None], 1e-10)
        return img.reshape(self.cfg.height, self.cfg.width, 3)


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host bring-up: `jax.distributed.initialize` with env-var
    fallbacks (the reference is single-process; this is the first-class
    `dist` entry point SURVEY.md §5 calls for). Safe to call when already
    initialized or single-host (no-op)."""
    import os

    import jax

    if jax.process_count() > 1:
        return  # already initialized
    addr = coordinator_address or os.environ.get("DCRT_COORDINATOR")
    if addr is None:
        return  # single host
    if num_processes is None:
        num_processes = int(os.environ.get("DCRT_NUM_PROCESSES", "1"))
    if process_id is None:   # NOT `or`: process 0 is falsy but explicit
        process_id = int(os.environ.get("DCRT_PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=num_processes,
        process_id=process_id)

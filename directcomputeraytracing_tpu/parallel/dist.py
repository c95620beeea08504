"""Multi-chip distribution: device mesh, pixel/SPP sharding, psum film merge.

The reference is single-GPU (SURVEY.md §2d): its scaling axes are tiles
(512^2 round-robin, MegakernelPathTracer.cpp:131-157), a fixed path pool,
and progressive accumulation over frames. On TPU those same axes shard
across chips:

  * "tile" axis  — the pixel/ray batch is split across devices; each chip
    traverses the replicated scene for its own pixels (the analogue of the
    reference's per-frame tile round-robin, but spatial-parallel).
  * "spp"  axis  — every chip renders the *same* pixels with a different
    frame seed and the per-sample radiance is `psum`-merged over ICI into
    the film (the analogue of progressive accumulation, but parallel).

Scene arrays, LUTs and camera are replicated (they are read-only and
small next to the ray state); only pixel coordinates and the film are
sharded. All collectives are XLA collectives over a `jax.sharding.Mesh`,
so they ride ICI on real hardware and work identically on a forced
host-platform device mesh in tests.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

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


def pad_ray_count(n, mesh):
    """Rays per device shard must be equal: round n up to a tile multiple."""
    t = mesh.shape["tile"]
    return (n + t - 1) // t * t


def distributed_render_step(mesh, cfg):
    """Build the jitted distributed progressive step for a static config.

    Returned fn: (scene, luts, cam, pixel_x, pixel_y, base_seed,
                  film_value, film_weight) -> (film_value, film_weight)

    pixel_x/pixel_y: (R,) u32, R divisible by the "tile" axis size; the
    film is flat (R, 3) value + (R,) weight in the same ray order.
    Each "spp" replica traces with seed = base_seed + spp_index and the
    per-pixel radiance is psum-reduced over the "spp" axis.
    """
    n_spp = mesh.shape["spp"]

    def step(scene, luts, cam, px, py, base_seed, film_v, film_w):
        s = jax.lax.axis_index("spp").astype(U32)
        _, values = render_samples(scene, luts, cam, cfg, px[0], py[0],
                                   base_seed + s)
        merged = jax.lax.psum(values[None], "spp")
        return film_v + merged, film_w + F32(n_spp)

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(), P(), P(None, "tile"), P(None, "tile"), P(),
                  P(None, "tile"), P(None, "tile")),
        out_specs=(P(None, "tile"), P(None, "tile")),
        check_rep=False,
    )

    def run(scene, luts, cam, px, py, base_seed, film_v, film_w):
        # shard_map wants the sharded axis visible: lift (R,) -> (1, R)
        v, w = sharded(scene, luts, cam, px[None], py[None], base_seed,
                       film_v[None], film_w[None])
        return v[0], w[0]

    return jax.jit(run)


class DistributedRenderer:
    """Progressive multi-chip renderer: film sharded by ray ("tile"),
    samples merged over "spp" replicas each step."""

    def __init__(self, mesh, arrays, luts, cam, cfg):
        self.mesh = mesh
        self.arrays = arrays
        self.luts = luts
        self.cam = cam
        self.cfg = cfg
        self._step = distributed_render_step(mesh, cfg)

        from ..integrator.megakernel import full_frame_pixels
        px, py = full_frame_pixels(cfg)
        n = px.shape[0]
        n_pad = pad_ray_count(n, mesh)
        self.n_rays = n
        self.px = jnp.pad(px, (0, n_pad - n))
        self.py = jnp.pad(py, (0, n_pad - n))
        ray_sharding = NamedSharding(mesh, P("tile"))
        self.px = jax.device_put(self.px, ray_sharding)
        self.py = jax.device_put(self.py, ray_sharding)
        self.film_v = jax.device_put(
            jnp.zeros((n_pad, 3), F32), NamedSharding(mesh, P("tile", None)))
        self.film_w = jax.device_put(jnp.zeros(n_pad, F32), ray_sharding)
        self.spp = 0

    def render_step(self, base_seed=None):
        """One progressive step = mesh.shape['spp'] samples per pixel."""
        seed = U32(self.spp if base_seed is None else base_seed)
        self.film_v, self.film_w = self._step(
            self.arrays, self.luts, self.cam, self.px, self.py, seed,
            self.film_v, self.film_w)
        self.spp += self.mesh.shape["spp"]

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
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=num_processes
        or int(os.environ.get("DCRT_NUM_PROCESSES", "1")),
        process_id=process_id
        or int(os.environ.get("DCRT_PROCESS_ID", "0")))

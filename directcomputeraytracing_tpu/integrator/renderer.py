"""Progressive renderer driver: scene + camera + config -> image.

The host-side orchestration analogue of the reference's frame loop
(reference: Source/LaunchRendererLoop.cpp:201-271 DispatchRayTracing —
progressive accumulation with per-sample frame seeds, SPP counting,
film reset on dirty state; :273-393 RenderOneFrame — sample convolution,
scene luminance, post processing). Python drives one jitted sample pass
per progressive step; everything per-sample runs on device.

Adds what the reference lacks (SURVEY.md §5): film checkpoint/resume —
the film accumulator + SPP counter serialize to an .npz so long renders
restart where they left off.
"""

from functools import partial

import jax
import numpy as np
import jax.numpy as jnp

from ..core.constants import LIGHT_INDEX_INVALID
from ..film.film import Film, accumulate_box, create_film, resolve
from ..film.filters import FilterParams, convolve_sample_pass
from ..lut.textures import placeholder_luts
from ..post.pipeline import PostParams, post_process
from ..scene.scene import flatten_scene
from .common import RenderConfig
from .megakernel import full_frame_pixels, render_samples

SEED_SAMPLE_COUNT = "sample_count"   # seed = accumulated sample index
SEED_FIXED = "fixed"                 # pinned seed (deterministic retrace)
SEED_FRAME_INDEX = "frame_index"     # seed = global frame counter that
                                     # keeps advancing across film
                                     # resets (reference EFrameSeedType::
                                     # FrameIndex, DirectComputeRayTracing
                                     # .h:111 — SampleCount restarts the
                                     # sequence with the image,
                                     # FrameIndex does not)


@partial(jax.jit, static_argnames=("fp", "height", "width"))
def _accumulate_filtered(film, pos, values, fp: FilterParams, height, width):
    v, w = convolve_sample_pass(pos.reshape(height, width, 2),
                                values.reshape(height, width, 3), fp)
    return Film(value=film.value + v, weight=film.weight + w)


class Renderer:
    def __init__(self, scene, camera, width, height, max_bounce=4,
                 luts=None, integrator="megakernel", filter_params=None,
                 post_params=None, **cfg_overrides):
        self.arrays, self.meta = flatten_scene(scene)
        self.camera = camera
        if luts is None:
            # Placeholder (unit-energy) LUTs silently zero the plastic
            # diffuse lobe (dispatch.py weight math), so bake real energy
            # LUTs whenever any material needs them. The committed .npz
            # cache makes this instant after the first call (lut/bake.py).
            from ..core.constants import MATERIAL_TYPE_DIFFUSE

            if any(m.mtype != MATERIAL_TYPE_DIFFUSE
                   for m in scene.materials):
                from ..lut.bake import bake_luts_cached

                luts = bake_luts_cached()
            else:
                luts = placeholder_luts()
        self.luts = luts
        env_idx = (self.meta.env_light_index
                   if self.meta.env_light_index != LIGHT_INDEX_INVALID
                   else -1)
        cfg_kwargs = dict(
            width=width, height=height, max_bounce=max_bounce,
            stack_size=self.meta.stack_size,
            light_count=self.meta.light_count,
            env_light_index=env_idx,
            has_env_texture=self.meta.has_env_texture,
            any_hit=self.meta.any_non_opaque,
            any_hit_texture=self.meta.any_opacity_texture,
            # secondary-ray coherence sorting pays off when the clustered
            # cull+sweep kernel is active (measured 1.4x on 36k tris)
            sort_bounce_rays=(jax.default_backend() == "tpu"
                              and int(self.arrays.cluster_bbox.shape[0])
                              > 1))
        cfg_kwargs.update(cfg_overrides)
        self.cfg = RenderConfig(**cfg_kwargs)
        self.integrator = integrator
        self.filter_params = filter_params or FilterParams(
            kind=self.cfg.filter_type, radius=self.cfg.filter_radius)
        self.post_params = post_params or PostParams()
        self.film = create_film(height, width)
        self.spp = 0
        self.frame_index = 0    # advances per sample pass, survives
                                # reset() (SEED_FRAME_INDEX mode)
        # On TPU, trace rays in 32x32 pixel tiles: compact per-block
        # frustums let the clustered kernel skip most clusters. One
        # inverse-permutation gather per sample pass restores raster
        # order for the film.
        if jax.default_backend() == "tpu":
            from .megakernel import tiled_frame_pixels

            self._px, self._py, self._inv = tiled_frame_pixels(self.cfg)
        else:
            self._px, self._py = full_frame_pixels(self.cfg)
            self._inv = None

    @property
    def _box_fast_path(self):
        return (self.filter_params.kind == "box"
                and self.filter_params.radius <= 0.5)

    def reset(self):
        """Restart progressive accumulation (the reference's dirty-flag
        film clear). frame_index deliberately survives — that is the
        FrameIndex seed mode's defining behavior."""
        self.film = create_film(self.cfg.height, self.cfg.width)
        self.spp = 0

    def _mk_chunk(self, fuse=1):
        """Megakernel per-dispatch pixel budget: bound single-dispatch
        wall time like the reference's 512^2 tile round-robin
        (MegakernelPathTracer.cpp:131-157). Alpha-tested scenes re-cast
        per transparency layer, so their budget is halved. None = whole
        frame in one dispatch."""
        budget = (1 << 18) // max(fuse, 1)
        if self.cfg.any_hit:
            budget //= 2
        R = self.cfg.width * self.cfg.height
        return budget if R > budget else None

    def render_sample(self, frame_seed):
        """Trace one sample per pixel and accumulate into the film."""
        px, py = self._px, self._py
        if self.integrator == "megakernel":
            chunk = self._mk_chunk()
            if chunk is not None:
                from .megakernel import render_samples_chunked

                pos, values = render_samples_chunked(
                    self.arrays, self.luts, self.camera, self.cfg, px,
                    py, jnp.uint32(frame_seed), chunk)
            else:
                pos, values = render_samples(
                    self.arrays, self.luts, self.camera, self.cfg, px,
                    py, jnp.uint32(frame_seed))
        else:
            from .wavefront import (render_samples_wavefront, tunnel_paced,
                                    paced_iterations_per_dispatch)

            # big frames stream in bounded dispatches (reference
            # IterationPerFrame parity; also keeps each dispatch under
            # the axon tunnel's occupancy limit, docs/KNOWN_ISSUES.md —
            # paced tunnels need shorter dispatches + idle gaps).
            # On the tunnel EVERY frame runs chunked: a slow sub-131k-
            # pixel alpha scene can still exceed the dispatch limit in
            # one fused unbounded-iteration dispatch.
            chunked = (paced_iterations_per_dispatch() if tunnel_paced()
                       else (16 if px.shape[0] > (1 << 17) else None))
            pos, values = render_samples_wavefront(
                self.arrays, self.luts, self.camera, self.cfg, px, py,
                jnp.uint32(frame_seed), iterations_per_dispatch=chunked)
        if self._inv is not None:
            pos = pos[self._inv]
            values = values[self._inv]
        if self._box_fast_path:
            self.film = accumulate_box(self.film, values, self.cfg.height,
                                       self.cfg.width)
        else:
            self.film = _accumulate_filtered(
                self.film, pos, values, self.filter_params,
                self.cfg.height, self.cfg.width)
        self.spp += 1
        self.frame_index += 1

    def render(self, spp, seed_mode=SEED_SAMPLE_COUNT, fixed_seed=0,
               samples_per_dispatch=None):
        """Accumulate spp samples. With the box fast path and progressive
        seeds, megakernel sample passes fuse into multi-spp dispatches
        (samples_per_dispatch, default min(spp, 8)) to amortize dispatch
        latency; other configs fall back to one pass per sample. Large
        frames additionally split each dispatch into bounded pixel
        chunks (_mk_chunk) so fused alpha-scene dispatches stay under
        the tunnel's duration limit."""
        fuse = (samples_per_dispatch if samples_per_dispatch is not None
                else min(spp, 8))
        can_fuse = (self._box_fast_path and seed_mode == SEED_SAMPLE_COUNT
                    and self.integrator == "megakernel" and fuse > 1)
        can_fuse_wf = (self._box_fast_path
                       and seed_mode == SEED_SAMPLE_COUNT
                       and self.integrator == "wavefront" and fuse > 1)
        # splatting-film wavefront fusion: per-(pixel, sample) output
        # slots keep every interleaved sample's position, so the pool
        # pass stays fused and the reconstruction filter convolves one
        # sample plane per batched sample afterwards (the reference's
        # per-sample position texture + convolution pass,
        # Source/SampleConvolution.cpp:89-170)
        can_fuse_wf_filtered = (not self._box_fast_path
                                and seed_mode == SEED_SAMPLE_COUNT
                                and self.integrator == "wavefront"
                                and fuse > 1)
        remaining = spp
        while remaining > 0:
            if can_fuse_wf_filtered and remaining >= fuse:
                from .wavefront import (render_samples_wavefront,
                                        tunnel_paced,
                                        paced_iterations_per_dispatch)

                RT = self._px.shape[0] * fuse
                chunked = (paced_iterations_per_dispatch() if tunnel_paced()
                           else (16 if RT > (1 << 17) else None))
                pos, vals = render_samples_wavefront(
                    self.arrays, self.luts, self.camera, self.cfg,
                    self._px, self._py, jnp.uint32(self.spp),
                    iterations_per_dispatch=chunked, spp_batch=fuse,
                    sample_slots=True)
                if self._inv is not None:
                    # slots are pixel-major in tile order; expand the
                    # raster inverse permutation to slot granularity
                    inv_rt = (self._inv[:, None] * fuse
                              + jnp.arange(fuse)).ravel()
                    pos = pos[inv_rt]
                    vals = vals[inv_rt]
                for s in range(fuse):
                    self.film = _accumulate_filtered(
                        self.film, pos[s::fuse], vals[s::fuse],
                        self.filter_params, self.cfg.height,
                        self.cfg.width)
                self.spp += fuse
                self.frame_index += fuse
                remaining -= fuse
                continue
            if can_fuse_wf and remaining >= fuse:
                from .wavefront import (render_samples_wavefront,
                                        tunnel_paced,
                                        paced_iterations_per_dispatch)

                # spp_batch interleaves the samples in one pool pass:
                # same-pixel rays share bundles (the coherence lever);
                # per-path arithmetic matches sequential passes op-for-
                # op (lane seed = self.spp + sample index), summed per
                # pixel in lane retirement order (fp association only)
                RT = self._px.shape[0] * fuse
                chunked = (paced_iterations_per_dispatch() if tunnel_paced()
                           else (16 if RT > (1 << 17) else None))
                _, total = render_samples_wavefront(
                    self.arrays, self.luts, self.camera, self.cfg,
                    self._px, self._py, jnp.uint32(self.spp),
                    iterations_per_dispatch=chunked, spp_batch=fuse)
                if self._inv is not None:
                    total = total[self._inv]
                v = total.reshape(self.cfg.height, self.cfg.width, 3)
                self.film = Film(value=self.film.value + v,
                                 weight=self.film.weight + float(fuse))
                self.spp += fuse
                self.frame_index += fuse
                remaining -= fuse
                continue
            if can_fuse and remaining >= fuse:
                from .megakernel import (
                    render_samples_accumulated,
                    render_samples_accumulated_chunked,
                )

                chunk = self._mk_chunk(fuse)
                if chunk is not None:
                    total = render_samples_accumulated_chunked(
                        self.arrays, self.luts, self.camera, self.cfg,
                        self._px, self._py, jnp.uint32(self.spp), fuse,
                        chunk)
                else:
                    total = render_samples_accumulated(
                        self.arrays, self.luts, self.camera, self.cfg,
                        self._px, self._py, jnp.uint32(self.spp), fuse)
                if self._inv is not None:
                    total = total[self._inv]
                v = total.reshape(self.cfg.height, self.cfg.width, 3)
                self.film = Film(value=self.film.value + v,
                                 weight=self.film.weight + float(fuse))
                self.spp += fuse
                self.frame_index += fuse
                remaining -= fuse
            else:
                if seed_mode == SEED_FIXED:
                    seed = fixed_seed
                elif seed_mode == SEED_FRAME_INDEX:
                    seed = self.frame_index
                else:
                    seed = self.spp
                self.render_sample(seed)
                remaining -= 1
        return self.image()

    def image(self):
        """Resolved linear radiance (H, W, 3) numpy array."""
        return np.asarray(resolve(self.film))

    def preview(self, spp=1, scale=4):
        """Fast reduced-resolution render (the reference's quarter-res
        interactive preview, LaunchRendererLoop.cpp:206-237). Returns a
        (H/scale, W/scale, 3) linear image; does not touch the film.
        Repeated calls at the same scale hit the jit cache (the rebuilt
        RenderConfig is a frozen dataclass — equal values, equal jit
        key); pixels trace in square-tile order on TPU like the main
        path (raster-order bundles measured ~10x slower)."""
        from .megakernel import render_samples, tiled_frame_pixels

        pw = max(self.cfg.width // scale, 1)
        ph = max(self.cfg.height // scale, 1)
        cfg = self.cfg.__class__(**{**self.cfg.__dict__,
                                    "width": pw, "height": ph})
        if jax.default_backend() == "tpu":
            px, py, inv = tiled_frame_pixels(cfg)
        else:
            px, py = full_frame_pixels(cfg)
            inv = None
        acc = jnp.zeros((ph * pw, 3), jnp.float32)
        for s in range(spp):
            _, v = render_samples(self.arrays, self.luts, self.camera,
                                  cfg, px, py, jnp.uint32(s))
            acc = acc + v
        if inv is not None:
            acc = acc[inv]
        return np.asarray(acc).reshape(ph, pw, 3) / spp

    def postprocessed(self):
        """Display-ready sRGB image through the exposure/tonemap chain.

        For a thin-lens camera the EV100 relative aperture is derived
        from the camera itself (reference: Scene.cpp:844-847 derives the
        aperture diameter as focal_length / relative_aperture, so
        N = f / (2 * aperture_radius); f recovers from the Gaussian lens
        equation that produced film_distance)."""
        radius = float(np.asarray(self.camera.aperture_radius))
        pinhole = radius == 0.0
        params = self.post_params
        if not pinhole and params.ev100_from_camera:
            fd = float(np.asarray(self.camera.film_distance))
            s = float(np.asarray(self.camera.focal_distance))
            if s > fd > 0.0:
                f = fd * s / (s - fd)
                params = params._replace(
                    relative_aperture=f / (2.0 * radius))
        return np.asarray(post_process(self.film.value, self.film.weight,
                                       params,
                                       aperture_is_pinhole=pinhole))

    # ---- headless scene edits (reference: per-frame editor writes,
    # Source/Scene.cpp:672-807 — buffer-region updates, no BVH rebuild;
    # here: SceneArrays field updates, no re-flatten, no recompile).
    # Every edit resets the film like the reference's dirty flag.

    def set_material(self, index, **fields):
        """Edit a material (albedo/ior/roughness/tiling/opacity)."""
        from ..scene.edit import update_material

        self.arrays = update_material(self.arrays, index, **fields)
        self.reset()

    def set_light(self, index, radiance=None, position=None):
        from ..scene.edit import update_light

        self.arrays = update_light(self.arrays, index, radiance=radiance,
                                   position=position)
        self.reset()

    def set_instance_override(self, index, material_override):
        from ..scene.edit import update_instance_override

        self.arrays = update_instance_override(self.arrays, index,
                                               material_override)
        self.reset()

    def set_emitter_radiance(self, instance_index, radiance):
        from ..scene.edit import update_emitter_radiance

        self.arrays = update_emitter_radiance(self.arrays,
                                              instance_index, radiance)
        self.reset()

    # ---- checkpoint / resume (SURVEY.md §5: absent in the reference) ----

    def save_checkpoint(self, path):
        np.savez_compressed(
            path, value=np.asarray(self.film.value),
            weight=np.asarray(self.film.weight), spp=self.spp)

    def load_checkpoint(self, path):
        data = np.load(path)
        assert data["value"].shape == (self.cfg.height, self.cfg.width, 3)
        self.film = Film(value=jnp.asarray(data["value"]),
                         weight=jnp.asarray(data["weight"]))
        self.spp = int(data["spp"])

"""Progressive renderer driver: scene + camera + config -> image.

The host-side orchestration analogue of the reference's frame loop
(reference: Source/LaunchRendererLoop.cpp:201-271 DispatchRayTracing —
progressive accumulation with per-sample frame seeds, SPP counting,
film reset on dirty state). Python drives one jitted sample pass per
progressive step; everything per-sample runs on device.
"""

import numpy as np
import jax.numpy as jnp

from ..core.constants import LIGHT_INDEX_INVALID
from ..film.film import accumulate_box, create_film, resolve
from ..lut.textures import placeholder_luts
from ..scene.scene import flatten_scene
from .common import RenderConfig
from .megakernel import full_frame_pixels, render_samples

SEED_SAMPLE_COUNT = "sample_count"   # seed = accumulated sample index
SEED_FIXED = "fixed"                 # pinned seed (deterministic retrace)


class Renderer:
    def __init__(self, scene, camera, width, height, max_bounce=4,
                 luts=None, integrator="megakernel", **cfg_overrides):
        self.arrays, self.meta = flatten_scene(scene)
        self.camera = camera
        self.luts = luts if luts is not None else placeholder_luts()
        env_idx = (self.meta.env_light_index
                   if self.meta.env_light_index != LIGHT_INDEX_INVALID
                   else -1)
        self.cfg = RenderConfig(
            width=width, height=height, max_bounce=max_bounce,
            stack_size=self.meta.stack_size,
            light_count=self.meta.light_count,
            env_light_index=env_idx,
            has_env_texture=self.meta.has_env_texture,
            any_hit=self.meta.any_non_opaque,
            **cfg_overrides)
        self.integrator = integrator
        self.film = create_film(height, width)
        self.spp = 0

    def reset(self):
        self.film = create_film(self.cfg.height, self.cfg.width)
        self.spp = 0

    def render_sample(self, frame_seed):
        """Trace one sample per pixel and accumulate into the film."""
        px, py = full_frame_pixels(self.cfg)
        if self.integrator == "megakernel":
            _, values = render_samples(
                self.arrays, self.luts, self.camera, self.cfg, px, py,
                jnp.uint32(frame_seed))
        else:
            from .wavefront import render_samples_wavefront
            _, values = render_samples_wavefront(
                self.arrays, self.luts, self.camera, self.cfg, px, py,
                jnp.uint32(frame_seed))
        self.film = accumulate_box(self.film, values, self.cfg.height,
                                   self.cfg.width)
        self.spp += 1

    def render(self, spp, seed_mode=SEED_SAMPLE_COUNT, fixed_seed=0):
        for s in range(spp):
            seed = fixed_seed if seed_mode == SEED_FIXED else self.spp
            self.render_sample(seed)
        return self.image()

    def image(self):
        """Resolved linear radiance (H, W, 3) numpy array."""
        return np.asarray(resolve(self.film))

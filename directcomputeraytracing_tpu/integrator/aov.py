"""AOV / debug output passes.

TPU analogue of the reference's megakernel debug variants
(reference: Shaders/MegakernelPathTracing.hlsl:212-293 OUTPUT_NORMAL /
OUTPUT_TANGENT / OUTPUT_ALBEDO / OUTPUT_NEGATIVE_NDOTV / OUTPUT_BACKFACE
/ OUTPUT_ITERATION_COUNT, selected per-scene at
MegakernelPathTracer.cpp:310-314): trace the camera ray only and emit a
shading-input channel, or the traversal iteration count as a cost
heatmap. One jitted pass per AOV kind (static arg -> specialized
compile, like the reference's #define variants).
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..accel.traverse import intersect_closest
from ..camera.camera import generate_ray
from ..rng.xoshiro import init_rng, next_sample_2d, next_sample_3d
from .common import RenderConfig, shade_hit

F32 = jnp.float32

AOV_KINDS = ("normal", "tangent", "albedo", "negative_ndotv", "backface",
             "iteration_count")


@partial(jax.jit, static_argnames=("cfg", "kind"))
def render_aov(scene, cam, cfg: RenderConfig, pixel_x, pixel_y, frame_seed,
               kind="normal"):
    """One camera-ray pass -> (R, 3) AOV values (raster order)."""
    assert kind in AOV_KINDS, kind
    rng = init_rng(pixel_x, pixel_y, frame_seed)
    rng, pixel_sample = next_sample_2d(rng)
    res = jnp.asarray([cfg.width, cfg.height], F32)
    pix = jnp.stack([pixel_x, pixel_y], axis=-1).astype(F32)
    rng, aperture_sample = next_sample_3d(rng)
    origin, wi = generate_ray(cam, (pixel_sample + pix) / res,
                              aperture_sample)

    # the iteration-count heatmap needs a backend with cost counters:
    # the stack walker counts per-ray node iterations and the work-list
    # kernels count per-block swept clusters (the production path);
    # the other Pallas kernels have no counter -> pin "jax"
    backend = cfg.traversal_backend
    if kind == "iteration_count":
        from ..accel.traverse import _resolve_backend

        if not str(_resolve_backend(scene, backend)).startswith(
                ("jax", "pallas_wl")):
            backend = "jax"
    hit = intersect_closest(scene, origin, wi, cfg.stack_size,
                            backend=backend, watertight=cfg.watertight)
    itx = shade_hit(scene, origin, wi, hit)
    mask = hit.hit[..., None]

    if kind == "normal":
        v = itx.normal * 0.5 + 0.5
    elif kind == "tangent":
        v = itx.tangent * 0.5 + 0.5
    elif kind == "albedo":
        v = itx.albedo
    elif kind == "negative_ndotv":
        n_dot_v = jnp.sum(itx.normal * -wi, axis=-1)
        v = jnp.where((n_dot_v < 0.0)[..., None],
                      jnp.asarray([1.0, 0.0, 0.0], F32), 0.0)
    elif kind == "backface":
        v = jnp.where(hit.backface[..., None],
                      jnp.asarray([1.0, 0.0, 0.0], F32), 0.0)
    else:  # iteration_count
        c = hit.iterations.astype(F32)[..., None]
        v = jnp.concatenate([c, c, c], axis=-1)
        return v  # unmasked: misses show their traversal cost too
    return jnp.where(mask, v, 0.0)

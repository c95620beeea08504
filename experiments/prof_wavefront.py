"""Wavefront ms/spp at 256^2 vs pool size, against the megakernel."""

import sys
import time

import jax
import jax.numpy as jnp

from directcomputeraytracing_tpu.integrator.common import RenderConfig
from directcomputeraytracing_tpu.integrator.megakernel import (
    full_frame_pixels, render_samples,
)
from directcomputeraytracing_tpu.integrator.wavefront import (
    render_samples_wavefront,
)
from directcomputeraytracing_tpu.lut.bake import bake_luts_cached
from directcomputeraytracing_tpu.scene.presets import cornell_box
from directcomputeraytracing_tpu.scene.scene import flatten_scene


def timed(fn, reps=4):
    # force a host readback: through the remote-device tunnel
    # block_until_ready alone under-reports
    red = jax.jit(lambda o: jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(x.astype(jnp.float32)), o, 0.0))
    float(red(fn(jnp.uint32(0))))
    best = 1e9
    for k in range(reps):
        t0 = time.perf_counter()
        float(red(fn(jnp.uint32(k + 1))))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    scene, cam = cornell_box(light="area", material_set="glossy")
    arrays, meta = flatten_scene(scene)
    cfg = RenderConfig(width=side, height=side, max_bounce=4,
                       stack_size=meta.stack_size,
                       light_count=meta.light_count)
    px, py = full_frame_pixels(cfg)
    luts = bake_luts_cached()

    t = timed(lambda s: render_samples(arrays, luts, cam, cfg, px, py, s))
    print(f"megakernel: {t*1e3:8.2f} ms/spp")

    R = side * side
    for pool_shift in (17, 16, 15, 14, 13):
        p = 1 << pool_shift
        if p > 2 * R:
            continue
        t = timed(lambda s: render_samples_wavefront(
            arrays, luts, cam, cfg, px, py, s, pool_size=p))
        print(f"wavefront P=2^{pool_shift} ({p:6d}): {t*1e3:8.2f} ms/spp")


if __name__ == "__main__":
    main()

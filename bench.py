"""Benchmark: BVH traversal Mrays/sec + Cornell spp/sec on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference publishes no numbers (BASELINE.md); the driver
north star is >=100 Mrays/sec two-level-BVH traversal per TPU chip, so
vs_baseline = value / 100.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from directcomputeraytracing_tpu.accel.traverse import intersect_closest
    from directcomputeraytracing_tpu.integrator.common import RenderConfig
    from directcomputeraytracing_tpu.integrator.megakernel import (
        full_frame_pixels, render_samples,
    )
    from directcomputeraytracing_tpu.camera.camera import generate_ray
    from directcomputeraytracing_tpu.lut.textures import placeholder_luts
    from directcomputeraytracing_tpu.rng.xoshiro import (
        init_rng, next_sample_2d, next_sample_3d,
    )
    from directcomputeraytracing_tpu.scene.presets import cornell_box
    from directcomputeraytracing_tpu.scene.scene import flatten_scene

    scene, cam = cornell_box(light="area", material_set="glossy")
    arrays, meta = flatten_scene(scene)

    # ---- traversal throughput: camera rays for an 8M-ray batch ----------
    # (large batch amortizes the fixed per-dispatch host->device latency)
    w, h = 4096, 2048
    n = w * h
    cfg = RenderConfig(width=w, height=h, max_bounce=4,
                       stack_size=meta.stack_size,
                       light_count=meta.light_count)
    px, py = full_frame_pixels(cfg)

    @jax.jit
    def make_rays(seed):
        rng = init_rng(px, py, seed)
        rng, jitter = next_sample_2d(rng)
        res = jnp.asarray([w, h], jnp.float32)
        pix = jnp.stack([px, py], -1).astype(jnp.float32)
        rng, ap = next_sample_3d(rng)
        return generate_ray(cam, (jitter + pix) / res, ap)

    @jax.jit
    def trace(o, d):
        hit = intersect_closest(arrays, o, d, cfg.stack_size)
        return hit.t.sum()  # consume

    o, d = jax.block_until_ready(make_rays(jnp.uint32(0)))
    jax.block_until_ready(trace(o, d))  # compile
    reps = 4
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(trace(o, d))
    dt = (time.perf_counter() - t0) / reps
    mrays = n / dt / 1e6

    # ---- end-to-end spp/sec: Cornell 256x256 full path loop, 8 spp fused
    # into each dispatch (amortizes the fixed tunnel dispatch latency)
    from directcomputeraytracing_tpu.integrator.megakernel import (
        render_samples_accumulated,
    )

    cfg2 = RenderConfig(width=256, height=256, max_bounce=4,
                        stack_size=meta.stack_size,
                        light_count=meta.light_count)
    px2, py2 = full_frame_pixels(cfg2)
    luts = placeholder_luts()
    fuse = 8

    def sample(seed):
        out = render_samples_accumulated(arrays, luts, cam, cfg2, px2,
                                         py2, seed, fuse)
        # force a device->host readback: through the remote-device tunnel
        # block_until_ready alone can under-report
        return float(out.sum())

    sample(jnp.uint32(0))
    reps2 = 3
    t0 = time.perf_counter()
    for k in range(reps2):
        sample(jnp.uint32((k + 1) * fuse))
    spp_sec = reps2 * fuse / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "bvh_traversal_mrays_per_sec",
        "value": round(float(mrays), 3),
        "unit": "Mrays/s",
        "vs_baseline": round(float(mrays) / 100.0, 4),
        "extra": {
            "cornell256_spp_per_sec": round(float(spp_sec), 3),
            "device": str(jax.devices()[0].platform),
        },
    }))


if __name__ == "__main__":
    main()

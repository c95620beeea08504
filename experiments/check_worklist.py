"""Correctness + perf check of the work-list traversal on TPU."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from directcomputeraytracing_tpu.accel.traverse import intersect_closest, \
    intersect_any
from directcomputeraytracing_tpu.camera.camera import generate_ray
from directcomputeraytracing_tpu.integrator.common import RenderConfig
from directcomputeraytracing_tpu.integrator.megakernel import (
    full_frame_pixels, tiled_frame_pixels,
)
from directcomputeraytracing_tpu.rng.xoshiro import (
    init_rng, next_sample_2d, next_sample_3d,
)
from directcomputeraytracing_tpu.scene.presets import sphere_grid
from directcomputeraytracing_tpu.scene.scene import flatten_scene


def rays_for(cam, cfg, seed=0, tiled=True):
    if tiled:
        px, py, _ = tiled_frame_pixels(cfg)
    else:
        px, py = full_frame_pixels(cfg)

    @jax.jit
    def make(seed):
        rng = init_rng(px, py, seed)
        rng, jitter = next_sample_2d(rng)
        res = jnp.asarray([cfg.width, cfg.height], jnp.float32)
        pix = jnp.stack([px, py], -1).astype(jnp.float32)
        rng, ap = next_sample_3d(rng)
        return generate_ray(cam, (jitter + pix) / res, ap)

    return jax.block_until_ready(make(jnp.uint32(seed)))


def bench_backend(scene_arrays, o, d, backend, stack, reps=4):
    @jax.jit
    def trace(o, d):
        h = intersect_closest(scene_arrays, o, d, stack, backend=backend)
        return h.t, h.u, h.v, h.triangle, h.instance

    out = jax.block_until_ready(trace(o, d))
    float(out[0].sum())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = trace(o, d)
        float(out[0].sum())
    dt = (time.perf_counter() - t0) / reps
    return out, dt


def main():
    for n in (5, 9):
        scene, cam = sphere_grid(n, n)
        arrays, meta = flatten_scene(scene)
        ntri = int(arrays.world_tris.shape[0])
        w = h = 1024
        cfg = RenderConfig(width=w, height=h, max_bounce=1,
                           stack_size=meta.stack_size,
                           light_count=meta.light_count)
        o, d = rays_for(cam, cfg)
        r = o.shape[0]
        print(f"--- sphere_grid({n}) tris={ntri} rays={r}")

        (t_wl, u_wl, v_wl, tri_wl, in_wl), dt_wl = bench_backend(
            arrays, o, d, "pallas_wl", meta.stack_size)
        print(f"worklist: {r/dt_wl/1e6:8.1f} Mrays/s  ({dt_wl*1e3:.1f} ms)")
        (t_cl, *_rest), dt_cl = bench_backend(
            arrays, o, d, "pallas_cluster", meta.stack_size)
        print(f"cluster : {r/dt_cl/1e6:8.1f} Mrays/s  ({dt_cl*1e3:.1f} ms)")

        # correctness vs the stack walker (subsample for speed)
        sub = slice(0, r, 17)
        hj = jax.jit(lambda o, d: intersect_closest(
            arrays, o, d, meta.stack_size, backend="jax"))(o[sub], d[sub])
        tw = np.asarray(t_wl)[sub]
        tj = np.asarray(hj.t)
        both = np.isfinite(tw) & np.isfinite(tj)
        rel = np.abs(tw[both] - tj[both]) / np.maximum(tj[both], 1e-6)
        print(f"hit agree: {np.mean(np.isfinite(tw) == np.isfinite(tj)):.6f}"
              f"  t rel err: max={rel.max():.3g} "
              f"p99={np.percentile(rel, 99):.3g}"
              f"  tri match: "
              f"{np.mean(np.asarray(tri_wl)[sub][both] == np.asarray(hj.triangle)[both]):.6f}")

        # occlusion agreement
        occ_wl = jax.jit(lambda o, d: intersect_any(
            arrays, o, d, jnp.inf, meta.stack_size,
            backend="pallas_wl"))(o, d)
        occ_j = jax.jit(lambda o, d: intersect_any(
            arrays, o, d, jnp.inf, meta.stack_size,
            backend="jax"))(o[sub], d[sub])
        print(f"occ agree: "
              f"{np.mean(np.asarray(occ_wl)[sub] == np.asarray(occ_j)):.6f}")


if __name__ == "__main__":
    main()

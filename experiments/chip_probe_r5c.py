"""Round-5 probe session (one process, run while the headline artifact
render is paused at a checkpoint):

  1. 212k coherent camera closest cast: single-window vs distance-slab
     marching (the pool's 4.1x lever, unmeasured on wlg-era coherent
     casts — the old "9x slower" verdict predates fine-enter/wlg).
  2. Swept-cluster census: mean/p90 clusters swept per ray on the soup
     212k cast vs the instanced 1M cast (HitInfo.iterations row) — is
     the instanced closest kernel sweeping too much (algorithmic) or
     sweeping the right amount slowly (per-sweep cost)?
  3. REKEY A/B (DCRT_WL_REKEY trace-time flag) on both kernel families'
     closest casts.
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

os.environ.setdefault("DCRT_WL_SLICE_LOG2", "22")

cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_compile_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from directcomputeraytracing_tpu.accel import worklist as wl
from directcomputeraytracing_tpu.accel.traverse import (
    intersect_closest, intersect_closest_slab,
)
from directcomputeraytracing_tpu.camera.camera import generate_ray
from directcomputeraytracing_tpu.integrator.common import RenderConfig
from directcomputeraytracing_tpu.integrator.megakernel import (
    tiled_frame_pixels,
)
from directcomputeraytracing_tpu.rng.xoshiro import (
    init_rng, next_sample_2d, next_sample_3d,
)
from directcomputeraytracing_tpu.scene.presets import sphere_grid
from directcomputeraytracing_tpu.scene.scene import flatten_scene


def timed(fn, reps=3):
    fn()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def rays_for(cam, px, py, w, h):
    @jax.jit
    def make(seed):
        rng = init_rng(px, py, seed)
        rng, jitter = next_sample_2d(rng)
        res = jnp.asarray([w, h], jnp.float32)
        pix = jnp.stack([px, py], -1).astype(jnp.float32)
        rng, ap = next_sample_3d(rng)
        return generate_ray(cam, (jitter + pix) / res, ap)
    return jax.block_until_ready(make(jnp.uint32(0)))


def build(n, w):
    scene, cam = sphere_grid(n, n)
    arrays, meta = flatten_scene(scene)
    cfg = RenderConfig(width=w, height=w, max_bounce=1,
                       stack_size=meta.stack_size,
                       light_count=meta.light_count)
    px, py, _ = tiled_frame_pixels(cfg)
    o, d = rays_for(cam, px, py, w, w)
    return arrays, cfg, o, d, w * w


K = 4
for label, n, w in (("212k", 12, 2048), ("1M", 27, 1024)):
    arrays, cfg, o, d, NR = build(n, w)

    # --- census (one cast, read iterations row) ----------------------
    @jax.jit
    def census(o, d):
        hit = intersect_closest(arrays, o, d, cfg.stack_size)
        it = hit.iterations.astype(jnp.float32)
        return (jnp.mean(it), jnp.percentile(it, 90), jnp.max(it),
                jnp.mean(hit.hit.astype(jnp.float32)))
    m, p90, mx, hr = jax.block_until_ready(census(o, d))
    print(f"{label} census: swept/ray mean={float(m):.1f} "
          f"p90={float(p90):.0f} max={float(mx):.0f} "
          f"hit_rate={float(hr):.2f}", flush=True)
    time.sleep(2.0)

    # --- plain vs slab closest --------------------------------------
    def mk_plain():
        @jax.jit
        def f(o, d):
            def body(c, k):
                hit = intersect_closest(
                    arrays, o + 1e-6 * k.astype(jnp.float32), d,
                    cfg.stack_size)
                return c + hit.t.sum(), ()
            s, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
            return s
        return f

    def mk_slab(f_cap, ph):
        root_lo = arrays.node_bbox_min[0]
        root_hi = arrays.node_bbox_max[0]
        diag = float(np.sqrt(np.sum(
            (np.asarray(root_hi) - np.asarray(root_lo)) ** 2)))

        @jax.jit
        def f(o, d):
            def body(c, k):
                hit = intersect_closest_slab(
                    arrays, o + 1e-6 * k.astype(jnp.float32), d,
                    cfg.stack_size, jnp.float32(f_cap * diag),
                    phases=ph)
                return c + jnp.where(hit.hit, hit.t, 0.0).sum(), ()
            s, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
            return s
        return f

    fp = mk_plain()
    t_p = timed(lambda: float(fp(o, d))) / K
    print(f"{label} closest plain : {t_p*1e3:8.2f} ms "
          f"({NR/t_p/1e6:6.1f} Mrays/s)", flush=True)
    time.sleep(2.0)
    for f_cap in (0.03, 0.1):
        fs = mk_slab(f_cap, 2)
        t_s = timed(lambda: float(fs(o, d))) / K
        print(f"{label} closest slab f={f_cap}: {t_s*1e3:8.2f} ms "
              f"({NR/t_s/1e6:6.1f} Mrays/s)", flush=True)
        time.sleep(2.0)

    # --- REKEY A/B ---------------------------------------------------
    wl._REKEY = True

    @jax.jit
    def frk(o, d):
        def body(c, k):
            hit = intersect_closest(
                arrays, o + 1e-6 * k.astype(jnp.float32), d,
                cfg.stack_size)
            return c + hit.t.sum(), ()
        s, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
        return s
    t_r = timed(lambda: float(frk(o, d))) / K
    wl._REKEY = False
    print(f"{label} closest rekey : {t_r*1e3:8.2f} ms "
          f"({NR/t_r/1e6:6.1f} Mrays/s)", flush=True)
    time.sleep(2.0)
print("done", flush=True)

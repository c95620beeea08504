"""Finer split of the wavefront iteration's RESIDUAL (everything that
is not the two pool casts or the permute): shade_hit, BSDF eval+pdf+
sample, light sample/eval, RNG refill, film scatter — each at pool
width on a warmed mid-drain state. Complements prof_wfsplit.py."""
import os
import tempfile
import time

import numpy as np
import jax
import jax.numpy as jnp

cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_compile_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from directcomputeraytracing_tpu.integrator import wavefront as wf
from directcomputeraytracing_tpu.integrator.common import shade_hit
from directcomputeraytracing_tpu.integrator.renderer import Renderer
from directcomputeraytracing_tpu.scene.standin import write_standin_scene
from directcomputeraytracing_tpu.scene.xml_loader import load_mitsuba_xml

with tempfile.TemporaryDirectory() as d:
    xml = write_standin_scene(d)
    scene, settings = load_mitsuba_xml(xml)
cam = settings.camera

r = Renderer(scene, cam, width=1920, height=1080, max_bounce=4,
             any_hit=True, integrator="wavefront")
arrays, cfg = r.arrays, r.cfg
px, py = r._px, r._py
S = 8

state = wf._init_state(arrays, r.luts, cam, cfg, px, py, jnp.uint32(0),
                       None, S)
for k in range(6):
    t0 = time.perf_counter()
    state, _it = wf._chunk(arrays, r.luts, cam, cfg, px, py,
                           jnp.uint32(0), state, None, 16, S)
    float(state.out_val.sum())
    print(f"warm {k}: {time.perf_counter()-t0:.1f}s "
          f"cursor={int(state.cursor)}", flush=True)
    time.sleep(2.0)

busy, ray_o, ray_d = state.busy, state.ray_o, state.ray_d


def bench(label, fn, reps=3):
    out = fn()
    jax.block_until_ready(out)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
          .astype(np.float32))
    best = 1e9
    for _ in range(reps):
        t1 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
              .astype(np.float32))
        best = min(best, time.perf_counter() - t1)
    print(f"{label:40s} {best*1e3:9.1f} ms", flush=True)
    return best


# a representative hit batch: cast once outside the timings
hit = jax.jit(lambda b, o, d, ou: wf._pool_closest(
    arrays, cfg, b, o, d, ou))(busy, ray_o, ray_d, state.opacity_u)
hit = jax.block_until_ready(hit)

bench("shade_hit (pool width)", lambda: jax.jit(shade_hit)(
    arrays, ray_o, ray_d, hit))

itx = jax.jit(shade_hit)(arrays, ray_o, ray_d, hit)
itx = jax.block_until_ready(itx)

from directcomputeraytracing_tpu.bsdf.dispatch import (
    evaluate_bsdf, evaluate_bsdf_pdf, sample_bsdf,
)
from directcomputeraytracing_tpu.lights.lights import (
    evaluate_light_direct, sample_light_direct,
)
from directcomputeraytracing_tpu.rng.xoshiro import init_rng, \
    next_sample_2d

wo = -ray_d
u2 = jnp.ones((busy.shape[0], 2), jnp.float32) * 0.3
u1 = jnp.ones((busy.shape[0],), jnp.float32) * 0.4

bench("sample_bsdf", lambda: jax.jit(sample_bsdf, static_argnums=4)(
    r.luts, wo, u2, u1, itx, True))
bench("evaluate_bsdf + pdf", lambda: jax.jit(
    lambda luts, w, wo, itx: (evaluate_bsdf(luts, w, wo, itx, True),
                              evaluate_bsdf_pdf(luts, w, wo, itx,
                                                True)))(
    r.luts, wo, wo, itx))
bench("sample_light_direct", lambda: jax.jit(
    lambda p, a, b, c: sample_light_direct(
        arrays, cfg.light_count, cfg.has_env_texture, p, a, b, c))(
    itx.position, u1, u1, u2))
bench("evaluate_light_direct", lambda: jax.jit(
    lambda li, tri, gn, d, t: evaluate_light_direct(
        arrays, max(cfg.light_count, 1), cfg.has_env_texture, li, tri,
        gn, d, t))(
    itx.light_index, itx.triangle_index, itx.geometry_normal, ray_d,
    hit.t))
bench("init_rng + 2d (refill)", lambda: jax.jit(
    lambda a, b: next_sample_2d(init_rng(a, b, jnp.uint32(3))))(
    jnp.zeros(busy.shape[0], jnp.uint32),
    jnp.zeros(busy.shape[0], jnp.uint32)))

R = px.shape[0]
val = jnp.zeros((R, 3), jnp.float32)
li3 = itx.albedo
pidx = jnp.clip(state.pixel, 0, R - 1)

bench("film scatter-add (pool->R)", lambda: jax.jit(
    lambda v, idx, li: v.at[idx].add(li, mode="drop"))(
    val, pidx, li3))
print("done", flush=True)

"""Steady-state stage split of the 1080p stand-in wavefront iteration
at spp_batch=8 (the headline bench config): where do the ~2+ s per
iteration go once the pool is full? Pieces measured on the warmed
state: the full 8-iter chunk, the pool permute (argsort + gathers),
the closest and any pool casts, and the residual (refill + shading +
NEE + BSDF + film)."""
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

from directcomputeraytracing_tpu.integrator.common import (
    pool_cast_backend,
)

print("pool backend:", pool_cast_backend(cfg), flush=True)

state = wf._init_state(arrays, r.luts, cam, cfg, px, py, jnp.uint32(0),
                       None, S)

# warm into MID-DRAIN steady state (the diag cost curve peaks at
# cursor 6-13M of 16.6M; the early drain is ~2.5x cheaper — measuring
# there is exactly the round-4 mistake). 16-iter chunks only: one
# compiled trip-count variant (shared with diag/bench cache entries),
# 2 s idle gaps for the tunnel occupancy watchdog.
for k in range(6):
    t0 = time.perf_counter()
    state, _it = wf._chunk(arrays, r.luts, cam, cfg, px, py, jnp.uint32(0),
                      state, None, 16, S)
    float(state.out_val.sum())
    dt = time.perf_counter() - t0
    print(f"[{time.strftime('%H:%M:%S')}] 16 iters: {dt:.2f}s "
          f"({dt/16*1e3:.0f} ms/iter) "
          f"cursor={int(state.cursor)} busy={int(state.busy.sum())}",
          flush=True)
    time.sleep(2.0)

busy, ray_o, ray_d = state.busy, state.ray_o, state.ray_d
ou = state.opacity_u


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
    print(f"{label:36s} {best*1e3:9.1f} ms", flush=True)
    return best


@jax.jit
def permute_only(busy, ray_o, ray_d, rng, pix, tp, li):
    return wf._permute_pool(arrays, busy, ray_o, ray_d,
                            (rng, pix, tp, li))[0]


@jax.jit
def closest_only(busy, o, d, ou):
    h = wf._pool_closest(arrays, cfg, busy, o, d, ou)
    return h.t


@jax.jit
def closest_noalpha(busy, o, d):
    # bare cast (no alpha recast loop): its gap vs closest_only is the
    # alpha machinery's share (opaque/masked split + recast passes)
    h = wf._pool_closest(arrays, cfg, busy, o, d, None)
    return h.t


@jax.jit
def any_only(busy, o, d, ou):
    # proxy shadow cast: unit-length occlusion query from the pool rays
    return wf._pool_any(arrays, cfg, busy, o, d,
                        jnp.full(o.shape[:1], 2.0, jnp.float32), ou)


@jax.jit
def any_noalpha(busy, o, d):
    return wf._pool_any(arrays, cfg, busy, o, d,
                        jnp.full(o.shape[:1], 2.0, jnp.float32), None)


@jax.jit
def one_iter(state):
    return wf._chunk(arrays, r.luts, cam, cfg, px, py, jnp.uint32(0),
                     state, None, 1, S)


t_perm = bench("permute pool (argsort + 7 gathers)",
               lambda: permute_only(busy, ray_o, ray_d, state.rng,
                                    state.pixel, state.throughput,
                                    state.li))
t_clo = bench("pool closest cast (alpha)", lambda: closest_only(
    busy, ray_o, ray_d, ou))
bench("pool closest cast (no alpha)", lambda: closest_noalpha(
    busy, ray_o, ray_d))
t_any = bench("pool any cast (alpha)", lambda: any_only(
    busy, ray_o, ray_d, ou))
bench("pool any cast (no alpha)", lambda: any_noalpha(
    busy, ray_o, ray_d))
t_iter = bench("one full iteration", lambda: one_iter(state))
print(f"residual (refill+shade+NEE+BSDF+film): "
      f"{(t_iter - t_perm - t_clo - t_any)*1e3:.0f} ms", flush=True)
print("done", flush=True)

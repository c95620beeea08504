"""Steady-state stage split of the 1080p stand-in wavefront iteration
at spp_batch=8 (the headline bench config): where do the ~2+ s per
iteration go once the pool is full? Pieces measured on the warmed
state: the full 8-iter chunk, the pool permute (argsort + gathers),
the closest and any pool casts, and the residual (refill + shading +
NEE + BSDF + film)."""
import tempfile
import time

import numpy as np
import jax
import jax.numpy as jnp

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

t0 = time.perf_counter()
state = wf._init_state(arrays, r.luts, cam, cfg, px, py, jnp.uint32(0),
                       None, S)
state, _it = wf._chunk(arrays, r.luts, cam, cfg, px, py, jnp.uint32(0),
                  state, None, 4, S)
state = jax.block_until_ready(state)
print(f"compile+4 iters: {time.perf_counter()-t0:.1f}s", flush=True)

# warm into steady state (busy near pool capacity)
for k in range(5):
    t0 = time.perf_counter()
    state, _it = wf._chunk(arrays, r.luts, cam, cfg, px, py, jnp.uint32(0),
                      state, None, 8, S)
    float(state.out_val.sum())
    dt = time.perf_counter() - t0
    print(f"8 iters: {dt:.2f}s ({dt/8*1e3:.0f} ms/iter) "
          f"cursor={int(state.cursor)} busy={int(state.busy.sum())}",
          flush=True)

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
def any_only(busy, o, d):
    # proxy shadow cast: unit-length occlusion query from the pool rays
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
t_clo = bench("pool closest cast", lambda: closest_only(
    busy, ray_o, ray_d, ou))
t_any = bench("pool any cast (2.0 window)", lambda: any_only(
    busy, ray_o, ray_d))
t_iter = bench("one full iteration", lambda: one_iter(state))
print(f"residual (refill+shade+NEE+BSDF+film): "
      f"{(t_iter - t_perm - t_clo - t_any)*1e3:.0f} ms", flush=True)
print("done", flush=True)

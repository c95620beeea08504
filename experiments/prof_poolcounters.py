"""Swept-cluster counters on real workloads: processed-per-block vs
the ~600-entered floor from the census — is the incoherent sweep
break-limited (fixable) or already at its floor?"""
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

from directcomputeraytracing_tpu.accel.traverse import intersect_closest
from directcomputeraytracing_tpu.integrator import wavefront as wf
from directcomputeraytracing_tpu.integrator.common import ray_sort_key
from directcomputeraytracing_tpu.integrator.renderer import Renderer
from directcomputeraytracing_tpu.scene.standin import write_standin_scene
from directcomputeraytracing_tpu.scene.xml_loader import load_mitsuba_xml

with tempfile.TemporaryDirectory() as d:
    xml = write_standin_scene(d)
    scene, settings = load_mitsuba_xml(xml)
cam = settings.camera

r = Renderer(scene, cam, width=1920, height=1080, max_bounce=4,
             any_hit=True, integrator="wavefront")
px, py = r._px, r._py
cfg = r.cfg
state = wf._init_state(r.arrays, r.luts, cam, cfg, px, py,
                       jnp.uint32(0), None, 8)
for _ in range(2):
    state, _it = wf._chunk(r.arrays, r.luts, cam, cfg, px, py, jnp.uint32(0),
                      state, None, 4, 8)
state = jax.block_until_ready(state)
print("busy", int(state.busy.sum()), flush=True)

arrays = r.arrays
root_lo = arrays.node_bbox_min[0]
inv_ext = 1.0 / jnp.maximum(arrays.node_bbox_max[0] - root_lo, 1e-6)


@jax.jit
def sorted_cast_iters(busy, ray_o, ray_d):
    key = ray_sort_key(ray_o, ray_d, root_lo, inv_ext)
    key = jnp.where(busy, key, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(key)
    far = jnp.float32(2e9)
    o = jnp.where(busy[:, None], ray_o, far)[order]
    d = jnp.where(busy[:, None], ray_d,
                  jnp.asarray([1.0, 0.0, 0.0], jnp.float32))[order]
    h = intersect_closest(arrays, o, d, cfg.stack_size,
                          backend="pallas_wl")
    return h.iterations, jnp.asarray(busy, jnp.int32)[order]


t0 = time.perf_counter()
iters, live = sorted_cast_iters(state.busy, state.ray_o, state.ray_d)
iters = np.asarray(iters)
live = np.asarray(live)
dt = time.perf_counter() - t0
t0 = time.perf_counter()
jax.block_until_ready(sorted_cast_iters(state.busy, state.ray_o,
                                        state.ray_d))
dt2 = time.perf_counter() - t0
blocks = iters.reshape(-1, 1024)[:, 0]
lb = live.reshape(-1, 1024).mean(axis=1)
print(f"pool closest no-alpha: {dt2*1e3:.0f} ms; "
      f"live blocks {(lb > 0.5).sum()}/{lb.shape[0]}", flush=True)
print(f"swept clusters/block: live-mean "
      f"{blocks[lb > 0.5].mean():.0f} p90 "
      f"{np.percentile(blocks[lb > 0.5], 90):.0f} "
      f"max {blocks.max():.0f}; parked-mean "
      f"{blocks[lb <= 0.5].mean() if (lb <= 0.5).any() else 0:.0f}",
      flush=True)
print("done", flush=True)

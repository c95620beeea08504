"""Instrumented 1080p wavefront: per-chunk wall times at a small
iterations_per_dispatch, to find what kills the 16-iteration chunks."""
import sys
import tempfile
import time

import jax
import jax.numpy as jnp

from directcomputeraytracing_tpu.integrator import wavefront as wf
from directcomputeraytracing_tpu.integrator.renderer import Renderer
from directcomputeraytracing_tpu.scene.standin import write_standin_scene
from directcomputeraytracing_tpu.scene.xml_loader import load_mitsuba_xml

ipd = int(sys.argv[1]) if len(sys.argv) > 1 else 4

with tempfile.TemporaryDirectory() as d:
    xml = write_standin_scene(d)
    scene, settings = load_mitsuba_xml(xml)
cam = settings.camera

r = Renderer(scene, cam, width=1920, height=1080, max_bounce=4,
             any_hit=True, integrator="wavefront")
px, py = r._px, r._py
R = px.shape[0]
t0 = time.perf_counter()
state = wf._init_state(scene_arrays := r.arrays, r.luts, cam, r.cfg,
                       px, py, jnp.uint32(0))
state = jax.block_until_ready(state)
print(f"init: {time.perf_counter()-t0:.1f} s  pool={state.busy.shape[0]}",
      flush=True)
it = 0
while True:
    t0 = time.perf_counter()
    state, _it = wf._chunk(r.arrays, r.luts, cam, r.cfg, px, py,
                      jnp.uint32(0), state, None, ipd)
    state = jax.block_until_ready(state)
    it += ipd
    cur = int(state.cursor)
    busy = int(state.busy.sum())
    print(f"iters {it:4d}: {time.perf_counter()-t0:7.2f} s  "
          f"cursor={cur}/{R} busy={busy}", flush=True)
    if not (cur < R or busy):
        break
    if it > 400:
        print("BAIL: too many iterations")
        break
print("done")

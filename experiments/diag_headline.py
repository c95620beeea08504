"""Full-drain diagnosis of the 1080p headline row (VERDICT r4 #1):
runs the EXACT bench config — Renderer(1920x1080, wavefront,
spp=8 fused as spp_batch=8) — and prints per-chunk wall time, cursor
progress, busy count and the iteration count, so the 68 s/spp
driver-recorded rate decomposes into iterations x cost-vs-progress.

Usage: python experiments/diag_headline.py [spp]
"""
import os
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_compile_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from directcomputeraytracing_tpu.integrator import wavefront as wf
from directcomputeraytracing_tpu.integrator.renderer import Renderer
from directcomputeraytracing_tpu.scene.standin import write_standin_scene
from directcomputeraytracing_tpu.scene.xml_loader import load_mitsuba_xml

spp = int(sys.argv[1]) if len(sys.argv) > 1 else 8

with tempfile.TemporaryDirectory() as d:
    xml = write_standin_scene(d)
    scene, settings = load_mitsuba_xml(xml)

r = Renderer(scene, settings.camera, width=1920, height=1080,
             max_bounce=4, any_hit=True, integrator="wavefront")
from directcomputeraytracing_tpu.integrator.common import pool_cast_backend
print("pool backend:", pool_cast_backend(r.cfg),
      "ipd:", wf.paced_iterations_per_dispatch(),
      "pause:", wf.dispatch_pause_s(), flush=True)

t0 = time.perf_counter()
img = r.render(spp=spp)
dt = time.perf_counter() - t0
st = wf.LAST_STATS
print(f"wall {dt:.1f}s = {dt/spp:.1f} s/spp "
      f"(iters {st['iters']}, dispatches {st['dispatches']}, "
      f"pause {st['pause_s']}s, pool {st['pool_size']}, "
      f"items {st['items']})", flush=True)
P = st["pool_size"]
prev_c = 0
ipd = st["iters"] / max(st["dispatches"], 1)
for k, (cs, cur) in enumerate(zip(st["chunk_s"], st["cursor"])):
    print(f"  chunk {k:3d}: {cs:7.2f}s  cursor {cur:9d} "
          f"(+{cur - prev_c:8d} = {(cur - prev_c) / P:5.2f} pools)",
          flush=True)
    prev_c = cur
print("mean chunk", np.mean(st["chunk_s"]).round(2), "s; iters/disp",
      round(ipd, 1), "; s/iter",
      round((dt - st["pause_s"]) / max(st["iters"], 1), 2), flush=True)
print("img mean", float(np.asarray(img).mean()), flush=True)

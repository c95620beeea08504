"""Measure the BASELINE.md headline config: 212k-tri stand-in, 1080p,
wavefront integrator, ms per spp (steady-state, post-compile)."""
import tempfile
import time

from directcomputeraytracing_tpu.integrator.renderer import Renderer
from directcomputeraytracing_tpu.scene.standin import write_standin_scene
from directcomputeraytracing_tpu.scene.xml_loader import load_mitsuba_xml

with tempfile.TemporaryDirectory() as d:
    xml = write_standin_scene(d)
    scene, settings = load_mitsuba_xml(xml)
cam = settings.camera

r = Renderer(scene, cam, width=1920, height=1080, max_bounce=4,
             any_hit=True, integrator="wavefront")
t0 = time.perf_counter()
r.render(spp=1)
print(f"compile+1spp: {time.perf_counter()-t0:.1f} s", flush=True)
t0 = time.perf_counter()
r.render(spp=1)
dt = time.perf_counter() - t0
print(f"standin1080p_wavefront_ms_per_spp: {dt*1e3:.0f}")

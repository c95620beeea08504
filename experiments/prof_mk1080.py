"""1080p standin through the CHUNKED megakernel (pixel-window
dispatches): the structural comparison for the wavefront headline."""
import tempfile
import time

import jax
from directcomputeraytracing_tpu.integrator.renderer import Renderer
from directcomputeraytracing_tpu.scene.standin import write_standin_scene
from directcomputeraytracing_tpu.scene.xml_loader import load_mitsuba_xml

with tempfile.TemporaryDirectory() as d:
    xml = write_standin_scene(d)
    scene, settings = load_mitsuba_xml(xml)
cam = settings.camera

r = Renderer(scene, cam, width=1920, height=1080, max_bounce=4,
             any_hit=True)
t0 = time.perf_counter()
r.render(spp=1)
print(f"mk 1spp (compile+run): {time.perf_counter()-t0:.1f} s",
      flush=True)
t0 = time.perf_counter()
r.render(spp=1)
print(f"mk 1spp steady: {time.perf_counter()-t0:.1f} s", flush=True)
t0 = time.perf_counter()
r.render(spp=8)
print(f"mk 8spp fused-chunked: {time.perf_counter()-t0:.1f} s = "
      f"{(time.perf_counter()-t0)/8*1e3:.0f} ms/spp", flush=True)
print("done", flush=True)

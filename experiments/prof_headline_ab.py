"""Headline 1080p wavefront rate: box fast path vs the splatting-film
sample_slots path (the stand-in scene's own gaussian rfilter), plus a
dispatch-size sweep. Locates where the 71.8 s/spp measured by
experiments/headline_1080p.py goes (prof_wlg measured ~0.8-1.3 s per
pool iteration, which predicted ~30 s/spp)."""
import os
import sys
import tempfile
import time

from directcomputeraytracing_tpu.integrator.renderer import Renderer
from directcomputeraytracing_tpu.scene.standin import write_standin_scene
from directcomputeraytracing_tpu.scene.xml_loader import load_mitsuba_xml

import jax

cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_compile_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

with tempfile.TemporaryDirectory() as d:
    xml = write_standin_scene(d)
    scene, settings = load_mitsuba_xml(xml)

which = sys.argv[1] if len(sys.argv) > 1 else "both"


def run(label, **kw):
    r = Renderer(scene, settings.camera, width=1920, height=1080,
                 max_bounce=4, any_hit=True, integrator="wavefront",
                 **kw)
    t0 = time.perf_counter()
    r.render(spp=8)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    r.render(spp=8)
    dt = time.perf_counter() - t0
    print(f"{label:28s} warm+compile {warm:7.1f} s   "
          f"steady {dt/8:6.2f} s/spp", flush=True)


if which in ("both", "box"):
    run("box fast path", filter_type="box")
if which in ("both", "gauss"):
    run("gaussian splatting slots")

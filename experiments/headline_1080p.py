"""Headline end-to-end render: the 212k-tri alpha stand-in at 1080p
through the wavefront integrator, progressive to a target spp with
periodic checkpoints, resumable across process restarts (VERDICT r3 #5;
the reference's progressive accumulation loop is
LaunchRendererLoop.cpp:256-264 and its scene is the BASELINE.md 1080p
headline row).

Usage:
    python experiments/headline_1080p.py [target_spp] [ckpt_path]

Re-running with the same ckpt_path resumes from the last checkpoint.
Writes <ckpt>.png (tonemapped) and a JSON progress line per segment to
<ckpt>.jsonl; finishes with an RMSE check against a fresh half-res
megakernel oracle of the same scene.
"""
import json
import os
import sys
import tempfile
import time

import numpy as np

target_spp = int(sys.argv[1]) if len(sys.argv) > 1 else 256
ckpt = sys.argv[2] if len(sys.argv) > 2 else "/tmp/headline_1080p.npz"
seg_spp = int(os.environ.get("DCRT_HEADLINE_SEG", "8"))

from directcomputeraytracing_tpu.integrator.renderer import Renderer
from directcomputeraytracing_tpu.scene.standin import write_standin_scene
from directcomputeraytracing_tpu.scene.xml_loader import load_mitsuba_xml
from directcomputeraytracing_tpu.utils.image import save_image

import jax

cache = os.environ.get(
    "DCRT_JAX_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_compile_cache"))
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

with tempfile.TemporaryDirectory() as d:
    xml = write_standin_scene(d)
    scene, settings = load_mitsuba_xml(xml)

r = Renderer(scene, settings.camera, width=1920, height=1080,
             max_bounce=4, any_hit=True, integrator="wavefront")
if os.path.exists(ckpt):
    r.load_checkpoint(ckpt)
    print(f"resumed from {ckpt} at {r.spp} spp", flush=True)

log = open(ckpt + ".jsonl", "a")
t_start = time.perf_counter()
spp_at_start = r.spp
while r.spp < target_spp:
    seg = min(seg_spp, target_spp - r.spp)
    t0 = time.perf_counter()
    r.render(spp=seg)
    dt = time.perf_counter() - t0
    r.save_checkpoint(ckpt)
    rec = {"spp": r.spp, "segment_spp": seg, "segment_s": round(dt, 1),
           "s_per_spp": round(dt / seg, 1),
           "total_s": round(time.perf_counter() - t_start, 1)}
    print(json.dumps(rec), flush=True)
    log.write(json.dumps(rec) + "\n")
    log.flush()

img = r.image()
# gallery PNG goes through the real display chain (auto-exposure +
# Reinhard + sRGB), matching the reference's on-screen result
save_image(ckpt + ".png", r.postprocessed(), srgb=False)
print(f"saved {ckpt}.png at {r.spp} spp", flush=True)

# --- RMSE vs a half-res megakernel oracle (independent integrator) ---
ro = Renderer(scene, settings.camera, width=960, height=540,
              max_bounce=4, any_hit=True, integrator="megakernel")
ro.render(spp=32)
oracle = ro.image()
half = img.reshape(540, 2, 960, 2, 3).mean((1, 3))
rmse = float(np.sqrt(np.mean((half - oracle) ** 2)))
rec = {"spp": r.spp, "rmse_vs_halfres_mk32": round(rmse, 5),
       "wall_s_this_run": round(time.perf_counter() - t_start, 1),
       "spp_this_run": r.spp - spp_at_start}
print(json.dumps(rec), flush=True)
log.write(json.dumps(rec) + "\n")
log.close()

"""One-process round-5 chip session: each new tunnel client pays a
multi-minute chip grant wait, so the round's measurements batch into a
single process:

  1. diag_headline.py — the 1080p wavefront drain with the new
     pool-slab-march default (POOL_SLAB_DEFAULT), full chunk telemetry.
  2. chip_gg_inst.py  — group-gating A/B on the coherent bench casts
     and the instanced 1M-tri census/timings.

Each part is exception-isolated so a fault in one still yields the
other's numbers.
"""
import os
import runpy
import time
import traceback

base = os.path.dirname(os.path.abspath(__file__))

for name in ("diag_headline.py", "chip_gg_inst.py"):
    print(f"==== {name} ====", flush=True)
    t0 = time.time()
    try:
        runpy.run_path(os.path.join(base, name), run_name="__main__")
    except Exception:
        traceback.print_exc()
    print(f"==== {name} done in {time.time() - t0:.0f}s ====",
          flush=True)
    time.sleep(10.0)
print("session done", flush=True)

"""Mid-drain pool-cast capacity census + slab-march A/B (round 5).

The stage split (prof_wfsplit) showed the steady-state 1080p iteration
is 91% the pool CLOSEST cast (2.75 s bare), 20x the early-drain cost —
hypothesis: the phase item demand exceeds GROUP_CAPM*nb (= MAX_COARSE,
the SMEM budget) at mid-drain incoherence and the cast silently rides
the dense clustered fallback. This measures the true item demand on a
warmed mid-drain pool and A/Bs the slab-marched cast (window caps cut
items/block ~3x, pair_econ.py) against the single-window cast.

Caches the warmed pool state at /tmp/pool_state_s8.npz so repeat runs
skip the ~5 min warm.
"""
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

from directcomputeraytracing_tpu.accel import worklist as wl
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
STATE = "/tmp/pool_state_s8.npz"

if os.path.exists(STATE):
    d = np.load(STATE)
    state = wf.PoolState(*[jnp.asarray(d[f]) for f in
                           wf.PoolState._fields])
    print("loaded warm state:", int(state.cursor), flush=True)
else:
    state = wf._init_state(arrays, r.luts, cam, cfg, px, py,
                           jnp.uint32(0), None, S)
    for k in range(6):
        t0 = time.perf_counter()
        state, _it = wf._chunk(arrays, r.luts, cam, cfg, px, py,
                               jnp.uint32(0), state, None, 16, S)
        float(state.out_val.sum())
        print(f"warm {k}: {time.perf_counter()-t0:.1f}s "
              f"cursor={int(state.cursor)}", flush=True)
        time.sleep(2.0)
    np.savez(STATE, **{f: np.asarray(getattr(state, f))
                       for f in wf.PoolState._fields})

busy, ray_o, ray_d = state.busy, state.ray_o, state.ray_d
ou = state.opacity_u

# ---- phase item demand at GROUP_CAPM --------------------------------
o_p, d_p = wf._park(busy, ray_o, ray_d)


@jax.jit
def phase_stats(o, d):
    od, tm, _ = wl._prep_rays_wl(o, d)
    out = wl._phases(arrays, od, tm, False, cap_mult=wl.GROUP_CAPM)
    blkflags = out[2]
    fits = out[5]
    valid = (blkflags & 1) == 1
    blk = (blkflags >> wl._BLOCK_SHIFT) & wl._BLOCK_MASK
    nb = od.shape[1] // wl.RB
    per_block = jnp.zeros((nb,), jnp.int32).at[
        jnp.where(valid, blk, nb)].add(1, mode="drop")
    return (jnp.sum(valid.astype(jnp.int32)), fits, per_block)


tot, fits, per_block = jax.block_until_ready(phase_stats(o_p, d_p))
pb = np.asarray(per_block)
nb = pb.shape[0]
print(f"GROUP_CAPM={wl.GROUP_CAPM} MAX_COARSE={wl.MAX_COARSE} "
      f"nb={nb} cap_s={wl._capacity(nb, arrays.cluster_bbox.shape[0] - 1, wl.GROUP_CAPM)}",
      flush=True)
print(f"items total={int(tot)} fits={bool(fits)} per-block "
      f"mean={pb.mean():.1f} p50={np.percentile(pb, 50):.0f} "
      f"p90={np.percentile(pb, 90):.0f} max={pb.max()}", flush=True)

# NOTE: fits compares the COMPACT capacity (cap_s) against the total,
# not per-block: total > cap_s  ->  dense fallback for the whole cast.


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
    print(f"{label:44s} {best*1e3:9.1f} ms", flush=True)
    return best


def cfg_with(**kw):
    return cfg.__class__(**{**cfg.__dict__, **kw})


@jax.jit
def closest_plain(busy, o, d, ou):
    return wf._pool_closest(arrays, cfg, busy, o, d, ou).t


for f, ph in ((0.03, 2), (0.05, 2), (0.05, 3), (0.1, 2)):
    c2 = cfg_with(slab_march=f, slab_phases=ph)

    @jax.jit
    def closest_slab(busy, o, d, ou, c2=c2):
        return wf._pool_closest(arrays, c2, busy, o, d, ou).t

    bench(f"pool closest slab f={f} phases={ph}",
          lambda: closest_slab(busy, ray_o, ray_d, ou))
    time.sleep(1.0)

bench("pool closest single-window (ref)",
      lambda: closest_plain(busy, ray_o, ray_d, ou))

# any cast slab A/B
@jax.jit
def any_plain(busy, o, d, ou):
    return wf._pool_any(arrays, cfg, busy, o, d,
                        jnp.full(o.shape[:1], 2.0, jnp.float32), ou)


c3 = cfg_with(slab_march=0.05, slab_phases=2)


@jax.jit
def any_slab(busy, o, d, ou):
    return wf._pool_any(arrays, c3, busy, o, d,
                        jnp.full(o.shape[:1], 2.0, jnp.float32), ou)


bench("pool any single-window (ref)",
      lambda: any_plain(busy, ray_o, ray_d, ou))
bench("pool any slab f=0.05",
      lambda: any_slab(busy, ray_o, ray_d, ou))
print("done", flush=True)

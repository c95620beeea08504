"""Round-3 perf diagnostic: where does the closest-hit pass spend time?

Reports at a given sphere_grid scale (default 12 -> 212k tris):
  - phase A/B item counts (super items per block)
  - swept clusters per block (the in-kernel counter, row 7)
  - measured times: phases-only vs full closest vs full any
  - implied per-item and per-sweep costs
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from directcomputeraytracing_tpu.accel import worklist as wl
from directcomputeraytracing_tpu.integrator.common import RenderConfig
from directcomputeraytracing_tpu.scene.presets import sphere_grid
from directcomputeraytracing_tpu.scene.scene import flatten_scene
from experiments.check_worklist import rays_for


def bench(fn, *args, reps=5):
    out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    scene, cam = sphere_grid(n, n)
    arrays, meta = flatten_scene(scene)
    cfg = RenderConfig(width=1024, height=1024, max_bounce=1,
                       stack_size=meta.stack_size,
                       light_count=meta.light_count)
    o, d = rays_for(cam, cfg)
    o, d = jax.block_until_ready((o, d))
    r = o.shape[0]
    nb = r // wl.RB
    print(f"tris={arrays.world_tris.shape[0]} rays={r} nb={nb} "
          f"RB={wl.RB} SUPER={wl.SUPER} PAIR={wl.PAIR}")

    od, tm, _ = jax.jit(lambda o, d: wl._prep_rays_wl(o, d))(o, d)

    # phase A/B only
    ph = jax.jit(lambda od, tm: wl._phases(arrays, od, tm, False))
    out = ph(od, tm)
    bf = np.asarray(out[2])
    valid = (bf & 1) == 1
    per_blk = np.bincount((bf[valid] >> wl._BLOCK_SHIFT), minlength=nb)
    print(f"super items={valid.sum()} cap={bf.shape[0]} "
          f"per-block mean={per_blk.mean():.1f} p50={np.median(per_blk):.0f} "
          f"p95={np.percentile(per_blk, 95):.0f} max={per_blk.max()}")
    t_ph = bench(ph, od, tm)
    print(f"phases-only: {t_ph*1e3:.2f} ms")

    # full closest + counter stats
    close = jax.jit(lambda o, d: wl.worklist_closest_pallas(arrays, o, d))
    out_c = close(o, d)
    iters = np.asarray(out_c[6])[: r: wl.RB]   # one value per block
    print(f"swept clusters/block: mean={iters.mean():.1f} "
          f"p50={np.median(iters):.0f} p95={np.percentile(iters, 95):.0f} "
          f"max={iters.max():.0f} total={iters.sum():.0f}")
    t_c = bench(close, o, d)
    print(f"closest: {t_c*1e3:.2f} ms -> {r/t_c/1e6:.1f} Mrays/s "
          f"(sweep-part ~{(t_c-t_ph)*1e3:.2f} ms)")
    n_items = valid.sum()
    n_sweeps = iters.sum() / max(wl.PAIR, 1)
    print(f"implied: {(t_c-t_ph)*1e9/max(n_items,1):.0f} ns/item "
          f"(incl. sweeps), {(t_c-t_ph)*1e9/max(n_sweeps,1):.0f} "
          f"ns/sweep-iter upper bound ({n_sweeps:.0f} iters)")

    anyf = jax.jit(lambda o, d: wl.worklist_any_pallas(
        arrays, o, d, jnp.float32(5.0)))
    t_a = bench(anyf, o, d)
    print(f"any: {t_a*1e3:.2f} ms -> {r/t_a/1e6:.1f} Mrays/s")
    print(f"combined: {2*r/(t_c+t_a)/1e6:.1f} Mrays/s")


main()

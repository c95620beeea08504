"""Break down worklist phase A/B cost at 212k tris, K-amortized.

Times each sub-phase cumulatively (prep -> cull -> compact -> refine ->
expand -> finish) by building jitted prefixes of the pipeline, so the
deltas attribute cost to individual phases without separate dispatch
overhead per stage.
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

K = 4


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

    ctab, cbox3, sboxv, cpad, cs, hyper = wl._pad_tables(arrays)
    assert hyper is not None
    hsup, hboxv, nh, hs = hyper
    cap_h = int(min(max(nb * 8, 1024), wl.MAX_HYPER, nb * nh))
    cap_s = wl._capacity(nb, cs)
    print(f"tris={arrays.world_tris.shape[0]} cs={cs} nh={nh} hs={hs} "
          f"cap_h={cap_h} cap_s={cap_s} nb={nb}")

    def amort(body):
        def run(o, d):
            def it(i, acc):
                out = body(o + 1e-6 * i, d)
                leaves = jax.tree_util.tree_leaves(out)
                return acc + sum(jnp.sum(x.astype(jnp.float32))
                                 for x in leaves)
            return jax.lax.fori_loop(0, K, it, jnp.float32(0))
        return jax.jit(run)

    def p_prep(o, d):
        od, tm, _ = wl._prep_rays_wl(o, d)
        return od, tm

    def p_cull(o, d):
        od, tm = p_prep(o, d)
        return wl._cull_super(hboxv, od, tm)

    def p_compact(o, d):
        od, tm = p_prep(o, d)
        tlo_h = wl._cull_super(hboxv, od, tm)
        return wl._compact_pairs(tlo_h, nh, cap_h)[:4]

    def p_refine(o, d):
        od, tm = p_prep(o, d)
        tlo_h = wl._cull_super(hboxv, od, tm)
        bfh, hyp, _th, total_h, _ = wl._compact_pairs(tlo_h, nh, cap_h)
        return wl._refine_items(hsup, hs, bfh, hyp, od, tm, cap_h,
                                False)

    def p_expand(o, d):
        od, tm = p_prep(o, d)
        tlo_h = wl._cull_super(hboxv, od, tm)
        bfh, hyp, _th, total_h, _ = wl._compact_pairs(tlo_h, nh, cap_h)
        tlo_s = wl._refine_items(hsup, hs, bfh, hyp, od, tm, cap_h,
                                 False)
        return wl._expand_level(tlo_s, bfh, hyp, hs, cs, nb, cap_s)

    def p_finish(o, d):
        bf_s, sup, t_s, total_s = p_expand.__wrapped__(o, d) \
            if hasattr(p_expand, "__wrapped__") else p_expand(o, d)
        return wl._finish_items(bf_s >> wl._BLOCK_SHIFT, sup, t_s,
                                total_s, cap_s)

    def p_phases(o, d):
        od, tm, _ = wl._prep_rays_wl(o, d)
        return wl._phases(arrays, od, tm, False)[2:5]

    stages = [("prep", p_prep), ("cull", p_cull), ("compact", p_compact),
              ("refine", p_refine), ("expand", p_expand),
              ("finish", p_finish), ("all-phases", p_phases)]
    prev = 0.0
    for name, fn in stages:
        t = bench(amort(fn), o, d) / K
        print(f"{name:>10}: {t*1e3:7.2f} ms/pass  (+{(t-prev)*1e3:6.2f})")
        prev = t

    close = jax.jit(lambda o, d: wl.worklist_closest_pallas(arrays, o, d))
    t_c = bench(amort(lambda o, d: close(o, d)[0]), o, d) / K
    print(f"{'closest':>10}: {t_c*1e3:7.2f} ms/pass -> "
          f"{r/t_c/1e6:.1f} Mrays/s")
    anyf = jax.jit(lambda o, d: wl.worklist_any_pallas(
        arrays, o, d, jnp.float32(5.0)))
    t_a = bench(amort(lambda o, d: anyf(o, d)), o, d) / K
    print(f"{'any':>10}: {t_a*1e3:7.2f} ms/pass -> "
          f"{r/t_a/1e6:.1f} Mrays/s")
    print(f"combined: {2*r/(t_c+t_a)/1e6:.1f} Mrays/s")


main()

"""Bisect the round-3 phase/sweep regression on hardware."""
import time
import jax, jax.numpy as jnp
import numpy as np
from directcomputeraytracing_tpu.accel import worklist as wl
from directcomputeraytracing_tpu.integrator.common import RenderConfig
from directcomputeraytracing_tpu.scene.presets import sphere_grid
from directcomputeraytracing_tpu.scene.scene import flatten_scene
from experiments.check_worklist import rays_for

F32 = jnp.float32

def timeit(fn, *args, reps=6):
    red = jax.jit(lambda o: jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(x.astype(jnp.float32)), o, 0.0))
    out = fn(*args); float(red(out))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); out = fn(*args); float(red(out))
        best = min(best, time.perf_counter() - t0)
    return best

def main():
    scene, cam = sphere_grid(12, 12)
    arrays, meta = flatten_scene(scene)
    cfg = RenderConfig(width=1024, height=1024, max_bounce=1,
                       stack_size=meta.stack_size,
                       light_count=meta.light_count)
    odpair = rays_for(cam, cfg)
    od, odt, _, r = wl._prep_rays_wl(*odpair)
    od, odt = jax.block_until_ready((od, odt))

    # A: dense hyper cull alone
    ctab, cbox3, sboxv, cpad, cs, hyper = wl._pad_tables(arrays)
    hsup, hboxv, nh, hs = hyper
    t = timeit(jax.jit(lambda odt: wl._cull_super(hboxv, odt, False)), odt)
    print(f"hyper cull: {t*1e3:.2f} ms")
    nb = od.shape[1] // wl.RB
    cap_h = int(min(max(nb * 8, 1024), wl.MAX_HYPER, nb * nh))
    tm_row = odt[:, 6][None, :]
    tlo_h = jax.block_until_ready(wl._cull_super(hboxv, odt, False))
    t = timeit(jax.jit(lambda tlo_h: wl._compact_pairs(tlo_h, nh, cap_h)), tlo_h)
    print(f"compact_pairs: {t*1e3:.2f} ms")
    bfh, hyp, _th, total_h, _ = jax.block_until_ready(
        wl._compact_pairs(tlo_h, nh, cap_h))
    t = timeit(jax.jit(lambda bfh, hyp, od, tm_row: wl._refine_items(
        hsup, hs, bfh, hyp, od, tm_row, cap_h, False)), bfh, hyp, od, tm_row)
    print(f"refine_items: {t*1e3:.2f} ms")
    tlo_s = jax.block_until_ready(wl._refine_items(
        hsup, hs, bfh, hyp, od, tm_row, cap_h, False))
    cap_s = wl._capacity(nb, cs)
    t = timeit(jax.jit(lambda tlo_s, bfh, hyp: wl._expand_level(
        tlo_s, bfh, hyp, hs, cs, nb, cap_s)), tlo_s, bfh, hyp)
    print(f"expand_level: {t*1e3:.2f} ms")
    bf_s, sup, t_s, total_s = jax.block_until_ready(
        wl._expand_level(tlo_s, bfh, hyp, hs, cs, nb, cap_s))

    t = timeit(jax.jit(lambda bf_s: jnp.zeros((nb,), jnp.bool_).at[
        jnp.clip(bf_s >> wl._BLOCK_SHIFT, 0, nb - 1)].max(
        (bf_s & 1) == 1, mode="drop")), bf_s)
    print(f"block_any scatter: {t*1e3:.2f} ms")
    t = timeit(jax.jit(lambda bf_s, sup, t_s: wl._finish_items(
        bf_s >> wl._BLOCK_SHIFT, sup, t_s, total_s, cap_s)), bf_s, sup, t_s)
    print(f"finish_items (sort): {t*1e3:.2f} ms")
    t = timeit(jax.jit(lambda od, odt: wl._phases(arrays, od, odt, False)),
               od, odt)
    print(f"full phases: {t*1e3:.2f} ms")

if __name__ == "__main__":
    main()

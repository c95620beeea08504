"""Marginal on-device cost per phase of the fused worklist traversal."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from directcomputeraytracing_tpu.accel import worklist as wl
from directcomputeraytracing_tpu.integrator.common import RenderConfig
from directcomputeraytracing_tpu.scene.presets import sphere_grid
from directcomputeraytracing_tpu.scene.scene import flatten_scene
from experiments.check_worklist import rays_for


def timeit(fn, *args, reps=6):
    red = jax.jit(lambda o: jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(x.astype(jnp.float32)), o, 0.0))
    out = fn(*args)
    float(red(out))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(red(out))
        best = min(best, time.perf_counter() - t0)
    return out, best


def marginal(make_fn, *args, reps=6):
    f1, f2 = make_fn(1), make_fn(2)
    _, t1 = timeit(f1, *args, reps=reps)
    _, t2 = timeit(f2, *args, reps=reps)
    return t2 - t1, t1


def main():
    import sys
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    scene, cam = sphere_grid(n, n)
    arrays, meta = flatten_scene(scene)
    cfg = RenderConfig(width=1024, height=1024, max_bounce=1,
                       stack_size=meta.stack_size,
                       light_count=meta.light_count)
    odpair = rays_for(cam, cfg)
    od, odt, _, r = wl._prep_rays_wl(*odpair)
    od, odt = jax.block_until_ready((od, odt))
    nb = od.shape[1] // wl.RB
    ctab, cbox3, sboxv, cpad, cs, _hyper = wl._pad_tables(arrays)
    cap_s = wl._capacity(nb, cs)
    print(f"tris={arrays.world_tris.shape[0]} blocks={nb} "
          f"clusters={cpad} supers={cs} cap_s={cap_s}")

    def mk_cull(k):
        @jax.jit
        def f(odt):
            acc = 0.0
            for j in range(k):
                acc = acc + wl._cull_super(sboxv, odt + 1e-7 * j)
            return acc
        return f

    dm, _ = marginal(mk_cull, odt)
    print(f"A coarse cull: {dm*1e3:.2f} ms")

    tlo_s = jax.block_until_ready(
        jax.jit(lambda odt: wl._cull_super(sboxv, odt))(odt))

    def mk_cc(k):
        @jax.jit
        def f(t):
            acc = 0
            for j in range(k):
                acc = acc + wl._compact_coarse(t + j, cs, cap_s)[0]
            return acc
        return f

    dm, _ = marginal(mk_cc, tlo_s)
    print(f"B coarse compact: {dm*1e3:.2f} ms")

    bf, sup, t_ent, total_s, block_any = jax.jit(
        lambda t: wl._compact_coarse(t, cs, cap_s))(tlo_s)
    total = int(total_s)
    blocks = (np.asarray(bf)[:total] >> 2) & 0x3FFF
    per = np.bincount(blocks, minlength=nb)
    print(f"  coarse items: {total} ({per.mean():.1f}/block, "
          f"max {per.max()})")

    def mk_full(k):
        @jax.jit
        def f(po, pd):
            acc = 0.0
            for j in range(k):
                acc = acc + wl.worklist_closest_pallas(
                    arrays, po + 1e-7 * j, pd)[0]
            return acc
        return f

    dm, t1 = marginal(mk_full, *odpair)
    print(f"FULL closest: marginal={dm*1e3:.2f} ms (1x {t1*1e3:.1f}) -> "
          f"{r/dm/1e6:.1f} Mrays/s device, "
          f"{dm/max(total,1)*1e9:.0f} ns/item upper bound")

    def mk_any(k):
        @jax.jit
        def f(po, pd):
            acc = 0.0
            for j in range(k):
                acc = acc + wl.worklist_any_pallas(
                    arrays, po + 1e-7 * j, pd, jnp.inf).astype(
                    jnp.float32)
            return acc
        return f

    dm, t1 = marginal(mk_any, *odpair)
    print(f"FULL any: marginal={dm*1e3:.2f} ms -> "
          f"{r/dm/1e6:.1f} Mrays/s device")


if __name__ == "__main__":
    main()

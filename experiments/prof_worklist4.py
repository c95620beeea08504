"""Marginal on-device cost per phase of the hierarchical worklist."""

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
    od, r = wl._prep_rays_wl(*odpair)
    od = jax.block_until_ready(od)
    nb = od.shape[1] // wl.RB
    ctab, cbox, sbox_vec, cpad, cs = wl._pad_tables(arrays)
    cap_s, cap = wl._capacities(nb, cs, cpad)
    print(f"tris={arrays.world_tris.shape[0]} blocks={nb} "
          f"clusters={cpad} supers={cs} cap_s={cap_s} cap={cap}")
    tcap = jnp.full((nb,), wl.BIG, jnp.float32)

    def mk_cull(k):
        @jax.jit
        def f(od):
            acc = 0.0
            for j in range(k):
                acc = acc + wl._cull_tlo(sbox_vec, od + 1e-7 * j,
                                         tcap[:, None])
            return acc
        return f

    dm, _ = marginal(mk_cull, od)
    print(f"A coarse cull: {dm*1e3:.2f} ms")

    tlo_s = jax.block_until_ready(
        jax.jit(lambda od: wl._cull_tlo(sbox_vec, od, tcap[:, None]))(od))

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

    blk, sup, valid_s, total_s, _ = jax.jit(
        lambda t: wl._compact_coarse(t, cs, cap_s))(tlo_s)
    print(f"  coarse items: {int(total_s)}")
    bnds = jax.jit(wl._bundle_bounds)(od)

    def mk_fc(k):
        @jax.jit
        def f(blk, sup):
            acc = 0
            for j in range(k):
                out = wl._fine_and_chunk(cbox, blk + j * 0, sup, valid_s,
                                         bnds + 1e-7 * j, tcap, cpad,
                                         cap, cpad)
                acc = acc + out[0] + out[1][:cap] + out[2]
            return acc
        return f

    dm, _ = marginal(mk_fc, blk, sup)
    print(f"C+D fine cull+chunk: {dm*1e3:.2f} ms")

    out = jax.jit(lambda blk, sup: wl._fine_and_chunk(
        cbox, blk, sup, valid_s, bnds, tcap, cpad, cap, cpad))(blk, sup)
    total = int(out[3])
    bfh = np.asarray(out[0])[:total]
    blocks = (bfh >> 2) & 0x3FFF
    per = np.bincount(blocks, minlength=nb)
    print(f"  chunks: {total} ({per.mean():.1f}/block, "
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
    print(f"FULL: marginal={dm*1e3:.2f} ms (1x {t1*1e3:.1f}) -> "
          f"{r/dm/1e6:.1f} Mrays/s device  "
          f"sweep≈{dm*1e3:.1f}ms-total-above, "
          f"{dm/max(total,1)*1e9:.0f} ns/chunk upper bound")


if __name__ == "__main__":
    main()

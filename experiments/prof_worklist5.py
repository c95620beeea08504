"""Dissect the fused sweep kernel: where do the 3.6us/item go?

Variants of the closest kernel with pieces disabled, each timed
marginally on the same coarse work list:
  full     - the real kernel
  noop     - body guarded off entirely (grid + DMA + prefetch overhead)
  cullonly - fine cull + entered-reduce, no sweep loop
  sweep1   - fine cull + exactly one sweep iteration
Also times phase B's lax.sort alone vs the scatter-compact alone.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from directcomputeraytracing_tpu.accel import worklist as wl
from directcomputeraytracing_tpu.integrator.common import RenderConfig
from directcomputeraytracing_tpu.scene.presets import sphere_grid
from directcomputeraytracing_tpu.scene.scene import flatten_scene
from experiments.check_worklist import rays_for

F32 = jnp.float32
I32 = jnp.int32
SUPER = wl.SUPER
CLUSTER_SIZE = wl.CLUSTER_SIZE
RB = wl.RB


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


def make_variant_kernel(mode):
    def kern(bf_ref, sup_ref, tent_ref, cbox_ref, slab_ref, od_ref,
             texp_ref, tmin_ref, out_ref, mask_scr):
        i = pl.program_id(0)
        item = bf_ref[i]
        first = (item & 2) != 0
        live = first | (jnp.max(out_ref[0:1, :]) > tent_ref[i])
        enabled = ((item & 1) == 1) & live
        if mode == "noop":
            enabled = enabled & (tent_ref[i] < -1.0)   # never

        @pl.when(enabled)
        def _():
            ox, oy, oz = od_ref[0:1, :], od_ref[1:2, :], od_ref[2:3, :]
            dx, dy, dz = od_ref[3:4, :], od_ref[4:5, :], od_ref[5:6, :]
            t_min = tmin_ref[0, 0]
            rb = od_ref.shape[1]
            rows = jax.lax.broadcasted_iota(I32, (CLUSTER_SIZE, rb), 0)

            @pl.when(first)
            def _():
                out_ref[0:1, :] = texp_ref[0:1, :]
                out_ref[1:2, :] = jnp.zeros((1, rb), F32)

            enter = wl._fine_enter(cbox_ref, od_ref, out_ref[0:1, :])
            ent, n = wl._entered(enter)
            iota = wl._iota64()
            mask_scr[:, :] = jnp.where(ent, 1.0, 0.0)
            if mode == "cullonly":
                out_ref[1:2, :] = out_ref[1:2, :] + jnp.sum(
                    mask_scr[:, :])
                return
            if mode == "sweep1":
                n = jnp.minimum(n, 1)

            def body(r):
                mask = mask_scr[:, :] > 0.5
                c_r = jnp.min(jnp.where(mask, iota, SUPER))
                mask_scr[:, :] = jnp.where(iota == c_r, 0.0,
                                           mask_scr[:, :])
                tab = slab_ref[pl.ds(c_r * CLUSTER_SIZE, CLUSTER_SIZE), :]
                t_b = out_ref[0:1, :]
                t, ok = wl._moeller_rows(tab, ox, oy, oz, dx, dy, dz,
                                         t_min, t_b)
                tm = jnp.where(ok, t, wl.BIG)
                slab_min = jnp.min(tm, axis=0, keepdims=True)
                better = slab_min < t_b
                jmin = jnp.min(jnp.where(tm == slab_min, rows, 1 << 30),
                               axis=0, keepdims=True)
                jm = rows == jmin
                soup = tab[:, wl._SOUP_COL:wl._SOUP_COL + 1]
                picked = jnp.sum(
                    jnp.where(jm, jnp.broadcast_to(soup, tm.shape), 0.0),
                    axis=0, keepdims=True)
                out_ref[0:1, :] = jnp.where(better, slab_min, t_b)
                out_ref[1:2, :] = jnp.where(better, picked,
                                            out_ref[1:2, :])
                return r + 1

            jax.lax.while_loop(lambda r: r < n, body, jnp.int32(0))

    return kern


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    scene, cam = sphere_grid(n, n)
    arrays, meta = flatten_scene(scene)
    cfg = RenderConfig(width=1024, height=1024, max_bounce=1,
                       stack_size=meta.stack_size,
                       light_count=meta.light_count)
    odpair = rays_for(cam, cfg)
    od, odt, _, r = wl._prep_rays_wl(*odpair)
    od, odt = jax.block_until_ready((od, odt))
    rp = od.shape[1]
    nb = rp // RB
    ctab, cbox3, sboxv, cpad, cs = wl._pad_tables(arrays)
    cap_s = wl._capacity(nb, cs)
    print(f"tris={arrays.world_tris.shape[0]} blocks={nb} supers={cs} "
          f"cap_s={cap_s}")

    tlo_s = jax.block_until_ready(
        jax.jit(lambda odt: wl._cull_super(sboxv, odt))(odt))

    # --- phase B dissection -------------------------------------------
    def mk_sort(k):
        @jax.jit
        def f(t):
            acc = 0.0
            g = t[:, :cs]
            sup_iota = jax.lax.broadcasted_iota(I32, g.shape, 1)
            for j in range(k):
                gs, ss = jax.lax.sort((g + j, sup_iota), dimension=1,
                                      num_keys=1)
                acc = acc + gs.sum() + ss.sum()
            return acc
        return f

    dm, _ = marginal(mk_sort, tlo_s)
    print(f"B.sort alone: {dm*1e3:.2f} ms")

    def mk_rest(k):
        g = tlo_s[:, :cs]
        sup_iota = jax.lax.broadcasted_iota(I32, g.shape, 1)
        g_sorted, sup_sorted = jax.lax.sort((g, sup_iota), dimension=1,
                                            num_keys=1)

        @jax.jit
        def f(gs, ss):
            acc = 0
            for j in range(k):
                gm = (gs + j) < wl.BIG
                flat = gm.ravel()
                cum = jnp.cumsum(flat, dtype=I32)
                total = cum[-1]
                pos = jnp.where(flat, cum - 1, cap_s)
                blk_iota = jax.lax.broadcasted_iota(I32, gs.shape, 0)
                blk = jnp.full((cap_s,), nb - 1, I32).at[pos].set(
                    blk_iota.ravel(), mode="drop")
                acc = acc + blk.sum() + total
            return acc
        return f, (g_sorted, sup_sorted)

    f1, args_b = mk_rest(1)
    def mk_rest_k(k):
        return mk_rest(k)[0]
    dm, _ = marginal(mk_rest_k, *args_b)
    print(f"B.compact alone: {dm*1e3:.2f} ms")

    # --- phase C variants ---------------------------------------------
    bf, sup, t_ent, total_s, block_any = jax.jit(
        lambda t: wl._compact_coarse(t, cs, cap_s))(tlo_s)
    bf, sup, t_ent = jax.block_until_ready((bf, sup, t_ent))
    total = int(total_s)
    print(f"coarse items: {total} ({total/nb:.1f}/block)")
    texp = jax.block_until_ready(jax.jit(
        lambda od: wl._scene_exit(arrays, od))(od))
    tmin_arr = jnp.zeros((1, 1), F32)

    for mode in ("noop", "cullonly", "sweep1", "full"):
        kern = make_variant_kernel(mode)

        def run_one(bf, sup, t_ent, od, texp, j):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(cap_s,),
                in_specs=wl._sweep_specs([
                    pl.BlockSpec(
                        (1, RB),
                        lambda i, bf, su, te: (0, wl._block_idx(bf, i)),
                        memory_space=pltpu.VMEM),
                ]),
                out_specs=pl.BlockSpec(
                    (2, RB),
                    lambda i, bf, su, te: (0, wl._block_idx(bf, i)),
                    memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((SUPER, 1), F32)],
            )
            return pl.pallas_call(
                kern, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((2, rp), F32),
            )(bf, sup, t_ent, cbox3, ctab, od + 1e-9 * j, texp, tmin_arr)

        def mk(k):
            @jax.jit
            def f(bf, sup, t_ent, od, texp):
                acc = 0.0
                for j in range(k):
                    acc = acc + run_one(bf, sup, t_ent, od, texp, j)
                return acc
            return f

        dm, t1 = marginal(mk, bf, sup, t_ent, od, texp)
        print(f"C.{mode:8s}: marginal={dm*1e3:6.2f} ms "
              f"({dm/max(total,1)*1e9:5.0f} ns/item) 1x={t1*1e3:.1f}")


if __name__ == "__main__":
    main()

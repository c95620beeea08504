"""Amortized closest/any throughput at the current DCRT_WL_PAIR
setting (K casts chained per dispatch so the ~30ms tunnel floor
divides out)."""
import os
import time
import jax, jax.numpy as jnp
from directcomputeraytracing_tpu.accel import worklist as wl
from directcomputeraytracing_tpu.integrator.common import RenderConfig
from directcomputeraytracing_tpu.scene.presets import sphere_grid
from directcomputeraytracing_tpu.scene.scene import flatten_scene
from experiments.check_worklist import rays_for

F32 = jnp.float32
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
    print("PAIR =", wl.PAIR, " SUPER =", wl.SUPER, " RB =", wl.RB)
    scene, cam = sphere_grid(12, 12)
    arrays, meta = flatten_scene(scene)
    cfg = RenderConfig(width=1024, height=1024, max_bounce=1,
                       stack_size=meta.stack_size,
                       light_count=meta.light_count)
    o, d = rays_for(cam, cfg)
    o, d = jax.block_until_ready((o, d))
    n = o.shape[0]

    def closest_k(o, d):
        def body(i, acc):
            t, u, v, tri, inst, back, iters = wl.worklist_closest_pallas(
                arrays, o + 1e-6 * i, d)
            return acc + jnp.sum(t) + jnp.sum(u)
        return jax.lax.fori_loop(0, K, body, F32(0.0))

    def any_k(o, d):
        def body(i, acc):
            occ = wl.worklist_any_pallas(arrays, o + 1e-6 * i, d,
                                         jnp.float32(5.0))
            return acc + jnp.sum(occ.astype(F32))
        return jax.lax.fori_loop(0, K, body, F32(0.0))

    tc = bench(jax.jit(closest_k), o, d)
    print(f"closest: {tc/K*1e3:.2f} ms/pass -> {n*K/tc/1e6:.1f} Mrays/s")
    ta = bench(jax.jit(any_k), o, d)
    print(f"any:     {ta/K*1e3:.2f} ms/pass -> {n*K/ta/1e6:.1f} Mrays/s")
    comb = 2 * n * K / (tc + ta) / 1e6
    print(f"combined: {comb:.1f} Mrays/s")


if __name__ == "__main__":
    main()

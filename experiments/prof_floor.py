"""Measure the tunnel dispatch+readback floor, then re-measure the
worklist phases amortized (K reps chained in ONE dispatch) so fixed
latency divides out."""
import time
import jax, jax.numpy as jnp
from directcomputeraytracing_tpu.accel import worklist as wl
from directcomputeraytracing_tpu.integrator.common import RenderConfig
from directcomputeraytracing_tpu.scene.presets import sphere_grid
from directcomputeraytracing_tpu.scene.scene import flatten_scene
from experiments.check_worklist import rays_for

F32 = jnp.float32


def bench(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    # --- floor: trivial readback
    x = jnp.ones((8, 128))
    f = jax.jit(lambda x: jnp.sum(x))
    t = bench(f, x)
    print(f"floor (tiny sum readback): {t*1e3:.2f} ms")

    scene, cam = sphere_grid(12, 12)
    arrays, meta = flatten_scene(scene)
    cfg = RenderConfig(width=1024, height=1024, max_bounce=1,
                       stack_size=meta.stack_size,
                       light_count=meta.light_count)
    odpair = rays_for(cam, cfg)
    od, odt, _, r = wl._prep_rays_wl(*odpair)
    od, odt = jax.block_until_ready((od, odt))

    # --- amortized: K phase passes chained in one dispatch
    K = 8

    def phases_k(od, odt):
        def body(i, acc):
            ctab, cbox3, bf, sup, t_ent, fits, ba, cap = wl._phases(
                arrays, od, odt, False)
            return acc + jnp.sum(t_ent) + jnp.sum(sup) + jnp.sum(
                ba.astype(F32)) + jnp.sum(bf) * (i + 1)
        return jax.lax.fori_loop(0, K, body, F32(0.0))

    t1 = bench(jax.jit(lambda od, odt: wl._phases(arrays, od, odt,
                                                  False)), od, odt)
    tk = bench(jax.jit(phases_k), od, odt)
    print(f"phases single: {t1*1e3:.2f} ms; K={K} chained: "
          f"{tk*1e3:.2f} ms -> {tk/K*1e3:.2f} ms/pass")

    # --- amortized full closest
    def closest_k(o, d):
        def body(i, acc):
            t, u, v, tri, inst, back, iters = wl.worklist_closest_pallas(
                arrays, o + 1e-6 * i, d)
            return acc + jnp.sum(t) + jnp.sum(u)
        return jax.lax.fori_loop(0, 4, body, F32(0.0))

    o, d = odpair
    t4 = bench(jax.jit(closest_k), o, d)
    n = o.shape[0]
    print(f"closest x4 chained: {t4*1e3:.2f} ms -> "
          f"{n*4/t4/1e6:.1f} Mrays/s amortized")


if __name__ == "__main__":
    main()

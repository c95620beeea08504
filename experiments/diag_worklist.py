"""Diagnose worklist mismatches + branch selection."""

import jax
import jax.numpy as jnp
import numpy as np

from directcomputeraytracing_tpu.accel import worklist as wl
from directcomputeraytracing_tpu.accel.traverse import intersect_closest
from directcomputeraytracing_tpu.integrator.common import RenderConfig
from directcomputeraytracing_tpu.scene.presets import sphere_grid
from directcomputeraytracing_tpu.scene.scene import flatten_scene
from experiments.check_worklist import rays_for


def main():
    scene, cam = sphere_grid(5, 5)
    arrays, meta = flatten_scene(scene)
    cfg = RenderConfig(width=1024, height=1024, max_bounce=1,
                       stack_size=meta.stack_size,
                       light_count=meta.light_count)
    od = rays_for(cam, cfg)
    o, d, r = wl._prep_rays_wl(*od)
    nb = o.shape[1] // wl.RB

    ctab, items, t_ent, total, block_any, capacity = jax.jit(
        lambda o, d: wl._phases(arrays, o, d, False))(o, d)
    total = int(total)
    print(f"blocks={nb} capacity={capacity} total={total} "
          f"fallback={total > capacity}")
    it = np.asarray(items)[:min(total, capacity)]
    blocks = (it >> wl._BLOCK_SHIFT) & wl._BLOCK_MASK
    per = np.bincount(blocks, minlength=nb)
    print(f"items/block mean={per.mean():.2f} p50={np.percentile(per,50):.0f}"
          f" p90={np.percentile(per,90):.0f} max={per.max()}")

    # subsample rays; compare worklist / cluster / jax / brute
    sub = np.arange(0, r, 97)
    os_, ds_ = od[0][sub], od[1][sub]
    res = {}
    for backend in ("pallas_wl", "pallas_cluster", "jax", "brute"):
        h = jax.jit(lambda o, d, b=backend: intersect_closest(
            arrays, o, d, meta.stack_size, backend=b))(os_, ds_)
        res[backend] = (np.asarray(h.t), np.asarray(h.triangle))
    tb, trib = res["brute"]
    for backend in ("pallas_wl", "pallas_cluster", "jax"):
        t, tri = res[backend]
        both = np.isfinite(t) & np.isfinite(tb)
        agree_hit = np.mean(np.isfinite(t) == np.isfinite(tb))
        rel = np.abs(t[both] - tb[both]) / np.maximum(tb[both], 1e-6)
        n_bad = int((rel > 1e-3).sum())
        print(f"{backend:15s} vs brute: hit={agree_hit:.6f} "
              f"bad_t={n_bad}/{both.sum()} maxrel={rel.max():.3g} "
              f"tri={np.mean(tri[both] == trib[both]):.6f}")
    # inspect a few worst rays for worklist
    t, tri = res["pallas_wl"]
    both = np.isfinite(t) & np.isfinite(tb)
    rel = np.where(both, np.abs(t - tb) / np.maximum(tb, 1e-6), 0)
    worst = np.argsort(rel)[-5:]
    for w in worst:
        print(f"  ray {sub[w]}: wl t={t[w]:.4f} tri={tri[w]} | "
              f"brute t={tb[w]:.4f} tri={trib[w]} | "
              f"jax t={res['jax'][0][w]:.4f} tri={res['jax'][1][w]}")


if __name__ == "__main__":
    main()

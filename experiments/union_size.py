"""How many clusters does a ray bundle enter, vs bundle size?

Exact per-ray cluster entry counts vs the bundle-union counts the
bundle-synchronous sweep actually tests, for camera rays over the
sphere-grid scenes. Decides the RB (rays/bundle) sweet spot.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from directcomputeraytracing_tpu.integrator.common import RenderConfig
from directcomputeraytracing_tpu.scene.presets import sphere_grid
from directcomputeraytracing_tpu.scene.scene import flatten_scene
from experiments.check_worklist import rays_for


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    scene, cam = sphere_grid(n, n)
    arrays, meta = flatten_scene(scene)
    cfg = RenderConfig(width=1024, height=1024, max_bounce=1,
                       stack_size=meta.stack_size,
                       light_count=meta.light_count)
    o, d = rays_for(cam, cfg)
    r = o.shape[0]
    cbox = np.asarray(arrays.cluster_bbox)
    c = cbox.shape[0]
    print(f"tris={arrays.world_tris.shape[0]} clusters={c} rays={r}")

    @jax.jit
    def enters(o, d):
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-30,
                              jnp.where(d >= 0, 1e-30, -1e-30), d)
        t_lo = jnp.full((o.shape[0], c), -3e38)
        t_hi = jnp.full((o.shape[0], c), 3e38)
        for ax in range(3):
            a = (cbox[None, :, ax] - o[:, ax, None]) * inv[:, ax, None]
            b = (cbox[None, :, ax + 3] - o[:, ax, None]) * inv[:, ax, None]
            t_lo = jnp.maximum(t_lo, jnp.minimum(a, b))
            t_hi = jnp.minimum(t_hi, jnp.maximum(a, b))
        return (t_hi >= t_lo) & (t_hi >= 0.0)

    # sample every 4th 64-block chunk, spread across the whole image
    chunk = 65536
    per_ray_all = []
    unions = {rb: [] for rb in (128, 256, 512, 1024)}
    for s in range(0, r - chunk + 1, chunk * 4):
        e = np.asarray(enters(jnp.asarray(o[s:s + chunk]),
                              jnp.asarray(d[s:s + chunk])))
        per_ray_all.append(e.sum(axis=1))
        for rb in unions:
            nb = chunk // rb
            unions[rb].append(e.reshape(nb, rb, c).any(axis=1).sum(axis=1))
    per_ray = np.concatenate(per_ray_all)
    print(f"per-ray entered clusters: mean={per_ray.mean():.1f} "
          f"p50={np.percentile(per_ray, 50):.0f} "
          f"p99={np.percentile(per_ray, 99):.0f} max={per_ray.max()}")
    for rb, us in unions.items():
        u = np.concatenate(us)
        print(f"RB={rb:5d}: union mean={u.mean():7.1f} clusters "
              f"({u.mean() * 16 / max(rb, 1):7.1f} tris/ray amortized, "
              f"{u.mean() * 16:7.0f} tris tested/ray) "
              f"p99={np.percentile(u, 99):.0f} max={u.max()}")


if __name__ == "__main__":
    main()

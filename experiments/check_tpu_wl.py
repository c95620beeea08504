"""On-hardware cross-check: worklist vs brute at a given scene size."""
import sys
import numpy as np, jax, jax.numpy as jnp
from directcomputeraytracing_tpu.scene.presets import sphere_grid
from directcomputeraytracing_tpu.scene.scene import flatten_scene
from directcomputeraytracing_tpu.accel.traverse import intersect_closest, intersect_any

n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
scene, cam = sphere_grid(n, n)
arrays, meta = flatten_scene(scene)
print("tris", arrays.world_tris.shape[0])
rng = np.random.default_rng(0)
o = rng.uniform(-6, 6, (4096, 3)).astype(np.float32); o[:, 1] = rng.uniform(0.5, 8, 4096)
d = rng.normal(size=(4096, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
o = jnp.asarray(o); d = jnp.asarray(d)
a = intersect_closest(arrays, o, d, meta.stack_size, backend="brute")
b = intersect_closest(arrays, o, d, meta.stack_size, backend="pallas_wl")
ha, hb = np.asarray(a.hit), np.asarray(b.hit)
print("closest: hits brute", ha.sum(), "wl", hb.sum(), "mismatch", (ha != hb).sum())
m = ha & hb
print("  t maxrel", float(np.max(np.abs(np.asarray(a.t)[m] - np.asarray(b.t)[m])
                                 / np.maximum(np.asarray(a.t)[m], 1e-6))))
print("  tri mismatch", int((np.asarray(a.triangle)[m] != np.asarray(b.triangle)[m]).sum()))
oa = intersect_any(arrays, o, d, 4.0, meta.stack_size, backend="brute")
ob = intersect_any(arrays, o, d, 4.0, meta.stack_size, backend="pallas_wl")
print("any: occ brute", int(np.asarray(oa).sum()), "wl", int(np.asarray(ob).sum()),
      "mismatch", int((np.asarray(oa) != np.asarray(ob)).sum()))

"""Interpret-mode worklist-vs-stack agreement at the current
DCRT_WL_PAIR (debug harness for the pair-sweep refactor)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax.numpy as jnp

from directcomputeraytracing_tpu.accel import worklist as wl
from directcomputeraytracing_tpu.accel.traverse import (
    intersect_any, intersect_closest,
)
from directcomputeraytracing_tpu.scene.presets import sphere_grid
from directcomputeraytracing_tpu.scene.scene import flatten_scene


def main():
    print("PAIR =", wl.PAIR)
    rng = np.random.default_rng(0)
    scene, cam = sphere_grid(3, 3)
    arrays, meta = flatten_scene(scene)
    n = 256
    o = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.5, 6, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    a = intersect_closest(arrays, o, d, meta.stack_size, backend="jax")
    b = intersect_closest(arrays, o, d, meta.stack_size,
                          backend="pallas_wl_interpret")
    m = np.asarray(a.hit)
    print("hit agree:", (np.asarray(b.hit) == m).all(), "hits:", m.sum())
    ta, tb = np.asarray(a.t)[m], np.asarray(b.t)[m]
    bad = np.abs(ta - tb) > 2e-4 * np.maximum(ta, 1)
    print("t mismatches:", bad.sum(), "/", m.sum())
    if bad.sum():
        tri_a = np.asarray(a.triangle)[m][bad]
        tri_b = np.asarray(b.triangle)[m][bad]
        print("ta:", ta[bad][:8])
        print("tb:", tb[bad][:8])
        print("tri a:", tri_a[:8])
        print("tri b:", tri_b[:8])
    occ_a = intersect_any(arrays, o, d, jnp.float32(3.0),
                          meta.stack_size, backend="jax")
    occ_b = intersect_any(arrays, o, d, jnp.float32(3.0),
                          meta.stack_size,
                          backend="pallas_wl_interpret")
    print("any agree:", (np.asarray(occ_a) == np.asarray(occ_b)).all())


if __name__ == "__main__":
    main()

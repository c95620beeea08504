"""Hardware correctness gate for the pair-expanded sweep: compiled
pallas_pair closest/any vs the brute dense sweep on the real device
(interpret mode is a proven-insufficient oracle — see
tests/conftest + docs/KNOWN_ISSUES.md)."""
import numpy as np
import jax
import jax.numpy as jnp

from directcomputeraytracing_tpu.accel.traverse import (
    intersect_any, intersect_closest,
)
from directcomputeraytracing_tpu.scene.presets import sphere_grid
from directcomputeraytracing_tpu.scene.scene import flatten_scene

print("backend:", jax.default_backend(), flush=True)
scene, _cam = sphere_grid(5, 5)
arrays, meta = flatten_scene(scene)
rng = np.random.default_rng(0)
n = 8192
o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
o[:, 1] = rng.uniform(0.5, 8.0, n)
d = rng.normal(size=(n, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
o, d = jnp.asarray(o), jnp.asarray(d)

ref_c = intersect_closest(arrays, o, d, meta.stack_size,
                          backend="brute")
ref_a = intersect_any(arrays, o, d, jnp.float32(4.0), meta.stack_size,
                      backend="brute")
hc = intersect_closest(arrays, o, d, meta.stack_size,
                       backend="pallas_pair")
ha = intersect_any(arrays, o, d, jnp.float32(4.0), meta.stack_size,
                   backend="pallas_pair")
m_hit = int((np.asarray(hc.hit) != np.asarray(ref_c.hit)).sum())
both = np.asarray(hc.hit) & np.asarray(ref_c.hit)
rel = np.abs(np.asarray(hc.t)[both] - np.asarray(ref_c.t)[both])
rel /= np.maximum(np.asarray(ref_c.t)[both], 1e-6)
m_t = int((rel > 1e-3).sum())
m_any = int((np.asarray(ha) != np.asarray(ref_a)).sum())
print(f"pair closest: hit mismatches {m_hit}, t mismatches {m_t}; "
      f"any mismatches {m_any}", flush=True)
# capped casts: the slab-march workhorse
caps = jnp.asarray(rng.uniform(1.0, 6.0, n).astype(np.float32))
cc = intersect_closest(arrays, o, d, meta.stack_size,
                       backend="pallas_pair", t_cap=caps)
ct = np.asarray(cc.t)
ft = np.asarray(ref_c.t)
below = np.isfinite(ft) & (ft < np.asarray(caps) * 0.999)
viol = int((~np.isfinite(ct[below])).sum())
print("capped-window missed-hit violations:", viol, flush=True)
ok = (m_hit + m_t + m_any + viol) == 0
print("PAIR_TPU_CHECK", "OK" if ok else "FAIL", flush=True)

"""Measure (R,3)x2 -> od (9,R) layout strategies on the TPU.

The XLA transpose of the fused (R,9) ray table measured ~7.7 ms per 1M
rays — a quarter of the whole closest pass. Candidates:
  xla-T      current: concat (R,9) -> .T
  cols       9 strided column extracts + stack
  pallas-T   per-block in-VMEM transpose kernel (RB,16)->(16,RB)
  copy       36 MB elementwise copy (HBM roofline reference)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
R = 1 << 20
RB = 1024


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


rng = np.random.default_rng(0)
o = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
d = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))


def make_base(o, d):
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)
    return jnp.concatenate([o, d, inv], axis=1)          # (R, 9)


@jax.jit
def xla_t(o, d):
    return make_base(o, d).T


@jax.jit
def cols(o, d):
    base = make_base(o, d)
    return jnp.stack([base[:, j] for j in range(9)], axis=0)


def _tr_kernel(in_ref, out_ref):
    out_ref[:, :] = in_ref[:, :].T


@jax.jit
def pallas_t(o, d):
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)
    base = jnp.concatenate([o, d, inv,
                            jnp.zeros((R, 7), F32)], axis=1)  # (R, 16)
    out = pl.pallas_call(
        _tr_kernel,
        grid=(R // RB,),
        in_specs=[pl.BlockSpec((RB, 16), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, RB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, R), F32),
    )(base)
    return out[:9]


@jax.jit
def copy36(o, d):
    return make_base(o, d) * 1.0000001


K = 8


def amort(body):
    def run(o, d):
        def it(i, acc):
            out = body(o + 1e-6 * i, d)
            return acc + jnp.sum(out[:, ::257])
        return jax.lax.fori_loop(0, K, it, jnp.float32(0))
    return jax.jit(run)


for name, fn in (("xla-T", xla_t), ("cols", cols),
                 ("pallas-T", pallas_t), ("copy", copy36)):
    try:
        ref = np.asarray(xla_t(o, d))
        got = np.asarray(fn(o, d))
        okq = (got.shape == ref.shape and np.allclose(got, ref)) \
            if name in ("cols", "pallas-T") else True
        t = bench(amort(fn), o, d) / K
        print(f"{name:>9}: {t*1e3:6.2f} ms  correct={okq}")
    except Exception as e:
        print(f"{name:>9}: FAILED {repr(e)[:160]}")

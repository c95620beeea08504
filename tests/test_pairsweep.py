"""Pair-expanded sweep: interpret-mode agreement with the stack walker
(closest/any/alpha/watertight/t_cap), slot-layout exactness, and the
backend resolver's instanced downgrade."""

import numpy as np
import jax.numpy as jnp
import pytest

from directcomputeraytracing_tpu.accel import pairsweep as ps
from directcomputeraytracing_tpu.accel.traverse import (
    intersect_any, intersect_closest, intersect_closest_slab,
)
from directcomputeraytracing_tpu.scene.presets import sphere_grid
from directcomputeraytracing_tpu.scene.scene import flatten_scene


@pytest.fixture(scope="module")
def grid_scene():
    scene, cam = sphere_grid(3, 3, stacks=12, slices=16)
    arrays, meta = flatten_scene(scene)
    assert arrays.cluster_bbox.shape[0] > 1
    return arrays, meta


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.2, 4.0, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_pair_closest_matches_stack_traversal(grid_scene):
    arrays, meta = grid_scene
    o, d = _rays(512)
    a = intersect_closest(arrays, o, d, meta.stack_size, backend="jax")
    b = intersect_closest(arrays, o, d, meta.stack_size,
                          backend="pallas_pair_interpret")
    m = np.asarray(a.hit)
    np.testing.assert_array_equal(np.asarray(b.hit), m)
    assert m.sum() > 80
    np.testing.assert_allclose(np.asarray(b.t)[m], np.asarray(a.t)[m],
                               rtol=1e-4, atol=1e-5)
    assert (np.asarray(b.triangle)[m] == np.asarray(a.triangle)[m]).all()
    assert (np.asarray(b.instance)[m] == np.asarray(a.instance)[m]).all()
    assert (np.asarray(b.backface)[m] == np.asarray(a.backface)[m]).all()
    # the pair path's iters counter counts the ray's OWN swept clusters
    assert np.asarray(b.iterations)[m].mean() > 0


def test_pair_anyhit_matches(grid_scene):
    arrays, meta = grid_scene
    o, d = _rays(512, seed=2)
    a = intersect_any(arrays, o, d, jnp.float32(3.0), meta.stack_size,
                      backend="jax")
    b = intersect_any(arrays, o, d, jnp.float32(3.0), meta.stack_size,
                      backend="pallas_pair_interpret")
    np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


@pytest.mark.slow
def test_pair_watertight_matches(grid_scene):
    arrays, meta = grid_scene
    o, d = _rays(256, seed=3)
    a = intersect_closest(arrays, o, d, meta.stack_size, backend="jax",
                          watertight=True)
    b = intersect_closest(arrays, o, d, meta.stack_size,
                          backend="pallas_pair_interpret",
                          watertight=True)
    m = np.asarray(a.hit)
    np.testing.assert_array_equal(np.asarray(b.hit), m)
    np.testing.assert_allclose(np.asarray(b.t)[m], np.asarray(a.t)[m],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_pair_alpha_recast_matches(grid_scene):
    arrays, meta = grid_scene
    o, d = _rays(256, seed=4)
    rng = np.random.default_rng(7)
    op_u = jnp.asarray(rng.random(256).astype(np.float32))
    a = intersect_closest(arrays, o, d, meta.stack_size, backend="jax",
                          opacity_u=op_u)
    b = intersect_closest(arrays, o, d, meta.stack_size,
                          backend="pallas_pair_interpret",
                          opacity_u=op_u)
    m = np.asarray(a.hit)
    np.testing.assert_array_equal(np.asarray(b.hit), m)
    mm = m & np.asarray(b.hit)
    np.testing.assert_allclose(np.asarray(b.t)[mm], np.asarray(a.t)[mm],
                               rtol=1e-4, atol=1e-5)
    occ_a = intersect_any(arrays, o, d, jnp.float32(2.0),
                          meta.stack_size, backend="jax", opacity_u=op_u)
    occ_b = intersect_any(arrays, o, d, jnp.float32(2.0),
                          meta.stack_size,
                          backend="pallas_pair_interpret",
                          opacity_u=op_u)
    np.testing.assert_array_equal(np.asarray(occ_b), np.asarray(occ_a))


@pytest.mark.slow
def test_pair_t_cap_window_contract(grid_scene):
    """A capped pair cast must report every hit strictly below the cap
    (per-ray caps included) and decode anything at/above it as a
    miss-or-beyond, like the work-list contract."""
    arrays, meta = grid_scene
    o, d = _rays(512, seed=5)
    full = intersect_closest(arrays, o, d, meta.stack_size,
                             backend="jax")
    ft = np.asarray(full.t)
    rng = np.random.default_rng(11)
    caps = jnp.asarray(rng.uniform(0.5, 3.0, 512).astype(np.float32))
    capped = intersect_closest(arrays, o, d, meta.stack_size,
                               backend="pallas_pair_interpret",
                               t_cap=caps)
    ct = np.asarray(capped.t)
    below = np.isfinite(ft) & (ft < np.asarray(caps) * 0.999)
    assert np.isfinite(ct[below]).all()
    np.testing.assert_allclose(ct[below], ft[below], rtol=1e-4,
                               atol=1e-5)


@pytest.mark.slow
def test_pair_slab_helper_matches_single_cast(grid_scene):
    arrays, meta = grid_scene
    o, d = _rays(512, seed=6)
    a = intersect_closest(arrays, o, d, meta.stack_size, backend="jax")
    h = intersect_closest_slab(arrays, o, d, meta.stack_size,
                               jnp.float32(0.8),
                               backend="pallas_pair_interpret",
                               phases=3, grow=3.0)
    m = np.asarray(a.hit)
    np.testing.assert_array_equal(np.asarray(h.hit), m)
    np.testing.assert_allclose(np.asarray(h.t)[m], np.asarray(a.t)[m],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_pair_layout_invariants(grid_scene):
    """Every emitted enter bit maps to exactly one pair slot whose ray
    and super decode back to the bit's (block, lane, item super)."""
    arrays, meta = grid_scene
    o, d = _rays(512, seed=8)
    (od, tm, r, rp, nb, texp, tabs, cbox3, blkflags, sup, fits,
     block_any, cap_s, eb, base_row, lc, sup_pb, prt, p_cap, ray,
     pvalid) = ps._pair_prep(arrays, o, d, 0.0, None, True)
    assert bool(fits)
    eb_n = np.asarray(eb)
    bf_n = np.asarray(blkflags)
    sup_n = np.asarray(sup)
    base_n = np.asarray(base_row)
    pv = np.asarray(pvalid)
    ray_n = np.asarray(ray)
    spb = np.asarray(sup_pb)
    valid = (bf_n & 1) == 1
    from directcomputeraytracing_tpu.accel.worklist import RB
    n_pairs = 0
    for i in np.nonzero(valid)[0]:
        lanes = np.nonzero(eb_n[i])[0]
        for k, lane in enumerate(lanes):
            p = base_n[i] + k
            assert pv[p]
            assert ray_n[p] == (bf_n[i] >> 2) * RB + lane
            assert spb[p // RB] == sup_n[i]
            n_pairs += 1
    assert n_pairs == int(pv.sum()) == int(eb_n[valid].sum())


def test_pair_backend_downgrades_on_instanced(monkeypatch):
    """Instanced scenes (BLAS sharing) ride the bundle work-list; the
    resolver downgrades pallas_pair rather than asserting inside jit."""
    from directcomputeraytracing_tpu.accel.traverse import (
        _resolve_backend,
    )

    monkeypatch.setenv("DCRT_INSTANCED", "1")
    s, cam = sphere_grid(2, 2, stacks=8, slices=10)
    arrays, meta = flatten_scene(s)
    assert arrays.isup_inst.shape[0] > 1
    assert _resolve_backend(
        arrays, "pallas_pair_interpret") == "pallas_wl_interpret"
    # tiny scenes without cluster tables downgrade too
    small = arrays._replace(cluster_bbox=arrays.cluster_bbox[:1])
    assert _resolve_backend(small, "pallas_pair") == "pallas_wl"


def test_pair_overflow_falls_back(grid_scene, monkeypatch):
    """A too-small pair budget must not change results (dense
    fallback)."""
    arrays, meta = grid_scene
    o, d = _rays(256, seed=9)
    a = intersect_closest(arrays, o, d, meta.stack_size, backend="jax")
    monkeypatch.setattr(ps, "_p_cap", lambda rp: 1024)
    b = ps.pair_closest_pallas(arrays, o, d, interpret=True)
    m = np.asarray(a.hit)
    np.testing.assert_array_equal(np.isfinite(np.asarray(b[0])), m)
    np.testing.assert_allclose(np.asarray(b[0])[m], np.asarray(a.t)[m],
                               rtol=1e-4, atol=1e-5)

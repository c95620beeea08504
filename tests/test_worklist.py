"""Hierarchical work-list traversal: interpret-mode agreement with the
stack walker, soundness of the two-level cull, and the overflow
fallback."""

import numpy as np
import jax.numpy as jnp
import pytest

from directcomputeraytracing_tpu.accel import worklist as wl
from directcomputeraytracing_tpu.accel.traverse import (
    intersect_any, intersect_closest,
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


def test_worklist_closest_matches_stack_traversal(grid_scene):
    arrays, meta = grid_scene
    o, d = _rays(256)
    a = intersect_closest(arrays, o, d, meta.stack_size, backend="jax")
    b = intersect_closest(arrays, o, d, meta.stack_size,
                          backend="pallas_wl_interpret")
    m = np.asarray(a.hit)
    np.testing.assert_array_equal(np.asarray(b.hit), m)
    assert m.sum() > 40
    np.testing.assert_allclose(np.asarray(b.t)[m], np.asarray(a.t)[m],
                               rtol=1e-4, atol=1e-5)
    assert (np.asarray(b.triangle)[m] == np.asarray(a.triangle)[m]).all()
    assert (np.asarray(b.instance)[m] == np.asarray(a.instance)[m]).all()
    bb = np.asarray(b.backface)[m]
    ab = np.asarray(a.backface)[m]
    assert (bb == ab).mean() > 0.99  # grazing-edge sign flips only
    uu, vv = np.asarray(b.u)[m], np.asarray(b.v)[m]
    np.testing.assert_allclose(uu, np.asarray(a.u)[m], rtol=2e-3,
                               atol=2e-4)
    np.testing.assert_allclose(vv, np.asarray(a.v)[m], rtol=2e-3,
                               atol=2e-4)


def test_worklist_anyhit_matches(grid_scene):
    arrays, meta = grid_scene
    o, d = _rays(256, seed=2)
    a = intersect_any(arrays, o, d, jnp.float32(3.0), meta.stack_size,
                      backend="jax")
    b = intersect_any(arrays, o, d, jnp.float32(3.0), meta.stack_size,
                      backend="pallas_wl_interpret")
    np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


def test_worklist_tmax_cull_is_exactly_occlusion(grid_scene):
    """Shadow-style short rays: the t_max-aware cull must not change
    results vs the unbounded-cull stack walker."""
    arrays, meta = grid_scene
    o, d = _rays(256, seed=5)
    for tmax in (0.25, 1.0):
        a = intersect_any(arrays, o, d, jnp.float32(tmax),
                          meta.stack_size, backend="jax")
        b = intersect_any(arrays, o, d, jnp.float32(tmax),
                          meta.stack_size, backend="pallas_wl_interpret")
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


def test_worklist_overflow_falls_back(grid_scene, monkeypatch):
    """With a tiny item capacity the lax.cond must route to the dense
    fallback kernel and still produce exact results."""
    arrays, meta = grid_scene
    monkeypatch.setattr(wl, "MAX_COARSE", 8)
    o, d = _rays(192, seed=7)   # unique shape -> fresh trace sees patch
    a = intersect_closest(arrays, o, d, meta.stack_size, backend="jax")
    b = intersect_closest(arrays, o, d, meta.stack_size,
                          backend="pallas_wl_interpret")
    m = np.asarray(a.hit)
    np.testing.assert_array_equal(np.asarray(b.hit), m)
    np.testing.assert_allclose(np.asarray(b.t)[m], np.asarray(a.t)[m],
                               rtol=1e-4, atol=1e-5)


def test_super_cull_is_exact(grid_scene):
    """The Pallas coarse cull must reproduce the exact per-ray slab
    test (min entry over entering rays) bit-for-bit vs the XLA
    mirror."""
    arrays, meta = grid_scene
    o, d = _rays(4 * wl.RB, seed=9)
    od, tm, _ = wl._prep_rays_wl(o, d)
    _, _, sbox, cpad, cs, _ = wl._pad_tables(arrays)
    kern = np.asarray(wl._cull_super(sbox, od, tm, interpret=True))
    mirror = np.asarray(wl._exact_tlo_super(sbox, od, tm))
    np.testing.assert_allclose(kern, mirror, rtol=1e-6, atol=1e-6)
    # sanity: some supers entered, some culled
    assert (kern < wl.BIG).any() and (kern >= wl.BIG).any()


def test_super_cull_tmax_prunes(grid_scene):
    """Per-ray t_max caps must cull superclusters whose entry lies
    beyond every entering ray's range, and never cull closer ones."""
    arrays, meta = grid_scene
    # coherent bundle: all rays start 10 units out on -z, aimed at the
    # geometry, so every supercluster entry distance is >= ~9
    rng = np.random.default_rng(11)
    n = 2 * wl.RB
    o = np.tile(np.asarray([[0.0, 1.0, -10.0]], np.float32), (n, 1))
    d = np.asarray([0, 1, 0], np.float32) * 0.0 + np.stack(
        [rng.uniform(-0.2, 0.2, n), rng.uniform(-0.2, 0.2, n),
         np.ones(n)], axis=1).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    od_inf, tm_inf, _ = wl._prep_rays_wl(o, d)
    cap = 5.0   # well short of the geometry
    od_cap, tm_cap, _ = wl._prep_rays_wl(o, d, t_max=cap)
    _, _, sbox, _, _, _ = wl._pad_tables(arrays)
    full = np.asarray(wl._cull_super(sbox, od_inf, tm_inf,
                                     interpret=True))
    capped = np.asarray(wl._cull_super(sbox, od_cap, tm_cap,
                                       interpret=True))
    # capping can only remove entries (or keep entry distance equal)
    entered = capped < wl.BIG
    np.testing.assert_allclose(capped[entered], full[entered],
                               rtol=1e-6, atol=1e-6)
    # entries past the cap are gone
    assert not (capped[(full > cap + 1e-3) & (full < wl.BIG)]
                < wl.BIG).any()
    assert entered.sum() < (full < wl.BIG).sum()


def test_hierarchical_phase_a_matches_dense(monkeypatch):
    """Above HIER_MIN supers phase A goes hyper->super hierarchical;
    the produced (block, super, t_ent) item set must be identical to
    the dense cull's."""
    import numpy as np

    from directcomputeraytracing_tpu.scene.scene import flatten_scene

    scene, _ = sphere_grid(6, 6)
    arrays, _meta = flatten_scene(scene)
    rng = np.random.default_rng(3)
    r = 2 * wl.RB
    o = rng.uniform(-8, 8, (r, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.2, 9.0, r)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    od, tm, _ = wl._prep_rays_wl(jnp.asarray(o), jnp.asarray(d))

    # force the hierarchy on at this scene scale
    monkeypatch.setattr(wl, "HIER_MIN", 48)
    _, _, sbox, _, cs, hyper = wl._pad_tables(arrays)
    assert hyper is not None, "scene too small to exercise the hierarchy"

    def items(phases_out):
        bf, sup, t_ent = phases_out[2], phases_out[3], phases_out[4]
        bf, sup, t_ent = map(np.asarray, (bf, sup, t_ent))
        valid = (bf & 1) == 1
        blk = bf[valid] >> wl._BLOCK_SHIFT
        return set(zip(blk.tolist(), sup[valid].tolist(),
                       t_ent[valid].tolist()))

    hier = wl._phases(arrays, od, tm, interpret=True)
    assert bool(hier[5])  # fits
    monkeypatch.setattr(wl, "HIER_MIN", 10**9)
    dense = wl._phases(arrays, od, tm, interpret=True)
    assert bool(dense[5])
    assert items(hier) == items(dense)


def test_hyper_entered_but_supers_all_culled_is_a_miss(monkeypatch):
    """A block whose hyper union-AABB is entered but whose member
    supers are ALL refined away must decode as misses, not garbage:
    block_any must come from the final super item list (regression for
    the round-2 advisor finding — zero-filled untouched output rows
    decode as t=0 false hits)."""
    from directcomputeraytracing_tpu.scene.scene import (
        Instance, Material, Mesh, Scene, flatten_scene,
    )

    rng = np.random.default_rng(17)

    def tri_group(n, x0):
        cen = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
        cen[:, 0] += x0
        v = (cen[:, None, :]
             + rng.uniform(-0.05, 0.05, (n, 3, 3))).astype(np.float32)
        pos = v.reshape(-1, 3)
        idx = np.arange(3 * n).reshape(n, 3)
        return Mesh(positions=pos, indices=idx,
                    material_ids=np.zeros(n, np.int64), name=f"g{x0}")

    # two 1536-tri groups far apart along x: the first median split in
    # the clusterer separates them exactly, so supers stay group-local
    # while a hyper's union box covers the gap between them
    scene = Scene(meshes=[tri_group(1536, 0.0), tri_group(1536, 30.0)],
                  instances=[Instance(mesh=0), Instance(mesh=1)],
                  materials=[Material()])
    arrays, meta = flatten_scene(scene)
    monkeypatch.setattr(wl, "HIER_MIN", 2)
    _, _, _, _, cs, hyper = wl._pad_tables(arrays)
    assert hyper is not None and cs >= 4

    # one full RB block of rays through the inter-group gap: every ray
    # enters the hyper union box, none enters any super box
    n = wl.RB
    o = np.tile(np.asarray([[15.5, 0.5, -5.0]], np.float32), (n, 1))
    d = np.stack([rng.uniform(-0.01, 0.01, n),
                  rng.uniform(-0.01, 0.01, n),
                  np.ones(n)], axis=1).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    a = intersect_closest(arrays, o, d, meta.stack_size, backend="jax")
    b = intersect_closest(arrays, o, d, meta.stack_size,
                          backend="pallas_wl_interpret")
    assert not np.asarray(a.hit).any()
    assert not np.asarray(b.hit).any()
    occ = intersect_any(arrays, o, d, jnp.float32(50.0), meta.stack_size,
                        backend="pallas_wl_interpret")
    assert not np.asarray(occ).any()


def test_instanced_mode_matches_stack(monkeypatch):
    """BLAS-sharing instanced tables (mesh-local slabs + per-item ray
    re-transform) must reproduce the stack walker exactly — closest
    (t/tri/instance/backface) and any-hit, incl. non-uniformly scaled
    instances."""
    monkeypatch.setenv("DCRT_INSTANCED", "1")
    scene, _cam = sphere_grid(3, 3, stacks=12, slices=16)
    arrays, meta = flatten_scene(scene)
    assert arrays.isup_inst.shape[0] > 1
    o, d = _rays(256, seed=21)
    a = intersect_closest(arrays, o, d, meta.stack_size, backend="jax")
    b = intersect_closest(arrays, o, d, meta.stack_size,
                          backend="pallas_wl_interpret")
    m = np.asarray(a.hit)
    np.testing.assert_array_equal(np.asarray(b.hit), m)
    assert m.sum() > 40
    np.testing.assert_allclose(np.asarray(b.t)[m], np.asarray(a.t)[m],
                               rtol=2e-4, atol=1e-5)
    assert (np.asarray(b.triangle)[m] == np.asarray(a.triangle)[m]).all()
    assert (np.asarray(b.instance)[m] == np.asarray(a.instance)[m]).all()
    assert (np.asarray(b.backface)[m]
            == np.asarray(a.backface)[m]).mean() > 0.99
    occ_a = intersect_any(arrays, o, d, jnp.float32(3.0),
                          meta.stack_size, backend="jax")
    occ_b = intersect_any(arrays, o, d, jnp.float32(3.0),
                          meta.stack_size, backend="pallas_wl_interpret")
    np.testing.assert_array_equal(np.asarray(occ_b), np.asarray(occ_a))


def test_worklist_reports_sweep_counters(grid_scene):
    """The production-path traversal-cost counter (VERDICT r2 #8): hits
    must come from blocks that report swept clusters, and the counter
    flows through intersect_closest.iterations."""
    arrays, meta = grid_scene
    o, d = _rays(256, seed=3)
    h = intersect_closest(arrays, o, d, meta.stack_size,
                          backend="pallas_wl_interpret")
    iters = np.asarray(h.iterations)
    hits = np.asarray(h.hit)
    assert iters.shape == hits.shape
    assert (iters[hits] > 0).all()
    assert iters.max() < arrays.cluster_bbox.shape[0] * 4


def test_watertight_on_pallas_matches_stack(grid_scene):
    """watertight=True must run on the Pallas fast path (no silent
    demotion) and agree with the stack walker's watertight test."""
    arrays, meta = grid_scene
    o, d = _rays(256)
    a = intersect_closest(arrays, o, d, meta.stack_size, backend="jax",
                          watertight=True)
    b = intersect_closest(arrays, o, d, meta.stack_size,
                          backend="pallas_wl_interpret", watertight=True)
    np.testing.assert_array_equal(np.asarray(b.hit), np.asarray(a.hit))
    m = np.asarray(a.hit)
    np.testing.assert_allclose(np.asarray(b.t)[m], np.asarray(a.t)[m],
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(b.triangle)[m],
                                  np.asarray(a.triangle)[m])
    np.testing.assert_array_equal(np.asarray(b.backface)[m],
                                  np.asarray(a.backface)[m])

    from directcomputeraytracing_tpu.accel.traverse import intersect_any

    oa = intersect_any(arrays, o, d, 3.0, meta.stack_size, backend="jax",
                       watertight=True)
    ob = intersect_any(arrays, o, d, 3.0, meta.stack_size,
                       backend="pallas_wl_interpret", watertight=True)
    np.testing.assert_array_equal(np.asarray(ob), np.asarray(oa))


@pytest.mark.slow
def test_rows_path_matches_columns(grid_scene):
    """The rows-layout fast path (rays as (3, R) component rows) must
    produce bit-identical results to the (R, 3) path — it only skips
    the relayout, the kernels are the same."""
    arrays, meta = grid_scene
    o, d = _rays(512, seed=5)
    rows = (jnp.asarray(np.asarray(o).T), jnp.asarray(np.asarray(d).T))
    a = intersect_closest(arrays, o, d, meta.stack_size,
                          backend="pallas_wl_interpret")
    b = intersect_closest(arrays, None, None, meta.stack_size,
                          backend="pallas_wl_interpret",
                          rays_rows=rows)
    np.testing.assert_array_equal(np.asarray(b.hit), np.asarray(a.hit))
    np.testing.assert_array_equal(np.asarray(b.t), np.asarray(a.t))
    np.testing.assert_array_equal(np.asarray(b.triangle),
                                  np.asarray(a.triangle))
    occ_a = intersect_any(arrays, o, d, jnp.float32(3.0),
                          meta.stack_size,
                          backend="pallas_wl_interpret")
    occ_b = intersect_any(arrays, None, None, jnp.float32(3.0),
                          meta.stack_size,
                          backend="pallas_wl_interpret", rays_rows=rows)
    np.testing.assert_array_equal(np.asarray(occ_b), np.asarray(occ_a))


def test_rows_path_non_wl_backend_transposes(grid_scene):
    """rays_rows on a non-worklist backend transposes back and agrees."""
    arrays, meta = grid_scene
    o, d = _rays(128, seed=7)
    rows = (jnp.asarray(np.asarray(o).T), jnp.asarray(np.asarray(d).T))
    a = intersect_closest(arrays, o, d, meta.stack_size, backend="jax")
    b = intersect_closest(arrays, None, None, meta.stack_size,
                          backend="jax", rays_rows=rows)
    np.testing.assert_array_equal(np.asarray(b.t), np.asarray(a.t))


def test_t_cap_slab_window_contract(grid_scene):
    """t_cap window contract (slab marching, worklist_closest_pallas):
    a capped hit strictly below the cap is the true closest; a capped
    miss guarantees no acceptable hit strictly below the cap; and any
    true hit below the cap minus one truncation quantum MUST resolve
    in the capped pass (the phase-2 routing in
    wavefront._sorted_closest relies on all three)."""
    arrays, meta = grid_scene
    o, d = _rays(256, seed=9)
    full = intersect_closest(arrays, o, d, meta.stack_size,
                             backend="pallas_wl_interpret")
    t_full = np.asarray(full.t)
    hit_f = np.asarray(full.hit)
    D = float(np.median(t_full[hit_f]))
    cap = intersect_closest(arrays, o, d, meta.stack_size,
                            backend="pallas_wl_interpret",
                            t_cap=jnp.float32(D))
    hit_c = np.asarray(cap.hit)
    t_c = np.asarray(cap.t)
    resolved = hit_c & (t_c < D)
    assert resolved.sum() > 30
    np.testing.assert_allclose(t_c[resolved], t_full[resolved],
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(cap.triangle)[resolved],
                                  np.asarray(full.triangle)[resolved])
    # capped miss => the full cast found nothing strictly below D
    miss_c = ~hit_c
    assert not (hit_f[miss_c] & (t_full[miss_c] < D)).any()
    # true hits below D (minus the packed-argmin quantum) all resolve
    margin = D * (1.0 - 2.0 ** -12)
    low = hit_f & (t_full < margin)
    assert low.sum() > 20
    assert hit_c[low].all()
    np.testing.assert_array_equal(np.asarray(cap.triangle)[low],
                                  np.asarray(full.triangle)[low])


@pytest.mark.slow
def test_slab_helper_exact_vs_single_cast(grid_scene):
    """intersect_closest_slab (capped phase 1 + floored opaque phase 2
    on the compacted remainder) must reproduce the single full cast
    exactly for every ray — hit mask, t, and triangle."""
    from directcomputeraytracing_tpu.accel.traverse import (
        intersect_closest_slab,
    )

    arrays, meta = grid_scene
    o, d = _rays(512, seed=21)
    full = intersect_closest(arrays, o, d, meta.stack_size,
                             backend="pallas_wl_interpret")
    t_full = np.asarray(full.t)
    D = float(np.percentile(t_full[np.asarray(full.hit)], 40))
    slab = intersect_closest_slab(arrays, o, d, meta.stack_size,
                                  jnp.float32(D),
                                  backend="pallas_wl_interpret")
    np.testing.assert_array_equal(np.asarray(slab.hit),
                                  np.asarray(full.hit))
    m = np.asarray(full.hit)
    np.testing.assert_allclose(np.asarray(slab.t)[m], t_full[m],
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(slab.triangle)[m],
                                  np.asarray(full.triangle)[m])


def test_slab_helper_three_phases_exact(grid_scene):
    """phases=3 (geometric windows + floored opaque middle phase) stays
    exact vs the single full cast."""
    from directcomputeraytracing_tpu.accel.traverse import (
        intersect_closest_slab,
    )

    arrays, meta = grid_scene
    o, d = _rays(512, seed=23)
    full = intersect_closest(arrays, o, d, meta.stack_size,
                             backend="pallas_wl_interpret")
    t_full = np.asarray(full.t)
    D = float(np.percentile(t_full[np.asarray(full.hit)], 25))
    slab = intersect_closest_slab(arrays, o, d, meta.stack_size,
                                  jnp.float32(D),
                                  backend="pallas_wl_interpret",
                                  phases=3, grow=4.0)
    np.testing.assert_array_equal(np.asarray(slab.hit),
                                  np.asarray(full.hit))
    m = np.asarray(full.hit)
    np.testing.assert_allclose(np.asarray(slab.t)[m], t_full[m],
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(slab.triangle)[m],
                                  np.asarray(full.triangle)[m])


@pytest.mark.slow
def test_instanced_slab_helper_exact(monkeypatch):
    """intersect_closest_slab through the BLAS-sharing instanced tables
    (mesh-local slabs, per-item ray re-transform) must reproduce the
    single full cast exactly — the capped sentinel and the floored
    later phase ride the same world-t packing the instanced kernels
    use."""
    from directcomputeraytracing_tpu.accel.traverse import (
        intersect_closest_slab,
    )

    monkeypatch.setenv("DCRT_INSTANCED", "1")
    scene, _cam = sphere_grid(3, 3, stacks=12, slices=16)
    arrays, meta = flatten_scene(scene)
    assert arrays.isup_inst.shape[0] > 1
    o, d = _rays(256, seed=25)
    full = intersect_closest(arrays, o, d, meta.stack_size,
                             backend="pallas_wl_interpret")
    t_full = np.asarray(full.t)
    D = float(np.median(t_full[np.asarray(full.hit)]))
    slab = intersect_closest_slab(arrays, o, d, meta.stack_size,
                                  jnp.float32(D),
                                  backend="pallas_wl_interpret")
    np.testing.assert_array_equal(np.asarray(slab.hit),
                                  np.asarray(full.hit))
    m = np.asarray(full.hit)
    np.testing.assert_allclose(np.asarray(slab.t)[m], t_full[m],
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(slab.triangle)[m],
                                  np.asarray(full.triangle)[m])
    np.testing.assert_array_equal(np.asarray(slab.instance)[m],
                                  np.asarray(full.instance)[m])


def test_grouped_closest_matches_stack_traversal(grid_scene):
    """pallas_wlg (per-lane-group cluster worklists, the incoherent
    pool backend) must agree with the stack walker like the bundle
    kernels do."""
    arrays, meta = grid_scene
    o, d = _rays(256, seed=7)
    a = intersect_closest(arrays, o, d, meta.stack_size, backend="jax")
    b = intersect_closest(arrays, o, d, meta.stack_size,
                          backend="pallas_wlg_interpret")
    m = np.asarray(a.hit)
    np.testing.assert_array_equal(np.asarray(b.hit), m)
    assert m.sum() > 40
    np.testing.assert_allclose(np.asarray(b.t)[m], np.asarray(a.t)[m],
                               rtol=1e-4, atol=1e-5)
    assert (np.asarray(b.triangle)[m] == np.asarray(a.triangle)[m]).all()


def test_grouped_anyhit_matches(grid_scene):
    arrays, meta = grid_scene
    o, d = _rays(256, seed=8)
    a = intersect_any(arrays, o, d, jnp.float32(3.0), meta.stack_size,
                      backend="jax")
    b = intersect_any(arrays, o, d, jnp.float32(3.0), meta.stack_size,
                      backend="pallas_wlg_interpret")
    np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


def test_grouped_downgrades_on_instanced(monkeypatch):
    """Instanced scenes resolve pallas_wlg to the bundle kernels."""
    monkeypatch.setenv("DCRT_INSTANCED", "1")
    scene, _cam = sphere_grid(3, 3, stacks=12, slices=16)
    arrays, _meta = flatten_scene(scene)
    from directcomputeraytracing_tpu.accel.traverse import (
        _resolve_backend,
    )
    assert arrays.isup_inst.shape[0] > 1
    assert _resolve_backend(arrays, "pallas_wlg") == "pallas_wl"
    assert (_resolve_backend(arrays, "pallas_wlg_interpret")
            == "pallas_wl_interpret")

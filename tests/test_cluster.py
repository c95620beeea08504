"""Clustered cull-and-sweep intersector: cluster build invariants +
interpret-mode agreement with the stack traversal on a mid-size
instanced scene."""

import numpy as np
import jax.numpy as jnp
import pytest

from directcomputeraytracing_tpu.accel.cluster import (
    CLUSTER_SIZE, build_clusters,
)
from directcomputeraytracing_tpu.accel.traverse import (
    intersect_any, intersect_closest,
)
from directcomputeraytracing_tpu.scene.presets import sphere_grid
from directcomputeraytracing_tpu.scene.scene import flatten_scene


@pytest.fixture(scope="module")
def grid_scene():
    scene, cam = sphere_grid(3, 3, stacks=12, slices=16)
    arrays, meta = flatten_scene(scene)
    assert arrays.cluster_bbox.shape[0] > 1, "scene must trigger clustering"
    return arrays, meta


def test_cluster_build_invariants():
    rng = np.random.default_rng(5)
    n = 1000
    tris = rng.uniform(-5, 5, (n, 9)).astype(np.float32)
    meta = np.stack([np.arange(n), np.zeros(n), np.zeros(n)],
                    axis=1).astype(np.float32)
    tab, bbox = build_clusters(tris, meta)
    c = bbox.shape[0]
    assert tab.shape == (c * CLUSTER_SIZE, 13)
    # col 12 = world-soup row of each live entry
    live = np.abs(tab[:, 0:9]).sum(1) > 0
    assert (tab[live, 12] == tab[live, 9]).all()  # meta[:,0]==arange here
    # every input triangle appears exactly once
    ids = tab[:, 9][np.abs(tab[:, 0:9]).sum(1) > 0]
    assert sorted(ids.astype(int).tolist()) == list(range(n))
    # each cluster's bbox contains its triangles
    for k in range(c):
        rows = tab[k * CLUSTER_SIZE:(k + 1) * CLUSTER_SIZE]
        live = np.abs(rows[:, 0:9]).sum(1) > 0
        if not live.any():
            continue
        v = rows[live, 0:9].reshape(-1, 3)
        assert (v >= bbox[k, 0:3] - 1e-5).all()
        assert (v <= bbox[k, 3:6] + 1e-5).all()


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.2, 4.0, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_clustered_closest_matches_stack_traversal(grid_scene):
    arrays, meta = grid_scene
    o, d = _rays(128)
    a = intersect_closest(arrays, o, d, meta.stack_size, backend="jax")
    b = intersect_closest(arrays, o, d, meta.stack_size,
                          backend="pallas_cluster_interpret")
    m = np.asarray(a.hit)
    np.testing.assert_array_equal(np.asarray(b.hit), m)
    assert m.sum() > 20
    np.testing.assert_allclose(np.asarray(b.t)[m], np.asarray(a.t)[m],
                               rtol=1e-4, atol=1e-5)
    assert (np.asarray(b.triangle)[m] == np.asarray(a.triangle)[m]).all()
    assert (np.asarray(b.instance)[m] == np.asarray(a.instance)[m]).all()


def test_clustered_anyhit_matches(grid_scene):
    arrays, meta = grid_scene
    o, d = _rays(128, seed=2)
    a = intersect_any(arrays, o, d, jnp.float32(3.0), meta.stack_size,
                      backend="jax")
    b = intersect_any(arrays, o, d, jnp.float32(3.0), meta.stack_size,
                      backend="pallas_cluster_interpret")
    np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


def test_interval_cull_is_sound(grid_scene):
    """The conservative bundle cull must never drop a cluster the exact
    per-ray test enters (false positives are fine; false negatives would
    lose intersections)."""
    import numpy as np
    from directcomputeraytracing_tpu.accel.pallas_brute import (
        _cull_masks, _exact_masks, _pad_cluster_tables, _prep_rays,
    )

    arrays, meta = grid_scene
    o, d = _rays(2048, seed=9)
    ot, dt, _ = _prep_rays(o, d)
    tables = _pad_cluster_tables(arrays)
    n_groups = tables[2]
    cons, gcons = _cull_masks(tables, ot, dt, interpret=True)
    exact, gexact = _exact_masks(arrays, ot, dt, n_groups)
    c = np.asarray(cons)[:, :np.asarray(exact).shape[1]]
    e = np.asarray(exact)
    assert (c >= e - 1e-6).all(), "conservative cull dropped a cluster"
    # and it should still cull a meaningful fraction on coherent blocks
    assert np.asarray(gcons).mean() <= 1.0


@pytest.mark.slow
def test_bounce_ray_sorting_is_invariant(grid_scene):
    """sort_bounce_rays must not change the rendered values (pure
    reorder + inverse permutation around the traversal)."""
    import jax.numpy as jnp
    from directcomputeraytracing_tpu.integrator.common import RenderConfig
    from directcomputeraytracing_tpu.integrator.megakernel import (
        full_frame_pixels, render_samples,
    )
    from directcomputeraytracing_tpu.lut.textures import placeholder_luts
    from directcomputeraytracing_tpu.scene.presets import sphere_grid
    from directcomputeraytracing_tpu.scene.scene import flatten_scene

    scene, cam = sphere_grid(2, 2, stacks=8, slices=10)
    arrays, meta = flatten_scene(scene)
    luts = placeholder_luts()
    base = dict(width=16, height=16, max_bounce=2,
                stack_size=meta.stack_size, light_count=meta.light_count)
    cfg_a = RenderConfig(**base)
    cfg_b = RenderConfig(**base, sort_bounce_rays=True)
    px, py = full_frame_pixels(cfg_a)
    _, va = render_samples(arrays, luts, cam, cfg_a, px, py, jnp.uint32(3))
    _, vb = render_samples(arrays, luts, cam, cfg_b, px, py, jnp.uint32(3))
    np.testing.assert_allclose(np.asarray(vb), np.asarray(va),
                               rtol=1e-6, atol=1e-7)

"""Multi-chip sharding tests on the forced 8-device CPU mesh: the
distributed progressive step must reproduce the single-device render
(same seeds, disjoint pixel bands, psum sample merge) — for both
integrators, with and without the device-local tile ordering, and
through the halo-exchanged distributed film filter."""

import numpy as np
import jax
import pytest

from directcomputeraytracing_tpu.film.filters import FilterParams
from directcomputeraytracing_tpu.integrator.renderer import Renderer
from directcomputeraytracing_tpu.parallel.dist import (
    DistributedRenderer, band_rows, make_mesh,
)
from directcomputeraytracing_tpu.scene.presets import cornell_box


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    scene, cam = cornell_box(light="area")
    return scene, cam


@pytest.mark.parametrize("spp_parallel", [
    pytest.param(1, marks=pytest.mark.slow), 2,
    pytest.param(4, marks=pytest.mark.slow)])
def test_distributed_matches_single_device(setup, spp_parallel):
    scene, cam = setup
    r = Renderer(scene, cam, width=16, height=16, max_bounce=2)
    mesh = make_mesh(n_devices=8, spp_parallel=spp_parallel)
    dr = DistributedRenderer(mesh, r.arrays, r.luts, r.camera, r.cfg)
    steps = 4 // spp_parallel
    for _ in range(steps):
        dr.render_step()
    img_dist = dr.image()
    img_single = r.render(spp=4, samples_per_dispatch=1)
    np.testing.assert_allclose(img_dist, img_single, rtol=1e-5, atol=1e-6)
    assert dr.spp == 4


@pytest.mark.slow
def test_distributed_wavefront_matches_single_device(setup):
    """Wavefront-on-mesh (each band drains its own pool) must match the
    single-device wavefront render exactly."""
    scene, cam = setup
    r = Renderer(scene, cam, width=16, height=16, max_bounce=2,
                 integrator="wavefront")
    mesh = make_mesh(n_devices=8, spp_parallel=2)
    dr = DistributedRenderer(mesh, r.arrays, r.luts, r.camera, r.cfg,
                             integrator="wavefront")
    dr.render_step()
    img_single = r.render(spp=2, samples_per_dispatch=1)
    np.testing.assert_allclose(dr.image(), img_single, rtol=1e-5,
                               atol=1e-6)


@pytest.mark.slow
def test_distributed_filtered_film_matches_single_device(setup):
    """The halo-exchange distributed convolution must reproduce the
    single-device filtered film across band seams."""
    scene, cam = setup
    fp = FilterParams(kind="gaussian", radius=1.5)
    r = Renderer(scene, cam, width=16, height=16, max_bounce=2,
                 filter_type="gaussian", filter_radius=1.5,
                 filter_params=fp)
    mesh = make_mesh(n_devices=8, spp_parallel=2)
    dr = DistributedRenderer(mesh, r.arrays, r.luts, r.camera, r.cfg,
                             filter_params=fp)
    dr.render_step()
    img_single = r.render(spp=2)
    np.testing.assert_allclose(dr.image(), img_single, rtol=1e-4,
                               atol=1e-5)


@pytest.mark.slow
def test_distributed_tile_order_identical(setup):
    """The device-local tile permutation must not change the image."""
    scene, cam = setup
    r = Renderer(scene, cam, width=16, height=16, max_bounce=2)
    mesh = make_mesh(n_devices=8, spp_parallel=2)
    a = DistributedRenderer(mesh, r.arrays, r.luts, r.camera, r.cfg,
                            tile_order=True)
    b = DistributedRenderer(mesh, r.arrays, r.luts, r.camera, r.cfg,
                            tile_order=False)
    a.render_step()
    b.render_step()
    np.testing.assert_allclose(a.image(), b.image(), rtol=1e-6,
                               atol=1e-7)


def test_mesh_shapes():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = make_mesh(n_devices=8, spp_parallel=2)
    assert mesh.shape == {"spp": 2, "tile": 4}

    class _Cfg:
        height = 18
        width = 16

    assert band_rows(_Cfg, mesh) == 5


def test_initialize_distributed_routing(monkeypatch):
    """Arg/env routing of the multi-host bring-up: no-op single host,
    explicit args win, env-var fallbacks apply (the call itself needs a
    real coordinator, so jax.distributed.initialize is stubbed)."""
    import jax

    from directcomputeraytracing_tpu.parallel.dist import (
        initialize_distributed,
    )

    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda coordinator_address, num_processes, process_id:
        calls.append((coordinator_address, num_processes, process_id)))

    initialize_distributed()                   # single host: no-op
    assert calls == []

    initialize_distributed("10.0.0.1:1234", 4, 2)
    assert calls[-1] == ("10.0.0.1:1234", 4, 2)

    monkeypatch.setenv("DCRT_PROCESS_ID", "7")
    initialize_distributed("10.0.0.1:1234", 4, 0)
    assert calls[-1] == ("10.0.0.1:1234", 4, 0)  # explicit 0 wins
    monkeypatch.delenv("DCRT_PROCESS_ID")

    monkeypatch.setenv("DCRT_COORDINATOR", "10.0.0.9:99")
    monkeypatch.setenv("DCRT_NUM_PROCESSES", "8")
    monkeypatch.setenv("DCRT_PROCESS_ID", "3")
    initialize_distributed()
    assert calls[-1] == ("10.0.0.9:99", 8, 3)


@pytest.mark.slow
def test_distributed_wavefront_spp_batch_matches_single(setup):
    """spp-sharded + spp_batch: an (spp=2, tile=4) mesh step with
    spp_batch=2 must equal 4 sequential single-device samples (replica
    r, sample s uses seed r * spp_batch + s)."""
    scene, cam = setup
    r = Renderer(scene, cam, width=16, height=16, max_bounce=2,
                 integrator="wavefront")
    mesh = make_mesh(n_devices=8, spp_parallel=2)
    dr = DistributedRenderer(mesh, r.arrays, r.luts, r.camera, r.cfg,
                             integrator="wavefront", spp_batch=2)
    dr.render_step()
    assert dr.spp == 4
    for s in range(4):
        r.render_sample(s)
    np.testing.assert_allclose(dr.image(), r.image(), rtol=2e-5,
                               atol=2e-6)

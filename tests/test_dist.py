"""Multi-chip sharding tests on the forced 8-device CPU mesh: the
distributed progressive step must reproduce the single-device render
exactly (same seeds, disjoint pixel shards, psum sample merge)."""

import numpy as np
import jax
import pytest

from directcomputeraytracing_tpu.integrator.renderer import Renderer
from directcomputeraytracing_tpu.parallel.dist import (
    DistributedRenderer, make_mesh, pad_ray_count,
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


def test_mesh_shapes():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = make_mesh(n_devices=8, spp_parallel=2)
    assert mesh.shape == {"spp": 2, "tile": 4}
    assert pad_ray_count(10, mesh) == 12

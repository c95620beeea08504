"""Tooling parity tests: debug tracer, AOVs, BVH XML dump, checkpoint."""

import numpy as np
import jax.numpy as jnp
import pytest

from directcomputeraytracing_tpu.accel.build import serialize_bvh_to_xml
from directcomputeraytracing_tpu.accel.traverse import intersect_closest
from directcomputeraytracing_tpu.integrator.aov import AOV_KINDS, render_aov
from directcomputeraytracing_tpu.integrator.common import RenderConfig
from directcomputeraytracing_tpu.integrator.megakernel import (
    full_frame_pixels,
)
from directcomputeraytracing_tpu.integrator.renderer import Renderer
from directcomputeraytracing_tpu.scene.presets import cornell_box
from directcomputeraytracing_tpu.scene.scene import flatten_scene
from directcomputeraytracing_tpu.utils.debug_trace import (
    screen_to_camera_ray, trace_ray,
)


@pytest.fixture(scope="module")
def cornell():
    scene, cam = cornell_box(light="area")
    arrays, meta = flatten_scene(scene)
    cfg = RenderConfig(width=32, height=32, max_bounce=2,
                       stack_size=meta.stack_size,
                       light_count=meta.light_count)
    return scene, arrays, meta, cam, cfg


def test_debug_tracer_matches_device(cornell):
    scene, arrays, meta, cam, cfg = cornell
    rng = np.random.default_rng(3)
    origins = rng.uniform(-0.9, 0.9, (64, 3)).astype(np.float32)
    origins[:, 1] += 1.0
    dirs = rng.normal(size=(64, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    hi = intersect_closest(arrays, jnp.asarray(origins), jnp.asarray(dirs),
                           meta.stack_size, backend="jax")
    for i in range(64):
        h = trace_ray(arrays, origins[i], dirs[i])
        assert h.hit == bool(np.asarray(hi.hit)[i])
        if h.hit:
            np.testing.assert_allclose(h.t, float(np.asarray(hi.t)[i]),
                                       rtol=1e-4, atol=1e-5)
            assert h.triangle == int(np.asarray(hi.triangle)[i])
        assert h.counters.box_tests > 0


def test_screen_ray_hits_scene(cornell):
    scene, arrays, meta, cam, cfg = cornell
    o, d = screen_to_camera_ray(cam, cfg, 16, 16)
    h = trace_ray(arrays, o, d)
    assert h.hit and h.counters.triangle_tests > 0


@pytest.mark.parametrize("kind", AOV_KINDS)
def test_aov_outputs(cornell, kind):
    scene, arrays, meta, cam, cfg = cornell
    px, py = full_frame_pixels(cfg)
    v = np.asarray(render_aov(arrays, cam, cfg, px, py, jnp.uint32(0),
                              kind=kind))
    assert v.shape == (32 * 32, 3)
    assert np.isfinite(v).all()
    if kind in ("normal", "albedo"):
        assert v.max() > 0.1
    if kind == "iteration_count":
        assert v.max() >= 3


def test_bvh_xml_dump(cornell):
    scene, *_ = cornell
    xml = serialize_bvh_to_xml(scene)
    assert xml.count("<Node") > 10
    assert "CombinedTLASPlusBLAS" in xml
    import xml.etree.ElementTree as ET
    ET.fromstring(xml)   # well-formed


def test_checkpoint_roundtrip(tmp_path, cornell):
    scene, arrays, meta, cam, cfg = cornell
    r = Renderer(scene, cam, width=16, height=16, max_bounce=2)
    r.render(2)
    p = tmp_path / "film.npz"
    r.save_checkpoint(p)
    r2 = Renderer(scene, cam, width=16, height=16, max_bounce=2)
    r2.load_checkpoint(p)
    assert r2.spp == 2
    np.testing.assert_allclose(r2.image(), r.image())
    # resuming continues the accumulation
    r2.render_sample(r2.spp)
    assert r2.spp == 3

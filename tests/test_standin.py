"""Headline stand-in scene: >=200k-tri Mitsuba XML end-to-end.

BASELINE.md's marquee config (Spaceship 1080p wavefront) has no public
assets; scene/standin.py generates an equivalent-scale stand-in. These
tests pin its structure and (slow) render it through both integrators.
"""

import numpy as np
import pytest

from directcomputeraytracing_tpu.scene.standin import write_standin_scene
from directcomputeraytracing_tpu.scene.xml_loader import load_mitsuba_xml
from directcomputeraytracing_tpu.scene.scene import flatten_scene


@pytest.fixture(scope="module")
def standin(tmp_path_factory):
    d = tmp_path_factory.mktemp("standin")
    path = write_standin_scene(str(d))
    scene, settings = load_mitsuba_xml(path)
    return scene, settings.camera, settings


def test_standin_scale_and_features(standin):
    scene, cam, settings = standin
    arrays, meta = flatten_scene(scene)
    # headline scale: >= 200k world triangles, instanced through XML
    assert arrays.world_tris.shape[0] >= 200_000
    assert len(scene.instances) >= 144
    # full BSDF mix present
    types = {m.mtype for m in scene.materials}
    assert len(types) >= 4
    # bitmap albedo + bitmap opacity mask made it through
    assert any(m.albedo_texture >= 0 for m in scene.materials)
    assert any(m.opacity_texture >= 0 for m in scene.materials)
    # area emitter + constant env emitter
    assert meta.light_count >= 2
    # 1080p film with gaussian rfilter
    assert (settings.width, settings.height) == (1920, 1080)
    assert settings.filter_type == "gaussian"


@pytest.mark.slow
def test_standin_renders(standin):
    from directcomputeraytracing_tpu.integrator.renderer import Renderer

    scene, cam, settings = standin
    r = Renderer(scene, cam, width=64, height=36,
                 max_bounce=3, any_hit=True)
    img = r.render(spp=2)
    assert np.isfinite(img).all()
    assert img.max() > 0.0

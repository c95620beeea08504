"""Benchmark-config smoke matrix (BASELINE.md): every headline scene
family renders finite, nonzero images end-to-end at tiny sizes."""

import textwrap

import numpy as np
import pytest

from directcomputeraytracing_tpu.integrator.renderer import Renderer
from directcomputeraytracing_tpu.scene.presets import cornell_box, sphere_grid


def _check(img):
    assert np.isfinite(img).all()
    assert img.max() > 0.0


@pytest.mark.parametrize("mats,light", [
    ("diffuse", "point"),      # config 1: Lambert + point light
    # config 2: Cook-Torrance + area light MIS
    pytest.param("glossy", "area", marks=pytest.mark.slow),
    pytest.param("dielectric", "area", marks=pytest.mark.slow),
])
def test_cornell_configs(mats, light):
    scene, cam = cornell_box(light=light, material_set=mats)
    r = Renderer(scene, cam, width=12, height=12, max_bounce=3)
    _check(r.render(spp=2))


@pytest.mark.slow
def test_ibl_thin_lens_config():
    # config 3: HDR env light + thin-lens bokeh
    import jax.numpy as jnp

    from directcomputeraytracing_tpu.core.types import CameraParams
    from directcomputeraytracing_tpu.camera.camera import look_at_transform
    from directcomputeraytracing_tpu.scene.scene import PunctualLight

    scene, _ = cornell_box(light="area", material_set="glossy")
    env = (np.mgrid[0:8, 0:16][0] / 8.0).astype(np.float32)
    scene.env_texture = np.stack([env, env * 0.8, env * 0.6], axis=-1)
    scene.lights.append(PunctualLight(kind="env", radiance=(1.0,) * 3))
    cam = CameraParams.create(
        transform=look_at_transform((0, 1, -3.6), (0, 1, 0)),
        fov_x=np.deg2rad(38.0), aperture_radius=0.1, focal_distance=3.6,
        blade_count=5)
    r = Renderer(scene, cam, width=12, height=12, max_bounce=2)
    _check(r.render(spp=2))


@pytest.mark.slow
def test_instanced_wavefront_config(tmp_path):
    # config 4/5 family: instanced scene through the wavefront backend
    scene, cam = sphere_grid(2, 2, stacks=6, slices=8)
    r = Renderer(scene, cam, width=12, height=12, max_bounce=2,
                 integrator="wavefront")
    _check(r.render(spp=2))


@pytest.mark.slow
def test_mitsuba_xml_end_to_end(tmp_path):
    # XML ingestion -> camera/film/filter settings -> render
    xml = textwrap.dedent("""\
        <scene version="3.0.0">
          <integrator type="path"><integer name="max_depth" value="3"/></integrator>
          <sensor type="perspective">
            <float name="fov" value="40"/>
            <transform name="to_world">
              <lookat origin="0, 1, -4" target="0, 0.5, 0" up="0, 1, 0"/>
            </transform>
            <film type="hdrfilm">
              <integer name="width" value="12"/>
              <integer name="height" value="12"/>
              <rfilter type="box"/>
            </film>
          </sensor>
          <bsdf type="diffuse" id="white">
            <rgb name="reflectance" value="0.7 0.7 0.7"/>
          </bsdf>
          <shape type="rectangle">
            <transform name="to_world">
              <rotate x="1" angle="-90"/>
              <scale value="4"/>
            </transform>
            <ref id="white"/>
          </shape>
          <shape type="rectangle">
            <transform name="to_world">
              <rotate x="1" angle="90"/>
              <translate y="3"/>
            </transform>
            <ref id="white"/>
            <emitter type="area"><rgb name="radiance" value="8 8 8"/></emitter>
          </shape>
        </scene>
        """)
    p = tmp_path / "scene.xml"
    p.write_text(xml)

    from directcomputeraytracing_tpu.scene.xml_loader import load_mitsuba_xml

    scene, settings = load_mitsuba_xml(str(p))
    r = Renderer(scene, settings.camera, width=settings.width,
                 height=settings.height,
                 max_bounce=max(settings.max_depth - 1, 0))
    _check(r.render(spp=4))

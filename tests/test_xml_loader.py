"""Mitsuba 3.0 XML ingestion tests (reference behavior:
Source/SceneXMLLoading.cpp — transforms, bsdf translation, shapes,
emitters, defaults)."""

import textwrap

import numpy as np
import pytest

from directcomputeraytracing_tpu.core.constants import (
    MATERIAL_TYPE_CONDUCTOR,
    MATERIAL_TYPE_DIELECTRIC,
    MATERIAL_TYPE_DIFFUSE,
    MATERIAL_TYPE_PLASTIC,
)
from directcomputeraytracing_tpu.scene.scene import flatten_scene
from directcomputeraytracing_tpu.scene.xml_loader import load_mitsuba_xml

XML = textwrap.dedent("""\
    <scene version="3.0.0">
      <default name="spp" value="64"/>
      <default name="res" value="128"/>
      <integrator type="path"><integer name="max_depth" value="7"/></integrator>
      <sensor type="perspective">
        <float name="fov" value="45"/>
        <string name="fov_axis" value="x"/>
        <transform name="to_world">
          <lookat origin="0, 1, -4" target="0, 1, 0" up="0, 1, 0"/>
        </transform>
        <film type="hdrfilm">
          <integer name="width" value="$res"/>
          <integer name="height" value="$res"/>
          <rfilter type="gaussian"/>
        </film>
      </sensor>
      <bsdf type="twosided" id="wall">
        <bsdf type="diffuse"><rgb name="reflectance" value="0.7 0.6 0.5"/></bsdf>
      </bsdf>
      <bsdf type="roughconductor" id="metal">
        <float name="alpha" value="0.04"/>
        <rgb name="eta" value="0.2 0.9 1.1"/>
        <rgb name="k" value="3.9 2.4 2.1"/>
      </bsdf>
      <bsdf type="dielectric" id="glass">
        <float name="int_ior" value="1.5"/>
      </bsdf>
      <bsdf type="roughplastic" id="shiny">
        <float name="alpha" value="0.09"/>
        <rgb name="diffuse_reflectance" value="0.2 0.3 0.4"/>
      </bsdf>
      <shape type="rectangle">
        <transform name="to_world">
          <scale value="2"/>
          <translate y="3"/>
        </transform>
        <ref id="wall"/>
        <emitter type="area"><rgb name="radiance" value="10 8 6"/></emitter>
      </shape>
      <shape type="rectangle">
        <ref id="metal"/>
      </shape>
      <emitter type="constant"><rgb name="radiance" value="0.2 0.3 0.4"/></emitter>
      <emitter type="directional">
        <vector name="direction" x="1" y="-1" z="0"/>
        <rgb name="irradiance" value="2 2 2"/>
      </emitter>
    </scene>
    """)


@pytest.fixture()
def loaded(tmp_path):
    p = tmp_path / "scene.xml"
    p.write_text(XML)
    return load_mitsuba_xml(str(p))


def test_settings(loaded):
    scene, settings = loaded
    assert settings.max_depth == 7
    assert settings.width == settings.height == 128     # $res default
    assert settings.filter_type == "gaussian"
    np.testing.assert_allclose(settings.fov, np.deg2rad(45))


def test_camera_transform_lhs(loaded):
    scene, settings = loaded
    cam = np.asarray(settings.camera.transform)
    # camera at origin (0,1,-4): RHS->LHS flips x of the position row
    np.testing.assert_allclose(cam[3, :3], [0.0, 1.0, -4.0], atol=1e-5)
    # forward row (row 2) points toward +z
    assert cam[2, 2] > 0.9


def test_materials(loaded):
    scene, settings = loaded
    mats = {m.name: m for m in scene.materials}
    assert mats["wall"].mtype == MATERIAL_TYPE_DIFFUSE
    assert mats["wall"].two_sided
    np.testing.assert_allclose(mats["wall"].albedo, (0.7, 0.6, 0.5))
    m = mats["metal"]
    assert m.mtype == MATERIAL_TYPE_CONDUCTOR
    np.testing.assert_allclose(m.roughness, 0.2)        # sqrt(0.04)
    g = mats["glass"]
    assert g.mtype == MATERIAL_TYPE_DIELECTRIC
    np.testing.assert_allclose(g.ior[0], 1.5 / 1.000277, rtol=1e-5)
    assert g.roughness == 0.0
    s = mats["shiny"]
    assert s.mtype == MATERIAL_TYPE_PLASTIC
    np.testing.assert_allclose(s.roughness, 0.3)


def test_shapes_and_emitter(loaded):
    scene, settings = loaded
    # one shared rectangle mesh, two instances
    assert len(scene.meshes) == 1
    assert len(scene.instances) == 2
    lamp = scene.instances[0]
    assert lamp.is_emitter
    np.testing.assert_allclose(lamp.radiance, (10, 8, 6))
    # scale 2 then translate y=3, with LHS x-negation on the first column
    tf = lamp.transform
    np.testing.assert_allclose(tf[0], [-2, 0, 0], atol=1e-6)
    np.testing.assert_allclose(tf[3], [0, 3, 0], atol=1e-6)


def test_punctual_lights(loaded):
    scene, settings = loaded
    kinds = sorted(l.kind for l in scene.lights)
    assert kinds == ["directional", "env"]
    d = next(l for l in scene.lights if l.kind == "directional")
    # direction x flipped and normalized
    np.testing.assert_allclose(
        d.position, np.asarray([-1, -1, 0]) / np.sqrt(2), atol=1e-6)


def test_flattens(loaded):
    scene, settings = loaded
    arrays, meta = flatten_scene(scene)
    assert meta.light_count == 3    # env + directional + mesh light
    assert meta.env_light_index >= 0


TEXTURED_XML = textwrap.dedent("""\
    <scene version="3.0.0">
      <texture type="bitmap" id="shared_tex">
        <string name="filename" value="albedo.png"/>
      </texture>
      <bsdf type="diffuse" id="painted">
        <texture type="bitmap" name="reflectance">
          <string name="filename" value="albedo.png"/>
        </texture>
      </bsdf>
      <bsdf type="plastic" id="painted_ref">
        <ref name="diffuse_reflectance" id="shared_tex"/>
      </bsdf>
      <bsdf type="mask" id="leaf">
        <texture type="bitmap" name="opacity">
          <string name="filename" value="alpha.png"/>
        </texture>
        <bsdf type="diffuse"><rgb name="reflectance" value="0.2 0.6 0.2"/></bsdf>
      </bsdf>
      <bsdf type="mask" id="fence">
        <float name="opacity" value="0.25"/>
        <bsdf type="diffuse"><rgb name="reflectance" value="0.5 0.5 0.5"/></bsdf>
      </bsdf>
      <shape type="rectangle"><ref id="painted"/></shape>
      <shape type="rectangle"><ref id="painted_ref"/></shape>
      <shape type="rectangle"><ref id="leaf"/></shape>
    </scene>
    """)


@pytest.fixture()
def textured(tmp_path):
    from PIL import Image

    a = np.zeros((4, 8, 3), np.uint8)
    a[..., 0] = 255                      # pure red albedo
    Image.fromarray(a, "RGB").save(tmp_path / "albedo.png")
    o = np.zeros((4, 4), np.uint8)
    o[:2] = 255                          # top half opaque
    Image.fromarray(o, "L").save(tmp_path / "alpha.png")
    p = tmp_path / "scene.xml"
    p.write_text(TEXTURED_XML)
    return load_mitsuba_xml(str(p))


def test_bitmap_albedo_texture(textured):
    """Inline bitmap reflectance -> texture index + white-albedo bypass
    (reference: SceneXMLLoading.cpp:989)."""
    scene, settings = textured
    mats = {m.name: m for m in scene.materials}
    m = mats["painted"]
    assert m.albedo_texture >= 0
    np.testing.assert_allclose(m.albedo, (1.0, 1.0, 1.0))
    tex = scene.textures[m.albedo_texture]
    assert tex.shape == (4, 8, 4)
    np.testing.assert_allclose(tex[0, 0, :3], (1.0, 0.0, 0.0), atol=1e-6)


def test_bitmap_texture_ref_dedup(textured):
    """<ref> to a named texture resolves, and same-file textures dedup
    to one atlas layer (reference dedups via GetOrAddTexture)."""
    scene, settings = textured
    mats = {m.name: m for m in scene.materials}
    assert mats["painted_ref"].albedo_texture == \
        mats["painted"].albedo_texture
    assert len(scene.textures) == 2      # albedo.png + alpha.png


def test_bitmap_opacity_mask(textured):
    """mask with a bitmap opacity -> opacity texture index with the
    scalar bypassed to 1 (reference: SceneXMLLoading.cpp:766); scalar
    masks keep the scalar path."""
    scene, settings = textured
    mats = {m.name: m for m in scene.materials}
    leaf = mats["leaf"]
    assert leaf.opacity_texture >= 0
    assert leaf.opacity == 1.0
    np.testing.assert_allclose(leaf.albedo, (0.2, 0.6, 0.2))
    tex = scene.textures[leaf.opacity_texture]
    assert tex[0, 0, 0] > 0.9 and tex[3, 0, 0] < 1e-6
    fence = mats["fence"]
    assert fence.opacity_texture == -1
    np.testing.assert_allclose(fence.opacity, 0.25)


def test_textured_mask_flattens_alpha(textured):
    scene, settings = textured
    arrays, meta = flatten_scene(scene)
    assert meta.any_opacity_texture
    assert int(arrays.mat_opacity_tex.max()) >= 0

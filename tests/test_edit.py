"""Headless scene-edit API: SceneArrays updates == a fresh re-flatten.

The reference edits materials/lights/instance overrides per frame
without rebuilding the scene (Source/Scene.cpp:672-807); `scene.edit`
must produce bit-for-bit the arrays a full `flatten_scene` of the
edited host scene would."""

import copy

import numpy as np
import pytest

from directcomputeraytracing_tpu.integrator.renderer import Renderer
from directcomputeraytracing_tpu.scene.edit import (
    light_index_of,
    update_emitter_radiance,
    update_instance_override,
    update_light,
    update_material,
)
from directcomputeraytracing_tpu.scene.presets import cornell_box
from directcomputeraytracing_tpu.scene.scene import flatten_scene


def _scene_with_alpha():
    scene, cam = cornell_box(light="area")
    # give the flatten a non-opaque material so the alpha tables and
    # compile branches exist (edit.py caveat)
    scene.materials[1].opacity = 0.6
    return scene, cam


FIELDS = [
    ("albedo", (0.1, 0.6, 0.2)),
    ("roughness", 0.37),
    ("ior", (1.9, 1.9, 1.9)),
    ("tiling", (2.0, 3.0)),
    ("opacity", 0.25),
]


@pytest.mark.parametrize("field,value", FIELDS, ids=[f[0] for f in FIELDS])
def test_update_material_matches_reflatten(field, value):
    scene, _cam = _scene_with_alpha()
    arrays, _ = flatten_scene(copy.deepcopy(scene))
    edited = update_material(arrays, 2, **{field: value})

    setattr(scene.materials[2], field, value)
    ref, _ = flatten_scene(scene)
    for name in ("mat_table", "mat_albedo", "mat_ior", "mat_roughness",
                 "mat_tiling", "mat_opacity", "tri_opacity",
                 "world_tri_opacity", "instance_flags"):
        np.testing.assert_array_equal(
            np.asarray(getattr(edited, name)),
            np.asarray(getattr(ref, name)), err_msg=name)


def test_update_light_matches_reflatten():
    scene, _cam = cornell_box(light="point")
    arrays, _ = flatten_scene(copy.deepcopy(scene))
    edited = update_light(arrays, 0, radiance=(5.0, 4.0, 3.0),
                          position=(0.1, 4.0, 0.2))
    scene.lights[0].radiance = (5.0, 4.0, 3.0)
    scene.lights[0].position = (0.1, 4.0, 0.2)
    ref, _ = flatten_scene(scene)
    np.testing.assert_array_equal(np.asarray(edited.light_radiance),
                                  np.asarray(ref.light_radiance))
    np.testing.assert_array_equal(np.asarray(edited.light_position),
                                  np.asarray(ref.light_position))


def test_update_instance_override_matches_reflatten():
    scene, _cam = _scene_with_alpha()
    arrays, _ = flatten_scene(copy.deepcopy(scene))
    edited = update_instance_override(arrays, 1, 1)   # non-opaque mat
    scene.instances[1].material_override = 1
    ref, _ = flatten_scene(scene)
    for name in ("instance_material_overrides", "instance_flags",
                 "world_tri_opacity"):
        np.testing.assert_array_equal(
            np.asarray(getattr(edited, name)),
            np.asarray(getattr(ref, name)), err_msg=name)
    # clearing restores the original tables
    cleared = update_instance_override(edited, 1, -1)
    orig, _ = flatten_scene(_scene_with_alpha()[0])
    for name in ("instance_material_overrides", "instance_flags",
                 "world_tri_opacity"):
        np.testing.assert_array_equal(
            np.asarray(getattr(cleared, name)),
            np.asarray(getattr(orig, name)), err_msg=name)


def test_update_emitter_radiance():
    scene, _cam = cornell_box(light="area")
    arrays, _ = flatten_scene(scene)
    em = next(i for i, inst in enumerate(scene.instances)
              if inst.is_emitter)
    li = light_index_of(arrays, em)
    assert li is not None
    edited = update_emitter_radiance(arrays, em, (9.0, 8.0, 7.0))
    np.testing.assert_allclose(np.asarray(edited.light_radiance[li]),
                               (9.0, 8.0, 7.0))
    # non-emitter: no-op
    non_em = next(i for i, inst in enumerate(scene.instances)
                  if not inst.is_emitter)
    same = update_emitter_radiance(arrays, non_em, (9.0, 8.0, 7.0))
    np.testing.assert_array_equal(np.asarray(same.light_radiance),
                                  np.asarray(arrays.light_radiance))


@pytest.mark.slow
def test_renderer_edit_equals_fresh_renderer():
    """An edited renderer renders EXACTLY what a renderer built from
    the edited scene renders (same seeds), with no re-flatten."""
    scene, cam = cornell_box(light="area")
    r = Renderer(scene, cam, width=32, height=32, max_bounce=2)
    before = r.render(spp=1, seed_mode="fixed")
    r.set_material(2, albedo=(0.9, 0.1, 0.1))
    assert r.spp == 0   # edits dirty the film
    after = r.render(spp=1, seed_mode="fixed")
    assert np.abs(after - before).max() > 1e-4

    scene2, cam2 = cornell_box(light="area")
    scene2.materials[2].albedo = (0.9, 0.1, 0.1)
    fresh = Renderer(scene2, cam2, width=32, height=32,
                     max_bounce=2).render(spp=1, seed_mode="fixed")
    np.testing.assert_array_equal(after, fresh)


def test_renderer_light_edit_scales_radiance():
    scene, cam = cornell_box(light="point")
    r = Renderer(scene, cam, width=32, height=32, max_bounce=2)
    base = r.render(spp=1, seed_mode="fixed")
    rad = np.asarray(scene.lights[0].radiance) * 2.0
    r.set_light(0, radiance=tuple(rad))
    doubled = r.render(spp=1, seed_mode="fixed")
    # direct lighting scales linearly with the only light's radiance
    lit = base.sum(-1) > 1e-6
    ratio = doubled.sum(-1)[lit] / base.sum(-1)[lit]
    np.testing.assert_allclose(ratio, 2.0, rtol=1e-4)

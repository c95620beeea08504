"""Physics-level integrator tests: watertight intersection agreement and
the white-furnace energy test (SURVEY.md §4: statistical validation the
reference never had)."""

import numpy as np
import jax.numpy as jnp
import pytest

from directcomputeraytracing_tpu.accel.traverse import intersect_closest
from directcomputeraytracing_tpu.core.types import CameraParams
from directcomputeraytracing_tpu.camera.camera import look_at_transform
from directcomputeraytracing_tpu.integrator.common import RenderConfig
from directcomputeraytracing_tpu.integrator.megakernel import (
    full_frame_pixels, render_samples,
)
from directcomputeraytracing_tpu.lut.textures import placeholder_luts
from directcomputeraytracing_tpu.scene.presets import cornell_box, uv_sphere
from directcomputeraytracing_tpu.scene.scene import (
    Instance, Material, Mesh, PunctualLight, Scene, flatten_scene,
)


def test_watertight_agrees_with_moeller():
    scene, cam = cornell_box(light="area")
    arrays, meta = flatten_scene(scene)
    rng = np.random.default_rng(4)
    R = 1024
    o = rng.uniform(-0.9, 0.9, (R, 3)).astype(np.float32)
    o[:, 1] += 1.0
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    a = intersect_closest(arrays, jnp.asarray(o), jnp.asarray(d),
                          meta.stack_size, backend="jax", watertight=False)
    b = intersect_closest(arrays, jnp.asarray(o), jnp.asarray(d),
                          meta.stack_size, backend="jax", watertight=True)
    am = np.asarray(a.hit)
    bm = np.asarray(b.hit)
    # edge rays may differ; bulk must agree
    assert (am == bm).mean() > 0.999
    both = am & bm
    np.testing.assert_allclose(np.asarray(b.t)[both], np.asarray(a.t)[both],
                               rtol=1e-3, atol=1e-4)
    assert (np.asarray(a.backface)[both]
            == np.asarray(b.backface)[both]).all()


@pytest.fixture(scope="module")
def furnace():
    """Unit diffuse sphere, albedo 1, inside a constant radiance-1 env."""
    sv, si = uv_sphere(stacks=12, slices=16)
    mesh = Mesh(positions=sv, indices=si,
                material_ids=np.zeros(len(si), np.int64), name="sphere")
    scene = Scene(
        meshes=[mesh], instances=[Instance(mesh=0)],
        materials=[Material(albedo=(1.0, 1.0, 1.0), roughness=1.0)],
        lights=[PunctualLight(kind="env", radiance=(1.0, 1.0, 1.0))])
    cam = CameraParams.create(
        transform=look_at_transform((0.0, 0.0, -3.0), (0.0, 0.0, 0.0)),
        fov_x=np.deg2rad(40.0))
    return scene, cam


@pytest.mark.slow
def test_white_furnace(furnace):
    """A perfectly white diffuse object in a uniform radiance-1 furnace
    must reflect radiance 1 (energy conservation of Lambert + NEE + MIS +
    env sampling together). Bounce truncation loses a little."""
    scene, cam = furnace
    arrays, meta = flatten_scene(scene)
    cfg = RenderConfig(width=24, height=24, max_bounce=16,
                       stack_size=meta.stack_size,
                       light_count=meta.light_count,
                       env_light_index=meta.env_light_index,
                       has_env_texture=False)
    px, py = full_frame_pixels(cfg)
    luts = placeholder_luts()
    acc = np.zeros((px.shape[0], 3), np.float32)
    spp = 24
    for s in range(spp):
        _, v = render_samples(arrays, luts, cam, cfg, px, py,
                              jnp.uint32(s))
        acc += np.asarray(v)
    img = acc / spp
    # every pixel (sphere or background env) integrates to ~1
    assert np.isfinite(img).all()
    mean = img.mean()
    assert 0.95 < mean < 1.05, f"furnace mean {mean}"
    # no pixel should exceed 1 by much or collapse to 0
    assert img.mean(axis=-1).min() > 0.6
    assert img.max() < 1.6


@pytest.mark.slow
def test_thin_lens_bokeh_render():
    """Thin-lens + polygonal bokeh camera renders finite, nonzero images
    and produces defocus (variance differs from the pinhole render)."""
    import numpy as np
    import jax.numpy as jnp
    from directcomputeraytracing_tpu.scene.presets import cornell_box
    from directcomputeraytracing_tpu.scene.scene import flatten_scene
    from directcomputeraytracing_tpu.camera.camera import look_at_transform
    from directcomputeraytracing_tpu.core.types import CameraParams
    from directcomputeraytracing_tpu.integrator.megakernel import (
        full_frame_pixels, render_samples,
    )
    from directcomputeraytracing_tpu.lut.textures import placeholder_luts

    scene, _ = cornell_box(light="point")
    arrays, meta = flatten_scene(scene)
    tf = look_at_transform((0.0, 1.0, -3.6), (0.0, 1.0, 0.0))
    pin = CameraParams.create(transform=tf, fov_x=np.deg2rad(38.0),
                              focal_distance=3.6)
    lens = CameraParams.create(transform=tf, fov_x=np.deg2rad(38.0),
                               aperture_radius=0.15, focal_distance=2.0,
                               blade_count=6)
    from directcomputeraytracing_tpu.integrator.common import RenderConfig

    cfg = RenderConfig(width=24, height=24, max_bounce=1,
                       stack_size=meta.stack_size,
                       light_count=meta.light_count)
    px, py = full_frame_pixels(cfg)
    luts = placeholder_luts()

    def render(cam, spp=8):
        acc = 0.0
        for s in range(spp):
            _, v = render_samples(arrays, luts, cam, cfg, px, py,
                                  jnp.uint32(s))
            acc = acc + np.asarray(v)
        return (acc / spp).reshape(24, 24, 3)

    a = render(pin)
    b = render(lens)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert a.max() > 0 and b.max() > 0
    # defocus blurs edges: high-frequency energy (gradient magnitude)
    # must drop with the wide aperture focused off the walls
    ga = np.abs(np.diff(a.mean(-1), axis=1)).mean()
    gb = np.abs(np.diff(b.mean(-1), axis=1)).mean()
    assert gb < ga

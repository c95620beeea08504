"""End-to-end megakernel render tests on the Cornell box."""

import numpy as np
import pytest

from directcomputeraytracing_tpu.integrator.renderer import Renderer
from directcomputeraytracing_tpu.scene.presets import cornell_box


@pytest.fixture(scope="module")
def cornell_point_render():
    scene, cam = cornell_box(light="point")
    r = Renderer(scene, cam, width=64, height=64, max_bounce=2)
    img = r.render(spp=4)
    return img


def test_image_finite_and_lit(cornell_point_render):
    img = cornell_point_render
    assert np.isfinite(img).all()
    assert img.max() > 0.01, "image should not be black"
    # a majority of pixels see the box interior
    assert (img.sum(-1) > 0).mean() > 0.5


def test_color_bleeding_walls(cornell_point_render):
    img = cornell_point_render
    h, w, _ = img.shape
    left = img[h // 2, 2:8].mean(axis=0)    # red wall region
    right = img[h // 2, -8:-2].mean(axis=0)  # green wall region
    assert left[0] > left[1] * 1.5, f"left wall should be red: {left}"
    assert right[1] > right[0] * 1.5, f"right wall should be green: {right}"


def test_deterministic_at_fixed_seed():
    scene, cam = cornell_box(light="point")
    imgs = []
    for _ in range(2):
        r = Renderer(scene, cam, width=32, height=32, max_bounce=2)
        imgs.append(r.render(spp=2, seed_mode="fixed", fixed_seed=42))
    np.testing.assert_array_equal(imgs[0], imgs[1])


@pytest.mark.slow
def test_area_light_render():
    scene, cam = cornell_box(light="area")
    r = Renderer(scene, cam, width=48, height=48, max_bounce=3)
    img = r.render(spp=4)
    assert np.isfinite(img).all()
    assert img.max() > 0.05
    # ceiling region (top rows) should include the bright lamp
    assert img[:10].max() > img.mean()


@pytest.mark.slow
def test_megakernel_slab_march_matches_single_cast():
    """cfg.slab_march on the megakernel (primary + sorted extension
    casts through intersect_closest_slab) reproduces the single-cast
    image."""
    import jax.numpy as jnp
    import numpy as np

    from directcomputeraytracing_tpu.integrator.common import RenderConfig
    from directcomputeraytracing_tpu.integrator.megakernel import (
        full_frame_pixels, render_samples,
    )
    from directcomputeraytracing_tpu.lut.textures import placeholder_luts
    from directcomputeraytracing_tpu.scene.presets import sphere_grid
    from directcomputeraytracing_tpu.scene.scene import flatten_scene

    scene, cam = sphere_grid(3, 3, stacks=12, slices=16)
    arrays, meta = flatten_scene(scene)
    kw = dict(width=16, height=16, max_bounce=2,
              stack_size=meta.stack_size, light_count=meta.light_count,
              traversal_backend="pallas_wl_interpret",
              sort_bounce_rays=True)
    px, py = full_frame_pixels(RenderConfig(**kw))
    luts = placeholder_luts()
    _, val_a = render_samples(arrays, luts, cam, RenderConfig(**kw),
                              px, py, jnp.uint32(3))
    _, val_b = render_samples(arrays, luts, cam,
                              RenderConfig(slab_march=0.22, **kw),
                              px, py, jnp.uint32(3))
    np.testing.assert_allclose(np.asarray(val_b), np.asarray(val_a),
                               rtol=1e-5, atol=1e-6)

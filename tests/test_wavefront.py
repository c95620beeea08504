"""Wavefront vs megakernel: the reference's mutual-oracle property.

Both backends derive each pixel's sample stream from the same counter
seed (reference: Samples.inc.hlsl:59-70), so at a fixed frame seed they
produce identical per-pixel samples. The TPU build preserves this: the
wavefront pool executes the megakernel's per-path arithmetic op-for-op.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from directcomputeraytracing_tpu.integrator.common import RenderConfig
from directcomputeraytracing_tpu.integrator.megakernel import (
    full_frame_pixels, render_samples,
)
from directcomputeraytracing_tpu.integrator.wavefront import (
    render_samples_wavefront,
)
from directcomputeraytracing_tpu.lut.textures import placeholder_luts
from directcomputeraytracing_tpu.scene.presets import cornell_box
from directcomputeraytracing_tpu.scene.scene import flatten_scene


def _both(material_set, light, pool_size, seed=3, size=24):
    scene, cam = cornell_box(light=light, material_set=material_set)
    arrays, meta = flatten_scene(scene)
    cfg = RenderConfig(width=size, height=size, max_bounce=3,
                       stack_size=meta.stack_size,
                       light_count=meta.light_count)
    px, py = full_frame_pixels(cfg)
    luts = placeholder_luts()
    pos_m, val_m = render_samples(arrays, luts, cam, cfg, px, py,
                                  jnp.uint32(seed))
    pos_w, val_w = render_samples_wavefront(arrays, luts, cam, cfg, px, py,
                                            jnp.uint32(seed),
                                            pool_size=pool_size)
    return (np.asarray(pos_m), np.asarray(val_m),
            np.asarray(pos_w), np.asarray(val_w))


@pytest.mark.parametrize("material_set", [
    "diffuse", pytest.param("glossy", marks=pytest.mark.slow),
    pytest.param("dielectric", marks=pytest.mark.slow)])
def test_wavefront_matches_megakernel(material_set):
    pos_m, val_m, pos_w, val_w = _both(material_set, "area", pool_size=None)
    np.testing.assert_array_equal(pos_w, pos_m)
    np.testing.assert_allclose(val_w, val_m, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_wavefront_small_pool_streams_pixels():
    # pool smaller than the frame: the block cursor must stream every
    # pixel through the pool (reference: g_NextBlockIndex pull loop)
    pos_m, val_m, pos_w, val_w = _both("diffuse", "point", pool_size=128)
    np.testing.assert_array_equal(pos_w, pos_m)
    np.testing.assert_allclose(val_w, val_m, rtol=1e-5, atol=1e-6)


def test_chunked_dispatch_matches_whole():
    """The host-chunked streaming driver (reference IterationPerFrame
    parity) must produce bit-identical samples to the fused
    single-dispatch loop."""
    import jax.numpy as jnp
    import numpy as np

    from directcomputeraytracing_tpu.integrator.common import RenderConfig
    from directcomputeraytracing_tpu.integrator.megakernel import (
        full_frame_pixels,
    )
    from directcomputeraytracing_tpu.integrator.wavefront import (
        render_samples_wavefront,
    )
    from directcomputeraytracing_tpu.lut.textures import placeholder_luts
    from directcomputeraytracing_tpu.scene.presets import cornell_box
    from directcomputeraytracing_tpu.scene.scene import flatten_scene

    scene, cam = cornell_box(light="area")
    arrays, meta = flatten_scene(scene)
    cfg = RenderConfig(width=24, height=24, max_bounce=3,
                       stack_size=meta.stack_size,
                       light_count=meta.light_count)
    px, py = full_frame_pixels(cfg)
    luts = placeholder_luts()
    pos_a, val_a = render_samples_wavefront(
        arrays, luts, cam, cfg, px, py, jnp.uint32(7), pool_size=128)
    pos_b, val_b = render_samples_wavefront(
        arrays, luts, cam, cfg, px, py, jnp.uint32(7), pool_size=128,
        iterations_per_dispatch=3)
    np.testing.assert_array_equal(np.asarray(val_a), np.asarray(val_b))
    np.testing.assert_array_equal(np.asarray(pos_a), np.asarray(pos_b))


def test_sorted_pool_matches_unsorted():
    """Pool coherence sorting (octant+Morton re-order before each cast)
    re-orders lanes only; every path's samples and radiance must come
    out identical."""
    scene, cam = cornell_box(light="area")
    arrays, meta = flatten_scene(scene)
    kw = dict(width=24, height=24, max_bounce=3,
              stack_size=meta.stack_size, light_count=meta.light_count)
    px, py = full_frame_pixels(RenderConfig(**kw))
    luts = placeholder_luts()
    pos_a, val_a = render_samples_wavefront(
        arrays, luts, cam, RenderConfig(**kw), px, py, jnp.uint32(5),
        pool_size=128)
    pos_b, val_b = render_samples_wavefront(
        arrays, luts, cam, RenderConfig(sort_bounce_rays=True, **kw),
        px, py, jnp.uint32(5), pool_size=128)
    np.testing.assert_array_equal(np.asarray(pos_a), np.asarray(pos_b))
    np.testing.assert_array_equal(np.asarray(val_a), np.asarray(val_b))


@pytest.mark.slow
def test_megakernel_pixel_chunking_is_identical():
    """Tile-chunked megakernel dispatches (the reference's 512^2 tile
    round-robin) must be bit-identical to the whole-frame dispatch."""
    from directcomputeraytracing_tpu.integrator.megakernel import (
        render_samples_accumulated,
        render_samples_accumulated_chunked,
        render_samples_chunked,
    )

    scene, cam = cornell_box(light="area")
    arrays, meta = flatten_scene(scene)
    cfg = RenderConfig(width=24, height=24, max_bounce=3,
                       stack_size=meta.stack_size,
                       light_count=meta.light_count)
    px, py = full_frame_pixels(cfg)
    luts = placeholder_luts()
    pos_a, val_a = render_samples(arrays, luts, cam, cfg, px, py,
                                  jnp.uint32(9))
    pos_b, val_b = render_samples_chunked(arrays, luts, cam, cfg, px,
                                          py, jnp.uint32(9), 100)
    # positions are raw RNG draws -> exact; radiance goes through fp
    # chains XLA may fuse differently per batch shape -> tight allclose
    np.testing.assert_array_equal(np.asarray(pos_a), np.asarray(pos_b))
    np.testing.assert_allclose(np.asarray(val_a), np.asarray(val_b),
                               rtol=1e-6, atol=1e-7)

    acc_a = render_samples_accumulated(arrays, luts, cam, cfg, px, py,
                                       jnp.uint32(2), 3)
    acc_b = render_samples_accumulated_chunked(
        arrays, luts, cam, cfg, px, py, jnp.uint32(2), 3, 128)
    # XLA may fuse fp chains differently per batch shape; tight allclose
    np.testing.assert_allclose(np.asarray(acc_a), np.asarray(acc_b),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_spp_batch_equals_sequential_sum():
    """spp_batch=S in one pool pass must reproduce the SUM of S
    sequential progressive passes bit-for-bit (lane seed = base + s is
    the megakernel fusion's seed schedule)."""
    scene, cam = cornell_box(light="area")
    arrays, meta = flatten_scene(scene)
    cfg = RenderConfig(width=16, height=16, max_bounce=3,
                       stack_size=meta.stack_size,
                       light_count=meta.light_count)
    px, py = full_frame_pixels(cfg)
    luts = placeholder_luts()
    acc = None
    for s in range(4):
        _, v = render_samples_wavefront(arrays, luts, cam, cfg, px, py,
                                        jnp.uint32(10 + s))
        acc = v if acc is None else acc + v
    _, batched = render_samples_wavefront(arrays, luts, cam, cfg, px,
                                          py, jnp.uint32(10),
                                          spp_batch=4)
    np.testing.assert_allclose(np.asarray(batched), np.asarray(acc),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_spp_batch_chunked_matches_fused():
    scene, cam = cornell_box(light="area")
    arrays, meta = flatten_scene(scene)
    cfg = RenderConfig(width=16, height=16, max_bounce=2,
                       stack_size=meta.stack_size,
                       light_count=meta.light_count)
    px, py = full_frame_pixels(cfg)
    luts = placeholder_luts()
    _, a = render_samples_wavefront(arrays, luts, cam, cfg, px, py,
                                    jnp.uint32(5), spp_batch=3)
    _, b = render_samples_wavefront(arrays, luts, cam, cfg, px, py,
                                    jnp.uint32(5), spp_batch=3,
                                    iterations_per_dispatch=4)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_slab_march_matches_single_cast():
    """Distance-slab two-phase casting (cfg.slab_march) is a pure
    traversal-scheduling change: phase 1 capped at D plus a full-window
    re-cast of the compacted remainder must reproduce the single-cast
    image (same RNG streams; hits merge exactly, up to packed-argmin
    quantum ties at the slab boundary)."""
    from directcomputeraytracing_tpu.scene.presets import sphere_grid
    from directcomputeraytracing_tpu.scene.scene import flatten_scene

    scene, cam = sphere_grid(3, 3, stacks=12, slices=16)
    arrays, meta = flatten_scene(scene)
    assert arrays.cluster_bbox.shape[0] > 1
    kw = dict(width=16, height=16, max_bounce=2,
              stack_size=meta.stack_size, light_count=meta.light_count,
              traversal_backend="pallas_wl_interpret",
              sort_bounce_rays=True)
    px, py = full_frame_pixels(RenderConfig(**kw))
    luts = placeholder_luts()
    pos_a, val_a = render_samples_wavefront(
        arrays, luts, cam, RenderConfig(**kw), px, py, jnp.uint32(5),
        pool_size=256)
    pos_b, val_b = render_samples_wavefront(
        arrays, luts, cam, RenderConfig(slab_march=0.22, **kw), px, py,
        jnp.uint32(5), pool_size=256)
    np.testing.assert_array_equal(np.asarray(pos_a), np.asarray(pos_b))
    np.testing.assert_allclose(np.asarray(val_a), np.asarray(val_b),
                               rtol=1e-5, atol=1e-6)

@pytest.mark.slow
def test_pool_backend_pair_matches_bundle():
    """cfg.pool_backend='pallas_pair_interpret' (the pair-expanded
    pool sweep) is a pure traversal-scheduling change: same hits, same
    RNG streams, same image as the bundle work-list pool casts."""
    from directcomputeraytracing_tpu.scene.presets import sphere_grid
    from directcomputeraytracing_tpu.scene.scene import flatten_scene

    scene, cam = sphere_grid(3, 3, stacks=12, slices=16)
    arrays, meta = flatten_scene(scene)
    assert arrays.cluster_bbox.shape[0] > 1
    kw = dict(width=16, height=16, max_bounce=2,
              stack_size=meta.stack_size, light_count=meta.light_count,
              traversal_backend="pallas_wl_interpret",
              sort_bounce_rays=True)
    px, py = full_frame_pixels(RenderConfig(**kw))
    luts = placeholder_luts()
    pos_a, val_a = render_samples_wavefront(
        arrays, luts, cam, RenderConfig(**kw), px, py, jnp.uint32(5),
        pool_size=256)
    pos_b, val_b = render_samples_wavefront(
        arrays, luts, cam,
        RenderConfig(pool_backend="pallas_pair_interpret", **kw), px,
        py, jnp.uint32(5), pool_size=256)
    np.testing.assert_array_equal(np.asarray(pos_a), np.asarray(pos_b))
    np.testing.assert_allclose(np.asarray(val_a), np.asarray(val_b),
                               rtol=1e-4, atol=1e-5)


def test_wavefront_filtered_spp_batch_matches_sequential():
    """Splatting-film wavefront fusion: spp_batch with per-sample
    output slots + per-sample convolution must equal the per-sample
    passes AND the megakernel under the same gaussian filter
    (reference: per-sample position textures convolved by
    SampleConvolution.cpp:89-170)."""
    from directcomputeraytracing_tpu.integrator.renderer import (
        Renderer,
    )

    scene, cam = cornell_box(light="area")
    kw = dict(width=48, height=32, max_bounce=2,
              integrator="wavefront", filter_type="gaussian",
              filter_radius=1.5)
    r1 = Renderer(scene, cam, **kw)
    img1 = np.asarray(r1.render(spp=4, samples_per_dispatch=4))
    r2 = Renderer(scene, cam, **kw)
    img2 = np.asarray(r2.render(spp=4, samples_per_dispatch=1))
    np.testing.assert_allclose(img1, img2, atol=1e-5)


@pytest.mark.slow
def test_wavefront_filtered_spp_batch_matches_megakernel():
    """Cross-integrator half of the splatting-film gate (the fast half
    above checks fused == sequential within the wavefront)."""
    from directcomputeraytracing_tpu.integrator.renderer import (
        Renderer,
    )

    scene, cam = cornell_box(light="area")
    kw = dict(width=48, height=32, max_bounce=2,
              filter_type="gaussian", filter_radius=1.5)
    r1 = Renderer(scene, cam, integrator="wavefront", **kw)
    img1 = np.asarray(r1.render(spp=4, samples_per_dispatch=4))
    r3 = Renderer(scene, cam, integrator="megakernel", **kw)
    img3 = np.asarray(r3.render(spp=4))
    np.testing.assert_allclose(img1, img3, atol=1e-4)

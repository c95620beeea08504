"""Alpha-tested transparency (mask/opacity materials).

Reference behavior: AnyHitShader (HitShader.inc.hlsl:86-113) accepts a
candidate hit iff the pre-drawn per-ray opacity sample is below the
material opacity; opaque instances skip the test
(BVHAccel.inc.hlsl:182-190)."""

import numpy as np
import jax.numpy as jnp
import pytest

from directcomputeraytracing_tpu.accel.traverse import (
    intersect_any, intersect_closest,
)
from directcomputeraytracing_tpu.core.types import CameraParams
from directcomputeraytracing_tpu.camera.camera import look_at_transform
from directcomputeraytracing_tpu.integrator.common import RenderConfig
from directcomputeraytracing_tpu.integrator.megakernel import (
    full_frame_pixels, render_samples,
)
from directcomputeraytracing_tpu.integrator.wavefront import (
    render_samples_wavefront,
)
from directcomputeraytracing_tpu.lut.textures import placeholder_luts
from directcomputeraytracing_tpu.scene.presets import _quad
from directcomputeraytracing_tpu.scene.scene import (
    Instance, Material, Mesh, PunctualLight, Scene, flatten_scene,
)


def _panel_scene(opacity):
    """A floor plus a semi-transparent panel above it, lit by a point
    light from above: the panel's shadow density tracks its opacity."""
    fp, fi = _quad([-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2])
    floor = Mesh(positions=fp, indices=fi,
                 material_ids=np.zeros(len(fi), np.int64), name="floor")
    pp, pi = _quad([-1, 1, -1], [-1, 1, 1], [1, 1, 1], [1, 1, -1])
    panel = Mesh(positions=pp, indices=pi,
                 material_ids=np.ones(len(pi), np.int64), name="panel")
    mats = [Material(albedo=(0.8, 0.8, 0.8), name="floor"),
            Material(albedo=(0.8, 0.8, 0.8), opacity=opacity,
                     name="panel")]
    scene = Scene(
        meshes=[floor, panel],
        instances=[Instance(mesh=0), Instance(mesh=1)],
        materials=mats,
        lights=[PunctualLight(kind="point", radiance=(20, 20, 20),
                              position=(0.0, 3.0, 0.0))])
    cam = CameraParams.create(
        transform=look_at_transform((0, 2.5, -4.0), (0, 0, 0)),
        fov_x=np.deg2rad(45.0))
    return scene, cam


def _render(opacity, integrator="megakernel", spp=16, seed0=0):
    scene, cam = _panel_scene(opacity)
    arrays, meta = flatten_scene(scene)
    cfg = RenderConfig(width=24, height=24, max_bounce=2,
                       stack_size=meta.stack_size,
                       light_count=meta.light_count,
                       any_hit=meta.any_non_opaque)
    px, py = full_frame_pixels(cfg)
    luts = placeholder_luts()
    fn = (render_samples if integrator == "megakernel"
          else render_samples_wavefront)
    acc = np.zeros((px.shape[0], 3), np.float32)
    for s in range(spp):
        _, v = fn(arrays, luts, cam, cfg, px, py, jnp.uint32(seed0 + s))
        acc += np.asarray(v)
    return (acc / spp).reshape(24, 24, 3), meta


def test_any_hit_flag_detected():
    scene, cam = _panel_scene(0.5)
    arrays, meta = flatten_scene(scene)
    assert meta.any_non_opaque
    scene2, _ = _panel_scene(1.0)
    _, meta2 = flatten_scene(scene2)
    assert not meta2.any_non_opaque


def test_occlusion_rate_tracks_opacity():
    scene, cam = _panel_scene(0.3)
    arrays, meta = flatten_scene(scene)
    n = 4096
    rng = np.random.default_rng(0)
    # rays from below the panel straight up at the light
    o = np.zeros((n, 3), np.float32)
    o[:, 0] = rng.uniform(-0.5, 0.5, n)
    o[:, 1] = 0.01
    o[:, 2] = rng.uniform(-0.5, 0.5, n)
    d = np.tile(np.asarray([[0, 1, 0]], np.float32), (n, 1))
    u = jnp.asarray(rng.random(n, dtype=np.float32))
    occ = intersect_any(arrays, jnp.asarray(o), jnp.asarray(d),
                        jnp.float32(2.5), meta.stack_size,
                        backend="jax", opacity_u=u)
    rate = float(np.asarray(occ).mean())
    assert abs(rate - 0.3) < 0.05, rate
    # without alpha testing, everything is occluded
    occ2 = intersect_any(arrays, jnp.asarray(o), jnp.asarray(d),
                         jnp.float32(2.5), meta.stack_size, backend="jax")
    assert np.asarray(occ2).all()


@pytest.mark.slow
def test_shadow_density_tracks_opacity():
    img_opaque, _ = _render(1.0)
    img_half, _ = _render(0.5)
    # the half-transparent panel leaks light: the image is brighter
    assert img_half.mean() > img_opaque.mean() * 1.1


@pytest.mark.slow
def test_wavefront_matches_megakernel_with_alpha():
    a, _ = _render(0.5, "megakernel", spp=4, seed0=11)
    b, _ = _render(0.5, "wavefront", spp=4, seed0=11)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_opacity_texture_modulates_alpha_test():
    """AnyHitShader parity: the opacity texture's R channel multiplies the
    material opacity at the candidate hit UV."""
    import numpy as np
    import jax.numpy as jnp
    from directcomputeraytracing_tpu.scene.presets import _quad
    from directcomputeraytracing_tpu.scene.scene import (
        Instance, Material, Mesh, PunctualLight, Scene, flatten_scene,
    )

    fp, fi = _quad([-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2])
    floor = Mesh(positions=fp, indices=fi,
                 material_ids=np.zeros(len(fi), np.int64))
    pp, pi = _quad([-1, 1, -1], [-1, 1, 1], [1, 1, 1], [1, 1, -1])
    panel = Mesh(positions=pp, indices=pi,
                 material_ids=np.ones(len(pi), np.int64),
                 texcoords=np.asarray([[0, 0], [0, 1], [1, 1], [1, 0]],
                                      np.float32))
    # half the texture fully transparent, half fully opaque
    tex = np.ones((8, 8, 4), np.float32)
    tex[:, :4, 0] = 0.0          # R channel = opacity
    mats = [Material(albedo=(0.8,) * 3),
            Material(albedo=(0.8,) * 3, opacity=1.0, opacity_texture=0)]
    # opacity=1 but texture present: the scene must still count as
    # non-opaque
    scene = Scene(meshes=[floor, panel],
                  instances=[Instance(mesh=0), Instance(mesh=1)],
                  materials=mats, textures=[tex],
                  lights=[PunctualLight(kind="point",
                                        radiance=(10, 10, 10),
                                        position=(0, 3, 0))])
    arrays, meta = flatten_scene(scene)
    assert meta.any_non_opaque and meta.any_opacity_texture

    from directcomputeraytracing_tpu.accel.traverse import intersect_any

    n = 4096
    rng = np.random.default_rng(1)
    o = np.zeros((n, 3), np.float32)
    o[:, 0] = rng.uniform(-0.9, 0.9, n)
    o[:, 1] = 0.01
    o[:, 2] = rng.uniform(-0.9, 0.9, n)
    d = np.tile(np.asarray([[0, 1, 0]], np.float32), (n, 1))
    u = jnp.asarray(rng.random(n, dtype=np.float32))
    occ = intersect_any(arrays, jnp.asarray(o), jnp.asarray(d),
                        jnp.float32(2.5), meta.stack_size, backend="jax",
                        opacity_u=u, alpha_textures=True)
    rate = float(np.asarray(occ).mean())
    # half the panel is transparent -> ~50% occlusion
    assert abs(rate - 0.5) < 0.06, rate


@pytest.fixture(scope="module")
def split_scene():
    """>2048 world tris with a semi-transparent material on half the
    spheres: flatten builds the opaque/masked cluster split."""
    from directcomputeraytracing_tpu.scene.presets import sphere_grid

    scene, cam = sphere_grid(3, 3, stacks=12, slices=16)
    scene.materials[1] = Material(albedo=(0.8, 0.3, 0.3), opacity=0.4,
                                  name="seethrough")
    arrays, meta = flatten_scene(scene)
    assert meta.any_non_opaque
    assert arrays.mclu_bbox.shape[0] > 1      # split built
    assert arrays.oclu_bbox.shape[0] > 1
    return arrays, meta


def _alpha_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.2, 4.0, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_split_closest_matches_stack_walker(split_scene):
    """Opaque/masked split closest-hit == the stack walker's in-line
    alpha test (same pre-drawn opacity samples)."""
    arrays, meta = split_scene
    o, d = _alpha_rays(512)
    u = jnp.asarray(
        np.random.default_rng(7).random(512, dtype=np.float32))
    a = intersect_closest(arrays, o, d, meta.stack_size, backend="jax",
                          opacity_u=u, alpha_textures=False)
    b = intersect_closest(arrays, o, d, meta.stack_size,
                          backend="pallas_wl_interpret", opacity_u=u,
                          alpha_textures=True)
    m = np.asarray(a.hit)
    agree = np.asarray(b.hit) == m
    assert agree.mean() > 0.99          # grazing-advance epsilon only
    both = m & np.asarray(b.hit)
    np.testing.assert_allclose(np.asarray(b.t)[both],
                               np.asarray(a.t)[both], rtol=1e-3,
                               atol=1e-4)


def test_split_any_matches_stack_walker(split_scene):
    arrays, meta = split_scene
    o, d = _alpha_rays(512, seed=3)
    u = jnp.asarray(
        np.random.default_rng(9).random(512, dtype=np.float32))
    a = intersect_any(arrays, o, d, jnp.float32(3.0), meta.stack_size,
                      backend="jax", opacity_u=u, alpha_textures=False)
    b = intersect_any(arrays, o, d, jnp.float32(3.0), meta.stack_size,
                      backend="pallas_wl_interpret", opacity_u=u,
                      alpha_textures=True)
    assert (np.asarray(a) == np.asarray(b)).mean() > 0.99


def test_opacity_edit_drops_split(split_scene):
    """An opacity edit must invalidate the split partition (falls back
    to the full recast path) and still render correct occlusion."""
    from directcomputeraytracing_tpu.scene.edit import update_material

    arrays, meta = split_scene
    edited = update_material(arrays, 1, opacity=0.9)
    assert edited.mclu_bbox.shape[0] == 1     # split dropped
    o, d = _alpha_rays(256, seed=5)
    u = jnp.asarray(
        np.random.default_rng(11).random(256, dtype=np.float32))
    a = intersect_any(edited, o, d, jnp.float32(3.0), meta.stack_size,
                      backend="jax", opacity_u=u, alpha_textures=False)
    b = intersect_any(edited, o, d, jnp.float32(3.0), meta.stack_size,
                      backend="pallas_wl_interpret", opacity_u=u,
                      alpha_textures=True)
    assert (np.asarray(a) == np.asarray(b)).mean() > 0.99


@pytest.mark.slow
def test_split_t_cap_window_contract(split_scene):
    """t_cap through the opaque/masked split path (slab marching):
    capped hits strictly below the cap match the full alpha-tested
    cast; capped misses guarantee no accepted hit strictly below it."""
    arrays, meta = split_scene
    o, d = _alpha_rays(256, seed=11)
    u = jnp.asarray(
        np.random.default_rng(13).random(256, dtype=np.float32))
    full = intersect_closest(arrays, o, d, meta.stack_size,
                             backend="pallas_wl_interpret",
                             opacity_u=u, alpha_textures=True)
    t_full = np.asarray(full.t)
    hit_f = np.asarray(full.hit)
    D = float(np.median(t_full[hit_f]))
    cap = intersect_closest(arrays, o, d, meta.stack_size,
                            backend="pallas_wl_interpret", opacity_u=u,
                            alpha_textures=True, t_cap=jnp.float32(D))
    hit_c = np.asarray(cap.hit)
    t_c = np.asarray(cap.t)
    resolved = hit_c & (t_c < D)
    assert resolved.sum() > 30
    np.testing.assert_allclose(t_c[resolved], t_full[resolved],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(cap.triangle)[resolved],
                                  np.asarray(full.triangle)[resolved])
    miss_c = ~hit_c
    assert not (hit_f[miss_c] & (t_full[miss_c] < D * (1 - 2e-4))).any()
    margin = D * (1.0 - 2.0 ** -12)
    low = hit_f & (t_full < margin)
    assert low.sum() > 20
    assert hit_c[low].all()

"""TPU-native Monte-Carlo path tracing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
YaoTiancheng/DirectComputeRayTracing (a D3D12-compute unidirectional path
tracer): two-level BVH, physically-based BSDFs with Kulla-Conty
multiple-scattering compensation, MIS next-event estimation, thin-lens
camera with polygonal bokeh, PBRT-style splatting film, and both
"megakernel" (single fused jit) and "wavefront" (queue-compacted path
pool) integrators — all built TPU-first: SoA arrays, static shapes,
`lax.while_loop`/`lax.scan` control flow, Pallas intersection kernels,
and `jax.sharding` for multi-chip scaling.

Quick start::

    from directcomputeraytracing_tpu import Renderer, cornell_box
    scene, camera = cornell_box()
    r = Renderer(scene, camera, width=512, height=512, max_bounce=4)
    image = r.render(spp=64)               # (H, W, 3) linear radiance
    display = r.postprocessed()            # exposure + tonemap + sRGB
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy exports: keep `import directcomputeraytracing_tpu` light.
    if name in ("Renderer", "SEED_FIXED", "SEED_SAMPLE_COUNT"):
        from .integrator import renderer as _m
        return getattr(_m, name)
    if name == "RenderConfig":
        from .integrator.common import RenderConfig
        return RenderConfig
    if name in ("Scene", "Mesh", "Material", "Instance", "PunctualLight",
                "flatten_scene"):
        from .scene import scene as _m
        return getattr(_m, name)
    if name in ("cornell_box", "sphere_grid"):
        from .scene import presets as _m
        return getattr(_m, name)
    if name == "load_obj":
        from .scene.obj_loader import load_obj
        return load_obj
    if name == "load_mitsuba_xml":
        from .scene.xml_loader import load_mitsuba_xml
        return load_mitsuba_xml
    if name == "CameraParams":
        from .core.types import CameraParams
        return CameraParams
    if name in ("bake_luts", "bake_luts_cached"):
        from .lut import bake as _m
        return getattr(_m, name)
    if name in ("FilterParams",):
        from .film.filters import FilterParams
        return FilterParams
    if name in ("PostParams",):
        from .post.pipeline import PostParams
        return PostParams
    if name in ("DistributedRenderer", "make_mesh"):
        from .parallel import dist as _m
        return getattr(_m, name)
    raise AttributeError(name)


__all__ = [
    "Renderer", "RenderConfig", "SEED_FIXED", "SEED_SAMPLE_COUNT",
    "Scene", "Mesh", "Material", "Instance", "PunctualLight",
    "flatten_scene", "cornell_box", "sphere_grid", "load_obj",
    "load_mitsuba_xml", "CameraParams", "bake_luts", "bake_luts_cached",
    "FilterParams", "PostParams", "DistributedRenderer", "make_mesh",
]

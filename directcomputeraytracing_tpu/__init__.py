"""TPU-native Monte-Carlo path tracing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
YaoTiancheng/DirectComputeRayTracing (a D3D12-compute unidirectional path
tracer): two-level BVH, physically-based BSDFs with Kulla-Conty
multiple-scattering compensation, MIS next-event estimation, thin-lens
camera with polygonal bokeh, PBRT-style splatting film, and both
"megakernel" (single fused jit) and "wavefront" (queue-compacted path
pool) integrators — all built TPU-first: SoA arrays, static shapes,
`lax.while_loop`/`lax.scan` control flow, and `jax.sharding` for
multi-chip scaling.
"""

__version__ = "0.1.0"

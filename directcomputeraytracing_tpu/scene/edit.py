"""Headless scene-edit API: cheap per-field `SceneArrays` updates.

The TPU analogue of the reference's per-frame editor writes (reference:
Source/Scene.cpp:672-807 — material/light/instance-flag edits mark a
dirty range and re-upload one GPU buffer region, never rebuilding the
BVH). Here every function is a pure jittable array update on the
flattened `SceneArrays` pytree: shapes and dtypes are unchanged, so a
renderer holding the result keeps every compiled kernel (same jit
signature) — an edit costs one fused device update, not a re-flatten.

Geometry/transform edits are out of scope by the same rule the
reference applies: those invalidate the acceleration structure and go
through `flatten_scene`.

Caveat (documented in docs/PARITY.md): opacity edits only take effect
on scenes compiled with alpha support (`SceneMeta.any_non_opaque` at
flatten time) — the alpha-test traversal is a static compile branch,
the analogue of the reference's scene-dependent shader #defines.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import (
    INSTANCE_FLAG_OPAQUE,
    INSTANCE_MATERIAL_OVERRIDE_NONE,
    LIGHT_INDEX_INVALID,
)

F32 = jnp.float32

# mat_table column layout (scene.py flatten_scene):
# [albedo 0:3 | ior 3:6 | rough 6 | tiling 7:9 | opacity 9 | flags 10 |
#  albedo_tex 11 | opacity_tex 12 | pad 13:16]
_COL = {"albedo": 0, "ior": 3, "roughness": 6, "tiling": 7,
        "opacity": 9}


def _recompute_opacity_tables(arrays):
    """Re-derive the traversal alpha tables + per-instance OPAQUE flag
    from the (edited) material opacities. Matches flatten_scene's
    build rules: override-aware per-world-triangle opacity; an
    instance is OPAQUE iff every triangle's effective material is
    fully opaque and untextured."""
    tri_op = arrays.mat_opacity[arrays.material_ids.astype(jnp.int32)]
    has_otex = arrays.mat_opacity_tex >= 0
    tri_id = arrays.world_tri_meta[:, 0].astype(jnp.int32)
    inst_id = arrays.world_tri_meta[:, 1].astype(jnp.int32)
    ov = arrays.instance_material_overrides[inst_id]
    base_mat = arrays.material_ids[tri_id].astype(jnp.uint32)
    eff_mat = jnp.where(
        ov != jnp.uint32(INSTANCE_MATERIAL_OVERRIDE_NONE), ov,
        base_mat).astype(jnp.int32)
    eff_op = arrays.mat_opacity[eff_mat]
    eff_clear = ((eff_op >= 1.0) & ~has_otex[eff_mat]).astype(F32)
    n_inst = arrays.instance_flags.shape[0]
    inst_opaque = jnp.ones((n_inst,), F32).at[inst_id].min(
        eff_clear, mode="drop") > 0.5
    world_op = jnp.where(inst_opaque[inst_id], 1.0, eff_op)
    flags = jnp.where(
        inst_opaque,
        arrays.instance_flags | INSTANCE_FLAG_OPAQUE,
        arrays.instance_flags & ~jnp.uint32(INSTANCE_FLAG_OPAQUE))
    if arrays.world_tris.shape[0] <= 1:   # soup absent: keep placeholder
        world_op = arrays.world_tri_opacity
    arrays = arrays._replace(tri_opacity=tri_op,
                             world_tri_opacity=world_op,
                             instance_flags=flags)
    if arrays.mclu_bbox.shape[0] > 1:
        # opacity edits can move triangles across the opaque/masked
        # cluster split (core/types.py) — drop it rather than traverse
        # a stale partition; casts fall back to the full recast path
        # (correct, slower). Shapes change, so the next render
        # recompiles — the reference's shader-recompile-on-edit rule.
        import numpy as _np

        from ..accel.cluster import CLUSTER_SIZE as _CS

        arrays = arrays._replace(
            oclu_tris=jnp.asarray(_np.zeros((_CS, 13), _np.float32)),
            oclu_bw=jnp.asarray(_np.zeros((_CS, 16), _np.float32)),
            oclu_bbox=jnp.asarray(_np.zeros((1, 8), _np.float32)),
            mclu_tris=jnp.asarray(_np.zeros((_CS, 13), _np.float32)),
            mclu_bw=jnp.asarray(_np.zeros((_CS, 16), _np.float32)),
            mclu_bbox=jnp.asarray(_np.zeros((1, 8), _np.float32)))
    return arrays


@partial(jax.jit, static_argnames=("fields",))
def _apply_material(arrays, index, values, fields):
    i = jnp.asarray(index, jnp.int32)
    tab = arrays.mat_table
    soa = {"albedo": arrays.mat_albedo, "ior": arrays.mat_ior,
           "roughness": arrays.mat_roughness,
           "tiling": arrays.mat_tiling, "opacity": arrays.mat_opacity}
    for name, v in zip(fields, values):
        v = jnp.atleast_1d(jnp.asarray(v, F32))
        c = _COL[name]
        tab = tab.at[i, c:c + v.shape[0]].set(v)
        soa[name] = soa[name].at[i].set(
            v if soa[name].ndim == 2 else v[0])
    arrays = arrays._replace(
        mat_table=tab, mat_albedo=soa["albedo"], mat_ior=soa["ior"],
        mat_roughness=soa["roughness"], mat_tiling=soa["tiling"],
        mat_opacity=soa["opacity"])
    if "opacity" in fields:
        arrays = _recompute_opacity_tables(arrays)
    return arrays


def update_material(arrays, index, albedo=None, ior=None, roughness=None,
                    tiling=None, opacity=None):
    """Edit one material's scalar/vector fields in place (device-side;
    no re-flatten). Opacity edits also re-derive the alpha traversal
    tables and per-instance OPAQUE flags. Returns new SceneArrays."""
    given = {"albedo": albedo, "ior": ior, "roughness": roughness,
             "tiling": tiling, "opacity": opacity}
    fields = tuple(k for k, v in given.items() if v is not None)
    values = tuple(jnp.asarray(given[k], F32) for k in fields)
    return _apply_material(arrays, index, values, fields)


def update_material_flags(arrays, index, flags):
    """Replace one material's packed flag word (type bits, two-sided,
    multiscattering, internal-scattering mode — core.constants)."""
    i = jnp.asarray(index, jnp.int32)
    f = jnp.asarray(flags, jnp.uint32)
    return arrays._replace(
        mat_flags=arrays.mat_flags.at[i].set(f),
        mat_table=arrays.mat_table.at[i, 10].set(f.astype(F32)))


def update_light(arrays, index, radiance=None, position=None):
    """Edit a punctual/mesh light's radiance or position/direction."""
    i = jnp.asarray(index, jnp.int32)
    lr, lp = arrays.light_radiance, arrays.light_position
    if radiance is not None:
        lr = lr.at[i].set(jnp.asarray(radiance, F32))
    if position is not None:
        lp = lp.at[i].set(jnp.asarray(position, F32))
    return arrays._replace(light_radiance=lr, light_position=lp)


def update_instance_override(arrays, index, material_override):
    """Set/clear (-1) an instance's material override; re-derives the
    alpha tables the same way flatten_scene does."""
    i = jnp.asarray(index, jnp.int32)
    mo = jnp.asarray(material_override, jnp.int32)
    ov = jnp.where(mo < 0, jnp.uint32(INSTANCE_MATERIAL_OVERRIDE_NONE),
                   mo.astype(jnp.uint32))
    arrays = arrays._replace(
        instance_material_overrides=(
            arrays.instance_material_overrides.at[i].set(ov)))
    return _recompute_opacity_tables(arrays)


def update_emitter_radiance(arrays, instance_index, radiance):
    """Edit an emissive instance's radiance (its mesh light row); a
    non-emitter instance is a no-op (OOB scatter drops)."""
    li = arrays.instance_light_indices[
        jnp.asarray(instance_index, jnp.int32)]
    n = arrays.light_radiance.shape[0]
    idx = jnp.where(li != jnp.uint32(LIGHT_INDEX_INVALID), li,
                    n).astype(jnp.int32)
    return arrays._replace(
        light_radiance=arrays.light_radiance.at[idx].set(
            jnp.asarray(radiance, F32), mode="drop"))


def light_index_of(arrays, instance_index):
    """Host helper: the light row of an emissive instance (or None)."""
    li = int(np.asarray(arrays.instance_light_indices[instance_index]))
    return None if li == LIGHT_INDEX_INVALID else li

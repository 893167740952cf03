"""Device-side scene buffers: a registered pytree of jnp arrays.

The analogue of the reference's mesh/material bind group — one read-only
storage group holding vertices, primitives, BVH nodes, alias table,
instances, materials, emissives and the emissive BVH
(reference src/mesh_material/mod.rs:488-675) — but as a JAX pytree so it
flows through jit/grad/shard_map. Array sizes are padded to stable
multiples so small scene edits don't retrigger XLA compilation (the
reference analogue: pipelines cached per texture-count/layout,
mod.rs:684-808).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


def static_field(default=0):
    """Dataclass field marked static for ``jax.tree_util.register_dataclass``
    (goes into the treedef, not the leaves)."""
    return field(default=default, metadata=dict(static=True))

from hikari_tpu.scene.compile import Scene, SceneArrays, compile_scene


def _round_up(n: int, m: int) -> int:
    return ((max(n, 1) + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SceneBuffers:
    """Flat SoA scene arrays on device. ``num_*`` fields are static python
    ints (part of the treedef) — they gate traversal loop bounds and
    emissive sampling, exactly like the reference's specialization keys."""

    # triangles
    tri_world: jax.Array  # (P, 3, 3) f32 — differentiable geometry leaf
    tri_vidx: jax.Array  # (P, 3) i32
    tri_inst: jax.Array  # (P,) i32
    tri_mesh_index: jax.Array  # (P,) i32 instance-local mesh-order id
    tri_local: jax.Array  # (P, 3, 3) f32 — source for device transform updates
    # precomputed plane/dual-basis form for the MXU intersection path
    # (trace/intersect.py precompute_triangles); detached search data.
    tri_n: jax.Array  # (P, 3)
    tri_eu: jax.Array  # (P, 3)
    tri_ev: jax.Array  # (P, 3)
    tri_cn: jax.Array  # (P,)
    tri_cu: jax.Array  # (P,)
    tri_cv: jax.Array  # (P,)
    tri_valid: jax.Array  # (P,) bool
    # vertex attributes
    vert_normal: jax.Array  # (V, 3)
    vert_uv: jax.Array  # (V, 2)
    vert_normal_local: jax.Array  # (V, 3)
    vert_inst: jax.Array  # (V,) i32, -1 on padding
    # stitched node graph
    node_min: jax.Array
    node_max: jax.Array
    node_entry: jax.Array
    node_exit: jax.Array
    node_inst: jax.Array
    node_left: jax.Array  # (N,) refit children, -1 = none
    node_right: jax.Array
    # instances
    inst_min: jax.Array
    inst_max: jax.Array
    inst_material: jax.Array
    inst_prim_offset: jax.Array
    inst_prim_count: jax.Array
    inst_blas_start: jax.Array
    inst_blas_end: jax.Array
    inst_model: jax.Array
    inst_prev_model: jax.Array
    inst_inv_model: jax.Array
    # Streaming/visibility mask (reference: city.rs streams models in over
    # time; instance.rs:269-283 retries unready assets; visibility events
    # instance.rs:130-175). Instances are pre-declared at compile time and
    # toggled on device — scene/update.py masks triangles, AABBs and
    # emissives so an inactive instance traces, shades and samples as if
    # absent, with no host recompile.
    inst_active: jax.Array  # (I,) bool
    # materials — differentiable leaves
    mat_base_color: jax.Array
    mat_emissive: jax.Array
    mat_perceptual_roughness: jax.Array
    mat_metallic: jax.Array
    mat_reflectance: jax.Array
    # texture ids (-1 = none) + uniform texture stack (T, S, S, 4)
    mat_base_color_texture: jax.Array
    mat_emissive_texture: jax.Array
    mat_metallic_roughness_texture: jax.Array
    mat_normal_map_texture: jax.Array
    mat_occlusion_texture: jax.Array
    tex_atlas: jax.Array  # (N,) u32 native-res flat atlas
    tex_meta: jax.Array  # (T, 3) i32 [offset, h, w]
    # emissives
    em_emissive: jax.Array
    em_position: jax.Array
    em_radius: jax.Array
    em_instance: jax.Array
    em_alias_offset: jax.Array
    em_alias_count: jax.Array
    em_surface_area: jax.Array
    enode_min: jax.Array
    enode_max: jax.Array
    enode_entry: jax.Array
    enode_exit: jax.Array
    enode_left: jax.Array
    enode_right: jax.Array
    alias_prob: jax.Array
    alias_index: jax.Array
    # lights — differentiable leaves
    sun_direction_to_light: jax.Array
    sun_color: jax.Array
    ambient_color: jax.Array

    # static metadata
    num_tris: int = static_field()
    num_nodes: int = static_field()
    num_instances: int = static_field()
    num_emissives: int = static_field()
    num_enodes: int = static_field()
    num_materials: int = static_field()
    num_textures: int = static_field()
    # dynamic-update (refit) metadata
    refit_depth: int = static_field()
    erefit_depth: int = static_field()
    num_tlas_nodes: int = static_field()


def _pad(arr: np.ndarray, n: int, fill=0) -> np.ndarray:
    """Pad axis 0 of ``arr`` to length ``n``."""
    if len(arr) >= n:
        return arr
    pad_shape = (n - len(arr),) + arr.shape[1:]
    return np.concatenate([arr, np.full(pad_shape, fill, dtype=arr.dtype)])


def to_device(
    arrays: SceneArrays,
    tri_pad: int = 128,
    node_pad: int = 128,
) -> SceneBuffers:
    """Pad + upload compiled scene arrays. Padded triangles are degenerate
    (all-zero -> Möller-Trumbore determinant 0 -> guaranteed miss); padded
    nodes are unreachable (the stitched graph never points at them)."""
    num_tris = len(arrays.tri_world)
    num_nodes = len(arrays.node_entry)
    num_inst = len(arrays.inst_material)
    num_em = len(arrays.em_instance)
    num_enodes = len(arrays.enode_entry)
    num_mats = len(arrays.mat_base_color)

    p = _round_up(num_tris, tri_pad)
    n = _round_up(num_nodes, node_pad)
    v = _round_up(len(arrays.vert_normal), tri_pad)
    a = _round_up(max(len(arrays.alias_prob), 1), tri_pad)
    e = max(num_em, 1)
    en = max(num_enodes, 1)

    def dev(x):
        return jnp.asarray(x)

    from hikari_tpu.trace.intersect import precompute_triangles

    tri_padded = _pad(arrays.tri_world, p)
    pre = jax.jit(precompute_triangles)(jnp.asarray(tri_padded))

    return SceneBuffers(
        tri_world=dev(tri_padded),
        tri_vidx=dev(_pad(arrays.tri_vidx, p)),
        tri_inst=dev(_pad(arrays.tri_inst, p, fill=-1)),
        tri_mesh_index=dev(_pad(arrays.tri_mesh_index, p, fill=-1)),
        tri_local=dev(_pad(arrays.tri_local, p)),
        tri_n=pre["n"],
        tri_eu=pre["eu"],
        tri_ev=pre["ev"],
        tri_cn=pre["cn"],
        tri_cu=pre["cu"],
        tri_cv=pre["cv"],
        tri_valid=pre["valid"],
        vert_normal=dev(_pad(arrays.vert_normal, v)),
        vert_uv=dev(_pad(arrays.vert_uv, v)),
        vert_normal_local=dev(_pad(arrays.vert_normal_local, v)),
        vert_inst=dev(_pad(arrays.vert_inst, v, fill=-1)),
        node_min=dev(_pad(arrays.node_min, n)),
        node_max=dev(_pad(arrays.node_max, n)),
        node_entry=dev(_pad(arrays.node_entry, n)),
        node_exit=dev(_pad(arrays.node_exit, n, fill=num_nodes)),
        node_inst=dev(_pad(arrays.node_inst, n, fill=-1)),
        node_left=dev(_pad(arrays.node_left, n, fill=-1)),
        node_right=dev(_pad(arrays.node_right, n, fill=-1)),
        inst_min=dev(arrays.inst_min),
        inst_max=dev(arrays.inst_max),
        inst_material=dev(arrays.inst_material),
        inst_prim_offset=dev(arrays.inst_prim_offset),
        inst_prim_count=dev(arrays.inst_prim_count),
        inst_blas_start=dev(arrays.inst_blas_start),
        inst_blas_end=dev(arrays.inst_blas_end),
        inst_model=dev(arrays.inst_model),
        inst_prev_model=dev(arrays.inst_prev_model),
        inst_inv_model=dev(arrays.inst_inv_model),
        inst_active=jnp.ones((num_inst,), dtype=bool),
        mat_base_color=dev(arrays.mat_base_color),
        mat_emissive=dev(arrays.mat_emissive),
        mat_perceptual_roughness=dev(arrays.mat_perceptual_roughness),
        mat_metallic=dev(arrays.mat_metallic),
        mat_reflectance=dev(arrays.mat_reflectance),
        mat_base_color_texture=dev(arrays.mat_base_color_texture),
        mat_emissive_texture=dev(arrays.mat_emissive_texture),
        mat_metallic_roughness_texture=dev(arrays.mat_metallic_roughness_texture),
        mat_normal_map_texture=dev(arrays.mat_normal_map_texture),
        mat_occlusion_texture=dev(arrays.mat_occlusion_texture),
        tex_atlas=dev(arrays.tex_atlas),
        tex_meta=dev(arrays.tex_meta),
        em_emissive=dev(_pad(arrays.em_emissive, e)),
        em_position=dev(_pad(arrays.em_position, e)),
        em_radius=dev(_pad(arrays.em_radius, e)),
        em_instance=dev(_pad(arrays.em_instance, e, fill=-1)),
        em_alias_offset=dev(_pad(arrays.em_alias_offset, e)),
        em_alias_count=dev(_pad(arrays.em_alias_count, e)),
        em_surface_area=dev(_pad(arrays.em_surface_area, e)),
        enode_min=dev(_pad(arrays.enode_min, en)),
        enode_max=dev(_pad(arrays.enode_max, en)),
        enode_entry=dev(_pad(arrays.enode_entry, en)),
        enode_exit=dev(_pad(arrays.enode_exit, en, fill=max(num_enodes, 1))),
        enode_left=dev(_pad(arrays.enode_left, en, fill=-1)),
        enode_right=dev(_pad(arrays.enode_right, en, fill=-1)),
        alias_prob=dev(_pad(arrays.alias_prob, a)),
        alias_index=dev(_pad(arrays.alias_index, a)),
        sun_direction_to_light=dev(arrays.sun_direction_to_light),
        sun_color=dev(arrays.sun_color),
        ambient_color=dev(arrays.ambient_color),
        num_tris=num_tris,
        num_nodes=num_nodes,
        num_instances=num_inst,
        num_emissives=num_em,
        num_enodes=num_enodes,
        num_materials=num_mats,
        num_textures=int(arrays.num_textures),
        refit_depth=int(arrays.refit_depth),
        erefit_depth=int(arrays.erefit_depth),
        num_tlas_nodes=int(arrays.num_tlas_nodes),
    )


def build_scene_buffers(scene: Scene, **pad_kw) -> SceneBuffers:
    """Convenience: full host compile + upload."""
    return to_device(compile_scene(scene), **pad_kw)

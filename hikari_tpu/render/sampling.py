"""Light sampling / next-event estimation.

jnp equivalents of the reference's sampling section
(src/shaders/light.wgsl:536-708): uniform disk/cosine-hemisphere/cone/
triangle sampling with pdfs, the emissive-BVH reservoir walk picking one
light per shading point, alias-table triangle selection, and the
instance-restricted target ray — all vectorized over the pixel grid with
masked math instead of the GPU's divergent branches.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from hikari_tpu.config import DISTANCE_MAX, F32_MAX, GOLDEN_RATIO, RAY_BIAS
from hikari_tpu.scene.buffers import SceneBuffers
from hikari_tpu.trace.api import Hit, HitInfo, hit_info, trace_rays
from hikari_tpu.trace.intersect import inside_aabb
from hikari_tpu.utils import (
    INV_TAU,
    TAU,
    dot3,
    fract,
    normal_basis,
    safe_normalize,
)

# Sentinel for "no emissive chosen / don't sample emissive" — the reference
# uses DONT_SAMPLE_EMISSIVE = 0x80000000 (light.wgsl:243).
NO_EMISSIVE = -1


def sample_uniform_disk(rand2):
    """(reference light.wgsl:537-541)."""
    r = jnp.sqrt(rand2[..., 0])
    theta = TAU * rand2[..., 1]
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def sample_cosine_hemisphere(rand2):
    """-> (direction (...,3) in +Z hemisphere, pdf (...,)) (light.wgsl:544-549)."""
    t = sample_uniform_disk(rand2)
    z = jnp.sqrt(jnp.maximum(1.0 - jnp.sum(t * t, axis=-1), 0.0))
    direction = jnp.concatenate([t, z[..., None]], axis=-1)
    pdf = 2.0 * INV_TAU * z
    return direction, pdf


def sample_uniform_cone(rand2, cos_angle):
    """-> (direction (...,3) around +Z, pdf) (light.wgsl:552-559)."""
    z = 1.0 - (1.0 - cos_angle) * rand2[..., 0]
    theta = TAU * rand2[..., 1]
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    direction = jnp.stack(
        [r * jnp.cos(theta), r * jnp.sin(theta), z], axis=-1
    )
    pdf = INV_TAU / jnp.maximum(1.0 - cos_angle, 1e-8)
    return direction, jnp.broadcast_to(pdf, z.shape)


def sample_uniform_triangle_barycentric(rand2):
    """(light.wgsl:562-565; pbr-book 3ed §13.6)."""
    srx = jnp.sqrt(rand2[..., 0])
    return jnp.stack([1.0 - srx, rand2[..., 1] * srx], axis=-1)


def directional_cone(scene: SceneBuffers, solar_angle: float):
    """Sun cone (direction_to_light, cos half-angle) (light.wgsl:571-573)."""
    return scene.sun_direction_to_light, jnp.cos(jnp.asarray(solar_angle))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class LightCandidate:
    """Reference ``LightCandidate`` (light.wgsl:298-304)."""

    direction: jax.Array  # (..., 3)
    max_distance: jax.Array  # (...,)
    min_distance: jax.Array  # (...,)
    emissive_instance: jax.Array  # (...,) i32; NO_EMISSIVE = sun sample
    p: jax.Array  # (...,) selection pdf


def empty_hit_info(position, direction) -> HitInfo:
    """Reference ``empty_hit_info`` (light.wgsl:488-494)."""
    pos = position + direction * DISTANCE_MAX
    w = jnp.zeros(pos.shape[:-1] + (1,))
    shape = pos.shape[:-1]
    return HitInfo(
        position=jnp.concatenate([pos, w], axis=-1),
        normal=jnp.zeros_like(pos),
        uv=jnp.zeros(shape + (2,)),
        instance=jnp.full(shape, -1, dtype=jnp.int32),
        material=jnp.full(shape, -1, dtype=jnp.int32),
    )


def _emissive_walk(scene: SceneBuffers, position, exclude_instance, rand_1d):
    """Walk the emissive BVH, reservoir-picking one emissive whose bounding
    sphere's AABB contains the shading point (reference light.wgsl:626-657).
    Vectorized lockstep walk over all pixels.

    Returns (chosen emissive index or NO_EMISSIVE, count of candidates)."""
    shape = position.shape[:-1]
    R = 1
    for dim in shape:
        R *= int(dim)
    pos = position.reshape(-1, 3)
    excl = jnp.broadcast_to(exclude_instance, shape).reshape(-1)
    r1 = jnp.broadcast_to(rand_1d, shape).reshape(-1)

    num_enodes = scene.num_enodes
    end = num_enodes

    # Pack everything a walk step reads into one (N, 13) row table so each
    # iteration is ONE row gather instead of 7 (entry/exit/min/max +
    # leaf-emissive position/radius/instance — the leaf's emissive fields
    # are folded into its node row via the P-sized -entry-1 pregather).
    # Gathered values feed only comparisons, so tangents die here and the
    # while_loop stays outside the autodiff graph (as before).
    fbits = lambda i: jax.lax.bitcast_convert_type(
        i.astype(jnp.int32), jnp.float32
    )
    ibits = lambda f: jax.lax.bitcast_convert_type(f, jnp.int32)
    E = scene.em_position.shape[0]
    node_em = jnp.clip(-scene.enode_entry - 1, 0, E - 1)
    enode_rows = jax.lax.stop_gradient(
        jnp.concatenate(
            [
                fbits(scene.enode_entry)[:, None],
                fbits(scene.enode_exit)[:, None],
                scene.enode_min,
                scene.enode_max,
                scene.em_position[node_em],
                scene.em_radius[node_em][:, None],
                fbits(scene.em_instance[node_em])[:, None],
            ],
            axis=-1,
        )
    )

    def cond(state):
        idx = state[0]
        return jnp.any(idx != end)

    def body(state):
        idx, rand, count, chosen = state
        safe_idx = jnp.clip(idx, 0, num_enodes - 1)
        rows = enode_rows[safe_idx]  # (..., 13)
        entry = ibits(rows[..., 0])
        exit_ = ibits(rows[..., 1])
        is_leaf = entry < 0
        em_idx = -entry - 1

        em_pos = rows[..., 8:11]
        em_rad = rows[..., 11:12]
        leaf_inside = inside_aabb(pos, em_pos - em_rad, em_pos + em_rad)
        em_inst = ibits(rows[..., 12])
        accept = is_leaf & leaf_inside & (em_inst != excl)

        rand = jnp.where(accept, fract(rand + GOLDEN_RATIO), rand)
        new_count = jnp.where(accept, count + 1.0, count)
        take = accept & (rand < 1.0 / jnp.maximum(new_count, 1.0))
        chosen = jnp.where(take, em_idx, chosen)

        node_inside = inside_aabb(pos, rows[..., 2:5], rows[..., 5:8])
        next_idx = jnp.where(is_leaf | ~node_inside, exit_, entry)
        next_idx = jnp.where(idx != end, next_idx, end)
        return (next_idx, rand, new_count, chosen)

    init = (
        jnp.zeros((R,), dtype=jnp.int32),
        r1,
        jnp.zeros((R,)),
        jnp.full((R,), NO_EMISSIVE, dtype=jnp.int32),
    )
    _, _, count, chosen = jax.lax.while_loop(cond, body, init)
    return chosen.reshape(shape), count.reshape(shape)


def select_light_candidate(
    scene: SceneBuffers,
    rand,  # (..., 4)
    position,  # (..., 3)
    normal,  # (..., 3)
    instance,  # (...,) i32 — excluded from emissive selection; pass
    # NO_SAMPLE_EMISSIVE semantics via sample_emissive=False
    solar_angle: float,
    sample_emissive: bool,
    trace_method: str = "auto",
) -> tuple[LightCandidate, HitInfo]:
    """Reference ``select_light_candidate`` (light.wgsl:599-708).

    Always produces the sun-cone fallback; when ``sample_emissive`` (static)
    and the scene has emissives, walks the light BVH, samples a triangle via
    the alias table, and traces the instance-restricted target ray. Fully
    masked — every pixel pays the emissive cost when the channel is on,
    which is the TPU-correct formulation of the GPU's divergent branch."""
    shape = position.shape[:-1]

    sun_dir, sun_cos = directional_cone(scene, solar_angle)
    local, _ = sample_uniform_cone(rand[..., 2:4], sun_cos)
    basis = normal_basis(jnp.broadcast_to(sun_dir, position.shape))
    rand_direction = jnp.einsum("...ij,...j->...i", basis, local)

    candidate = LightCandidate(
        direction=rand_direction,
        max_distance=jnp.full(shape, F32_MAX),
        min_distance=jnp.full(shape, DISTANCE_MAX),
        emissive_instance=jnp.full(shape, NO_EMISSIVE, dtype=jnp.int32),
        p=jnp.ones(shape),
    )
    info = empty_hit_info(position, rand_direction)

    if not sample_emissive or scene.num_emissives == 0:
        return candidate, info

    chosen, count = _emissive_walk(scene, position, instance, rand[..., 0])
    has_em = chosen >= 0
    safe_em = jnp.maximum(chosen, 0)

    # Alias-table triangle pick (light.wgsl:661-669). The five per-emissive
    # tables sharing the chosen index (alias count/offset, instance,
    # surface area, instance prim offset/count) are packed into one row
    # gather; the (prob | index) alias entries into another.
    fbits = lambda i: jax.lax.bitcast_convert_type(
        i.astype(jnp.int32), jnp.float32
    )
    ibits = lambda f: jax.lax.bitcast_convert_type(f, jnp.int32)
    from hikari_tpu.utils import gather_channels

    em_rows_tbl = jnp.concatenate(
        [
            fbits(scene.em_alias_count)[:, None],
            fbits(scene.em_alias_offset)[:, None],
            fbits(scene.em_instance)[:, None],
            scene.em_surface_area[:, None],
            fbits(scene.inst_prim_offset[scene.em_instance])[:, None],
            fbits(scene.inst_prim_count[scene.em_instance])[:, None],
        ],
        axis=-1,
    )  # (E, 6); surface_area is not a DIFF_LEAF, rest are int bitcasts
    em_rows = gather_channels(jax.lax.stop_gradient(em_rows_tbl), safe_em)
    alias_count = ibits(em_rows[..., 0])
    alias_off = ibits(em_rows[..., 1])
    em_inst = ibits(em_rows[..., 2])
    em_area = em_rows[..., 3]
    em_prim_off = ibits(em_rows[..., 4])
    em_prim_cnt = ibits(em_rows[..., 5])
    alias_idx = jnp.minimum(
        (rand[..., 0] * alias_count.astype(jnp.float32)).astype(jnp.int32),
        jnp.maximum(alias_count - 1, 0),
    )
    entry_idx = jnp.clip(alias_off + alias_idx, 0, scene.alias_prob.shape[0] - 1)
    alias_rows = gather_channels(
        jnp.stack(
            [scene.alias_prob, fbits(scene.alias_index)], axis=-1
        ),
        entry_idx,
    )
    a_prob = alias_rows[..., 0]
    a_index = ibits(alias_rows[..., 1])
    local_prim = jnp.where(rand[..., 1] < a_prob, a_index, alias_idx)
    prim = em_prim_off + local_prim
    prim = jnp.clip(prim, 0, scene.tri_world.shape[0] - 1)

    # Barycentric point on the (world-space) triangle (component-major
    # gather to avoid (R,3,3) tile padding — see gather_triangle_vertices).
    from hikari_tpu.trace.api import gather_triangle_vertices

    tv0, tv1, tv2 = gather_triangle_vertices(
        jax.lax.stop_gradient(scene.tri_world), prim
    )
    b = sample_uniform_triangle_barycentric(rand[..., 2:4])
    bx = b[..., 0:1]
    by = b[..., 1:2]
    p_world = bx * tv0 + by * tv1 + (1.0 - bx - by) * tv2

    ray_origin = position + normal * RAY_BIAS
    ray_dir = safe_normalize(p_world - position)

    # Instance-restricted closest-hit on the emissive instance
    # (light.wgsl:672-687). Masked empty range for non-emissive pixels.
    lo = jnp.where(has_em, em_prim_off, 0)
    hi = jnp.where(has_em, em_prim_off + em_prim_cnt, 0)
    hit = trace_rays(
        scene,
        ray_origin,
        ray_dir,
        range_lo=lo,
        range_hi=hi,
        method=trace_method,
    )
    front = dot3(ray_dir, normal) > 0.0
    ok = has_em & front & (hit.prim >= 0)

    # Force the recorded instance to the emissive instance (light.wgsl:688)
    em_hit = Hit(
        t=hit.t,
        prim=hit.prim,
        inst=jnp.where(ok, em_inst, hit.inst).astype(jnp.int32),
        u=hit.u,
        v=hit.v,
    )
    target = hit_info(scene, ray_origin, ray_dir, em_hit)

    delta = target.position[..., :3] - position
    d2 = jnp.sum(delta * delta, axis=-1)
    denom = jnp.abs(dot3(ray_dir, target.normal) * em_area)
    # stable_div: exact quotient backward without the 1/denom^2 transient
    # overflow near the 1e-12 guard (diff.stable_div), replacing the old
    # cotangent clip.
    from hikari_tpu.diff import stable_div

    p_em = stable_div(d2, jnp.maximum(denom, 1e-12)) / jnp.maximum(count, 1.0)

    okf = ok[..., None]
    merged_info = HitInfo(
        position=jnp.where(okf, target.position, info.position),
        normal=jnp.where(okf, target.normal, info.normal),
        uv=jnp.where(okf, target.uv, info.uv),
        instance=jnp.where(ok, target.instance, info.instance).astype(jnp.int32),
        material=jnp.where(ok, target.material, info.material).astype(jnp.int32),
    )
    merged = LightCandidate(
        direction=jnp.where(okf, ray_dir, candidate.direction),
        max_distance=jnp.where(ok, hit.t, candidate.max_distance),
        min_distance=jnp.where(ok, hit.t - 0.1, candidate.min_distance),
        emissive_instance=jnp.where(ok, em_inst, NO_EMISSIVE).astype(jnp.int32),
        p=jnp.where(ok, p_em, candidate.p),
    )
    return merged, merged_info


def input_radiance(
    scene: SceneBuffers,
    ray_direction,
    info: HitInfo,
    sample_directional: bool | jax.Array,
    sample_emissive_instance,  # (...,) i32, NO_EMISSIVE = none
    sample_ambient: bool | jax.Array,
    solar_angle: float,
):
    """Classify a ray's incoming radiance: sun / ambient on miss, emissive
    on hitting the sampled emissive instance (reference ``input_radiance``,
    light.wgsl:835-867). Returns (..., 4): rgb + (1 - ambient_flag)."""
    from hikari_tpu.render.brdf import compute_emissive_radiance, retrieve_emissive

    miss = info.instance < 0
    sun_dir, sun_cos = directional_cone(scene, solar_angle)
    hit_directional = dot3(ray_direction, jnp.broadcast_to(sun_dir, ray_direction.shape)) >= sun_cos

    sample_directional = jnp.asarray(sample_directional)
    sample_ambient = jnp.asarray(sample_ambient)

    take_sun = miss & sample_directional & hit_directional
    take_amb = miss & ~take_sun

    emissive = retrieve_emissive(scene, info.material, info.uv)
    em_radiance = compute_emissive_radiance(emissive)
    take_em = (~miss) & (info.instance == sample_emissive_instance)

    rgb = jnp.zeros(ray_direction.shape)
    rgb = jnp.where(take_sun[..., None], scene.sun_color, rgb)
    rgb = jnp.where(
        (take_amb & sample_ambient)[..., None], scene.ambient_color, rgb
    )
    rgb = jnp.where(take_em[..., None], em_radiance, rgb)

    ambient_flag = jnp.where(take_amb, 1.0, 0.0)
    return jnp.concatenate([rgb, (1.0 - ambient_flag)[..., None]], axis=-1)

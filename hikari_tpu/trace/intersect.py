"""Core intersection math: Möller-Trumbore and AABB slab tests as dense,
batched jnp ops (jnp equivalents of reference src/shaders/light.wgsl:344-398).

All functions broadcast over arbitrary leading dims — the pixel grid, the
triangle axis, or both — so the same code serves the brute-force (R x P)
path and the per-lane BVH walk.
"""

from __future__ import annotations

import jax.numpy as jnp

from hikari_tpu.config import F32_EPSILON, F32_MAX
from hikari_tpu.utils import dot3


def intersects_aabb(origin, inv_direction, aabb_min, aabb_max):
    """Slab test (reference light.wgsl:344-362). Returns entry distance
    t_min, or F32_MAX on miss (matching the reference's convention — the
    traversal compares ``t < best_distance``)."""
    t1 = (aabb_min - origin) * inv_direction
    t2 = (aabb_max - origin) * inv_direction
    t_min = jnp.max(jnp.minimum(t1, t2), axis=-1)
    t_max = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (t_max >= t_min) & (t_max >= 0.0)
    return jnp.where(hit, t_min, F32_MAX)


def inside_aabb(p, aabb_min, aabb_max):
    """Point-in-box (reference light.wgsl:340-342, strict inequalities)."""
    return jnp.all((p > aabb_min) & (p < aabb_max), axis=-1)


def intersects_triangle(origin, direction, v0, v1, v2):
    """Möller-Trumbore without backface culling (reference
    light.wgsl:364-398). Returns (t, u, v) with t = F32_MAX on miss.

    Shapes broadcast: origin/direction (...,3) against triangle vertices
    (...,3); typical uses are (R,1,3) x (1,P,3) -> (R,P).
    """
    ab = v1 - v0
    ac = v2 - v0
    u_vec = jnp.cross(direction, ac)
    det = dot3(ab, u_vec)
    # Guard the reciprocal; the validity mask re-applies the epsilon test.
    inv_det = 1.0 / jnp.where(jnp.abs(det) < F32_EPSILON, 1.0, det)
    ao = origin - v0
    u = dot3(ao, u_vec) * inv_det
    v_vec = jnp.cross(ao, ab)
    v = dot3(direction, v_vec) * inv_det
    t = dot3(ac, v_vec) * inv_det

    valid = (
        (jnp.abs(det) >= F32_EPSILON)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > F32_EPSILON)
    )
    return jnp.where(valid, t, F32_MAX), u, v


def triangle_aabb(tri):
    """(..., 3, 3) triangle -> (min (...,3), max (...,3)) — the reference
    recomputes leaf AABBs from vertices too (light.wgsl:409-412)."""
    return tri.min(axis=-2), tri.max(axis=-2)

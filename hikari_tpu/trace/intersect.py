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
    # Guard the reciprocal. DET_GUARD > F32_EPSILON bounds the BACKWARD
    # too: d(1/det)/d(det) = -1/det^2 overflows float32 near the epsilon
    # (grazing hits, e.g. an emissive quad viewed edge-on), turning into
    # NaN gradients. Forward values change only for |det| < 1e-6 —
    # extreme grazing hits already at the numerical noise floor.
    DET_GUARD = 1e-6
    safe_det = jnp.where(
        jnp.abs(det) < DET_GUARD,
        jnp.where(det < 0.0, -DET_GUARD, DET_GUARD),
        det,
    )
    inv_det = 1.0 / safe_det
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


def precompute_triangles(tri_world):
    """Plane + barycentric dual-basis precomputation for the MXU
    intersection path (TPU-first; no reference analogue — the reference
    re-derives everything per ray in traverse_bottom).

    For triangle (v0,v1,v2): e1=v1-v0, e2=v2-v0, n=cross(e1,e2);
    dual basis eu=cross(e2,n)/|n|^2, ev=cross(n,e1)/|n|^2, so that for a
    plane point p: u=(p-v0)·eu, v=(p-v0)·ev; and t=(v0·n - o·n)/(d·n).

    Returns dict of (P,3) n/eu/ev and (P,) cn/cu/cv plus valid mask.
    All per-ray work then reduces to o·[n|eu|ev] and d·[n|eu|ev] — two
    (R,3)x(3,3P) matmuls — plus ~15 elementwise ops per pair.
    """
    v0 = tri_world[:, 0]
    e1 = tri_world[:, 1] - v0
    e2 = tri_world[:, 2] - v0
    n = jnp.cross(e1, e2)
    n2 = jnp.sum(n * n, axis=-1, keepdims=True)
    valid = n2[..., 0] > 1e-24
    inv_n2 = 1.0 / jnp.maximum(n2, 1e-24)
    eu = jnp.cross(e2, n) * inv_n2
    ev = jnp.cross(n, e1) * inv_n2
    return dict(
        n=n,
        eu=eu,
        ev=ev,
        cn=jnp.sum(v0 * n, axis=-1),
        cu=jnp.sum(v0 * eu, axis=-1),
        cv=jnp.sum(v0 * ev, axis=-1),
        valid=valid,
    )


def intersect_precomputed(o, d, pre, sl):
    """Batched ray x triangle-block test using the precomputed form.
    o,d: (R,3); ``pre``: dict from precompute_triangles; ``sl``: slice or
    index array selecting the triangle block. Returns (t, u, v) with
    t=F32_MAX on miss, shapes (R, B). The two (R,3)@(3,3B) contractions
    are MXU work; the rest is elementwise VPU."""
    n = pre["n"][sl]
    eu = pre["eu"][sl]
    ev = pre["ev"][sl]
    basis = jnp.concatenate([n, eu, ev], axis=0).T  # (3, 3B)
    B = n.shape[0]
    o_dots = o @ basis  # (R, 3B)
    d_dots = d @ basis
    on, oeu, oev = o_dots[:, :B], o_dots[:, B : 2 * B], o_dots[:, 2 * B :]
    dn, deu, dev = d_dots[:, :B], d_dots[:, B : 2 * B], d_dots[:, 2 * B :]

    cn = pre["cn"][sl][None, :]
    cu = pre["cu"][sl][None, :]
    cv = pre["cv"][sl][None, :]
    valid_tri = pre["valid"][sl][None, :]

    safe_dn = jnp.where(jnp.abs(dn) < F32_EPSILON, 1.0, dn)
    t = (cn - on) / safe_dn
    u = (oeu - cu) + t * deu
    v = (oev - cv) + t * dev
    ok = (
        valid_tri
        & (jnp.abs(dn) >= F32_EPSILON)  # |det| == |d.n| (MT parity)
        & (t > F32_EPSILON)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
    )
    return jnp.where(ok, t, F32_MAX), u, v

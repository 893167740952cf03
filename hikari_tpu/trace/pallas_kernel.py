"""Pallas TPU kernel for the intersection hot loop.

The reference's hot loop is the per-ray stackless BVH walk
(src/shaders/light.wgsl:400-486). The TPU-first reformulation (SURVEY.md
§7 hard-parts #1) replaces divergent traversal with dense ray-block x
triangle-block testing; this module implements that inner loop as a
hand-written Pallas kernel shaped for the VPU's (8, 128) tiles:

* the grid partitions rays into blocks of RAY_BLOCK = 128 lanes;
* triangles ride the 8 SUBLANES: each inner step loads one (8, 16)
  packed-triangle tile and tests 8 triangles x 128 rays = 1024 pairs per
  vector op, with every operand a cheap (8,1)->(8,128) or
  (1,128)->(8,128) broadcast — no scalar extracts (the round-1 kernel's
  per-triangle scalar loads were the Mosaic bottleneck);
* the running closest hit is kept PER SUBLANE (lane j holds the best
  among triangles with index = j mod 8), so the inner loop has zero
  cross-sublane reductions; one 8-way select tree at the end of the ray
  block resolves the final winner;
* the full precomputed triangle table (plane + barycentric dual basis,
  trace/intersect.py) is VMEM-resident — up to ~200k triangles; larger
  scenes take the BVH walk path (trace/api.py method="bvh").

Same contract as the XLA brute-force path (trace/api.py): max distance,
instance exclusion, primitive-range restriction; drop-in
``method="pallas"`` backend, differential-tested against the others,
interpreted on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hikari_tpu.config import F32_EPSILON, F32_MAX

RAY_BLOCK = 128  # rays per grid step (one lane tile)
TRI_SUBLANES = 8  # triangles per inner iteration (one sublane tile)


def _kernel(
    o_ref,  # (1, 3, RAY_BLOCK) ray origins
    d_ref,  # (1, 3, RAY_BLOCK) ray directions
    maxd_ref,  # (1, 1, RAY_BLOCK)
    excl_ref,  # (1, 1, RAY_BLOCK) f32 (instance id)
    lo_ref,  # (1, 1, RAY_BLOCK) f32 (prim range)
    hi_ref,  # (1, 1, RAY_BLOCK) f32
    tri_ref,  # (P, 16) packed triangle data (VMEM resident)
    t_out,  # (1, 1, RAY_BLOCK)
    prim_out,  # (1, 1, RAY_BLOCK) int32
    u_out,  # (1, 1, RAY_BLOCK)
    v_out,  # (1, 1, RAY_BLOCK)
):
    P = tri_ref.shape[0]
    S = TRI_SUBLANES
    B = RAY_BLOCK

    def bc_ray(x):  # (B,) -> (S, B) sublane broadcast
        return jnp.broadcast_to(x.reshape(1, B), (S, B))

    ox = bc_ray(o_ref[0, 0, :])
    oy = bc_ray(o_ref[0, 1, :])
    oz = bc_ray(o_ref[0, 2, :])
    dx = bc_ray(d_ref[0, 0, :])
    dy = bc_ray(d_ref[0, 1, :])
    dz = bc_ray(d_ref[0, 2, :])
    maxd = bc_ray(maxd_ref[0, 0, :])
    excl = bc_ray(excl_ref[0, 0, :])
    lo = bc_ray(lo_ref[0, 0, :])
    hi = bc_ray(hi_ref[0, 0, :])

    # Per-sublane triangle index offset j (int iota -> f32: Mosaic only
    # vectorizes integer iota).
    joff = jax.lax.broadcasted_iota(jnp.int32, (S, B), 0).astype(jnp.float32)

    n_blocks = P // S

    def body(bi, carry):
        best_t, best_prim, best_u, best_v = carry
        blk = tri_ref[pl.ds(bi * S, S), :]  # (8, 16) one sublane tile

        def c(i):  # (8, 1) column -> broadcasts against (8, 128)
            return blk[:, i : i + 1]

        nx, ny, nz = c(0), c(1), c(2)
        eux, euy, euz = c(3), c(4), c(5)
        evx, evy, evz = c(6), c(7), c(8)
        cn, cu, cv = c(9), c(10), c(11)
        valid_tri = c(12)
        inst = c(13)
        prim_id = joff + (bi * S).astype(jnp.float32)  # (8,128) f32 ids

        dn = dx * nx + dy * ny + dz * nz
        on = ox * nx + oy * ny + oz * nz
        safe_dn = jnp.where(jnp.abs(dn) < F32_EPSILON, 1.0, dn)
        t = (cn - on) / safe_dn
        deu = dx * eux + dy * euy + dz * euz
        oeu = ox * eux + oy * euy + oz * euz
        dev = dx * evx + dy * evy + dz * evz
        oev = ox * evx + oy * evy + oz * evz
        u = (oeu - cu) + t * deu
        v = (oev - cv) + t * dev

        ok = (
            (valid_tri > 0.5)
            & (jnp.abs(dn) >= F32_EPSILON)
            & (t > F32_EPSILON)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t < best_t)
            & (t < maxd)
            & (inst != excl)
            & (prim_id >= lo)
            & (prim_id < hi)
        )
        return (
            jnp.where(ok, t, best_t),
            jnp.where(ok, prim_id, best_prim),
            jnp.where(ok, u, best_u),
            jnp.where(ok, v, best_v),
        )

    init = (
        jnp.minimum(maxd, F32_MAX),
        jnp.full((S, B), -1.0, dtype=jnp.float32),
        jnp.zeros((S, B)),
        jnp.zeros((S, B)),
    )
    t8, prim8, u8, v8 = jax.lax.fori_loop(0, n_blocks, body, init)

    # Cross-sublane select tree: resolve the per-ray winner among the 8
    # per-sublane running bests (log2(8) = 3 halving steps).
    def halve(t, p, u, v, s):
        t_a, t_b = t[:s], t[s : 2 * s]
        better = t_b < t_a
        return (
            jnp.where(better, t_b, t_a),
            jnp.where(better, p[s : 2 * s], p[:s]),
            jnp.where(better, u[s : 2 * s], u[:s]),
            jnp.where(better, v[s : 2 * s], v[:s]),
        )

    t4, p4, u4, v4 = halve(t8, prim8, u8, v8, 4)
    t2, p2, u2, v2 = halve(t4, p4, u4, v4, 2)
    t1, p1, u1, v1 = halve(t2, p2, u2, v2, 1)

    t_out[0, 0, :] = t1[0]
    prim_out[0, 0, :] = p1[0].astype(jnp.int32)
    u_out[0, 0, :] = u1[0]
    v_out[0, 0, :] = v1[0]


def pack_triangles(scene) -> jax.Array:
    """(P, 16) packed per-triangle data: n(3) eu(3) ev(3) cn cu cv valid
    inst pad(2). Row-major so one (8, 16) sublane tile serves 8
    triangles; f32 ids keep every kernel operand in one dtype."""
    P = scene.tri_n.shape[0]
    return jnp.concatenate(
        [
            scene.tri_n,
            scene.tri_eu,
            scene.tri_ev,
            scene.tri_cn[:, None],
            scene.tri_cu[:, None],
            scene.tri_cv[:, None],
            scene.tri_valid.astype(jnp.float32)[:, None],
            scene.tri_inst.astype(jnp.float32)[:, None],
            jnp.zeros((P, 2)),
        ],
        axis=1,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def trace_pallas(packed_tris, o, d, maxd, excl, lo, hi, interpret=False):
    """Closest-hit over all rays. o/d: (R, 3); scalars (R,). R must be a
    multiple of RAY_BLOCK (caller pads)."""
    R = o.shape[0]
    G = R // RAY_BLOCK

    o_t = o.T.reshape(3, G, RAY_BLOCK).swapaxes(0, 1)  # (G, 3, B)
    d_t = d.T.reshape(3, G, RAY_BLOCK).swapaxes(0, 1)

    def row(x):
        return x.astype(jnp.float32).reshape(G, 1, RAY_BLOCK)

    ray_spec = pl.BlockSpec(
        (1, 1, RAY_BLOCK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    vec_spec = pl.BlockSpec(
        (1, 3, RAY_BLOCK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )

    grid_spec = pl.GridSpec(
        grid=(G,),
        in_specs=[
            vec_spec,
            vec_spec,
            ray_spec,
            ray_spec,
            ray_spec,
            ray_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full triangle table
        ],
        out_specs=[ray_spec, ray_spec, ray_spec, ray_spec],
    )

    t, prim, u, v = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((G, 1, RAY_BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((G, 1, RAY_BLOCK), jnp.int32),
            jax.ShapeDtypeStruct((G, 1, RAY_BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((G, 1, RAY_BLOCK), jnp.float32),
        ],
        interpret=interpret,
    )(
        o_t,
        d_t,
        row(maxd),
        row(excl),
        row(lo),
        row(hi),
        packed_tris,
    )
    return (
        t.reshape(R),
        prim.reshape(R),
        u.reshape(R),
        v.reshape(R),
    )

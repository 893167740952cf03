"""Pallas TPU kernel for the intersection hot loop.

The reference's hot loop is the per-ray stackless BVH walk
(src/shaders/light.wgsl:400-486). The TPU-first reformulation (SURVEY.md
§7 hard-parts #1) replaces divergent traversal with dense ray-block x
triangle-block testing; this module implements that inner loop as a
hand-written Pallas kernel:

* the grid partitions rays into blocks of RAY_BLOCK lanes;
* the full precomputed triangle arrays (plane + barycentric dual basis,
  trace/intersect.py) are VMEM-resident — for benchmark-class scenes
  (<= a few thousand triangles) they fit with room to spare;
* the kernel streams triangle sub-blocks through the VPU, maintaining the
  running closest hit per ray in registers/VMEM, with all the traversal
  features of the reference walk (max distance, instance exclusion,
  primitive-range restriction).

The same contract as the XLA brute-force path (trace/api.py), so it is a
drop-in ``method="pallas"`` backend; correctness is differential-tested
against the other backends, including interpret mode on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hikari_tpu.config import F32_EPSILON, F32_MAX

RAY_BLOCK = 1024  # rays per grid step (8 sublanes x 128 lanes)
TRI_BLOCK = 8  # triangles per inner iteration


def _kernel(
    o_ref,  # (1, 3, RAY_BLOCK) ray origins
    d_ref,  # (1, 3, RAY_BLOCK) ray directions
    maxd_ref,  # (1, 1, RAY_BLOCK)
    excl_ref,  # (1, 1, RAY_BLOCK) int32
    lo_ref,  # (1, 1, RAY_BLOCK) int32
    hi_ref,  # (1, 1, RAY_BLOCK) int32
    tri_ref,  # (P, 16) packed triangle data (VMEM resident)
    t_out,  # (1, 1, RAY_BLOCK)
    prim_out,  # (1, 1, RAY_BLOCK) int32
    u_out,  # (1, 1, RAY_BLOCK)
    v_out,  # (1, 1, RAY_BLOCK)
):
    P = tri_ref.shape[0]
    ox, oy, oz = o_ref[0, 0, :], o_ref[0, 1, :], o_ref[0, 2, :]
    dx, dy, dz = d_ref[0, 0, :], d_ref[0, 1, :], d_ref[0, 2, :]
    maxd = maxd_ref[0, 0, :]
    excl = excl_ref[0, 0, :]
    lo = lo_ref[0, 0, :]
    hi = hi_ref[0, 0, :]

    n_blocks = P // TRI_BLOCK

    def body(bi, carry):
        best_t, best_prim, best_u, best_v = carry
        base = bi * TRI_BLOCK

        def tri_step(j, inner):
            bt, bp, bu, bv = inner
            row = tri_ref[pl.ds(base + j, 1), :]  # (1, 16)
            nx, ny, nz = row[0, 0], row[0, 1], row[0, 2]
            eux, euy, euz = row[0, 3], row[0, 4], row[0, 5]
            evx, evy, evz = row[0, 6], row[0, 7], row[0, 8]
            cn, cu, cv = row[0, 9], row[0, 10], row[0, 11]
            valid_tri = row[0, 12]
            inst = row[0, 13]
            prim_id = base + j

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
                & (t < bt)
                & (t < maxd)
                & (inst != excl.astype(jnp.float32))
                & (prim_id >= lo)
                & (prim_id < hi)
            )
            return (
                jnp.where(ok, t, bt),
                jnp.where(ok, prim_id, bp),
                jnp.where(ok, u, bu),
                jnp.where(ok, v, bv),
            )

        return jax.lax.fori_loop(0, TRI_BLOCK, tri_step, carry)

    init = (
        jnp.minimum(maxd, F32_MAX),
        jnp.full((RAY_BLOCK,), -1, dtype=jnp.int32),
        jnp.zeros((RAY_BLOCK,)),
        jnp.zeros((RAY_BLOCK,)),
    )
    t, prim, u, v = jax.lax.fori_loop(0, n_blocks, body, init)
    t_out[0, 0, :] = t
    prim_out[0, 0, :] = prim
    u_out[0, 0, :] = u
    v_out[0, 0, :] = v


def pack_triangles(scene) -> jax.Array:
    """(P, 16) packed per-triangle data: n(3) eu(3) ev(3) cn cu cv valid
    inst pad(2). Row-major so one VMEM block serves the whole kernel."""
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

    def row(x, dtype=None):
        x = x.reshape(G, 1, RAY_BLOCK)
        return x if dtype is None else x.astype(dtype)

    grid_spec = pl.GridSpec(
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 3, RAY_BLOCK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, RAY_BLOCK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, RAY_BLOCK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, RAY_BLOCK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, RAY_BLOCK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, RAY_BLOCK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full triangle table
        ],
        out_specs=[
            pl.BlockSpec((1, 1, RAY_BLOCK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, RAY_BLOCK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, RAY_BLOCK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, RAY_BLOCK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
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
        row(excl.astype(jnp.int32)),
        row(lo.astype(jnp.int32)),
        row(hi.astype(jnp.int32)),
        packed_tris,
    )
    return (
        t.reshape(R),
        prim.reshape(R),
        u.reshape(R),
        v.reshape(R),
    )

"""Pallas TPU kernel for the intersection hot loop.

The reference's hot loop is the per-ray stackless BVH walk
(src/shaders/light.wgsl:400-486). The TPU-first reformulation (SURVEY.md
§7 hard-parts #1) replaces divergent traversal with dense ray-block x
triangle-block testing; this module implements that inner loop as a
hand-written Pallas kernel shaped for the VPU's (8, 128) tiles:

* grid = (ray blocks, triangle tiles): rays ride the 128 LANES; the packed
  triangle table streams through VMEM one (TRI_TILE, 16) block per inner
  grid step (HBM->VMEM pipelined by Pallas), so scene size is unbounded —
  the round-1 kernel kept the whole table VMEM-resident and OOM'd >40k
  triangles;
* within a step, triangles ride the 8 SUBLANES: each inner iteration loads
  one (8, 16) tile and tests 8 triangles x 128 rays = 1024 pairs per
  vector op, every operand a cheap (8,1)->(8,128) or (1,128)->(8,128)
  broadcast — no scalar extracts (the round-1 kernel's per-triangle scalar
  loads were the Mosaic bottleneck);
* the running closest hit lives in VMEM scratch PER SUBLANE (sublane j
  holds the best among triangles with index = j mod 8), persisting across
  triangle grid steps; zero cross-sublane reductions in the hot loop; one
  8-way select tree when the last triangle tile retires.

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
RAY_ROWS = 8  # ray blocks per RESIDENT grid step (amortizes per-step DMA)
TRI_SUBLANES = 8  # triangles per inner iteration (one sublane tile)
TRI_TILE = 2048  # triangles streamed per grid step (128 KB of VMEM)


def _load_rays(o_ref, d_ref, maxd_ref, excl_ref, lo_ref, hi_ref, k=0):
    S, B = TRI_SUBLANES, RAY_BLOCK

    def bc_ray(x):  # (B,) -> (S, B) sublane broadcast
        return jnp.broadcast_to(x.reshape(1, B), (S, B))

    return (
        bc_ray(o_ref[k, 0, :]), bc_ray(o_ref[k, 1, :]), bc_ray(o_ref[k, 2, :]),
        bc_ray(d_ref[k, 0, :]), bc_ray(d_ref[k, 1, :]), bc_ray(d_ref[k, 2, :]),
        bc_ray(maxd_ref[k, 0, :]), bc_ray(excl_ref[k, 0, :]),
        bc_ray(lo_ref[k, 0, :]), bc_ray(hi_ref[k, 0, :]),
    )


def _tri_loop(tri_ref, rays, base, n_iters, carry):
    """fori_loop over (8, 16) sublane tiles of ``tri_ref``, testing 8
    triangles x 128 rays per vector op against the per-sublane running
    best in ``carry``. ``base``: global prim id of tri_ref row 0."""
    S, B = TRI_SUBLANES, RAY_BLOCK
    ox, oy, oz, dx, dy, dz, maxd, excl, lo, hi = rays
    joff = jax.lax.broadcasted_iota(jnp.int32, (S, B), 0).astype(jnp.float32)

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
        prim_id = joff + base + (bi * S).astype(jnp.float32)

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

    return jax.lax.fori_loop(0, n_iters, body, carry)


def _reduce_sublanes(t8, p8, u8, v8, t_out, prim_out, u_out, v_out, k=0):
    """Cross-sublane select tree: resolve the per-ray winner among the 8
    per-sublane running bests (log2(8) = 3 halving steps)."""

    def halve(t, p, u, v, s):
        t_a, t_b = t[:s], t[s : 2 * s]
        better = t_b < t_a
        return (
            jnp.where(better, t_b, t_a),
            jnp.where(better, p[s : 2 * s], p[:s]),
            jnp.where(better, u[s : 2 * s], u[:s]),
            jnp.where(better, v[s : 2 * s], v[:s]),
        )

    t4, p4, u4, v4 = halve(t8, p8, u8, v8, 4)
    t2, p2, u2, v2 = halve(t4, p4, u4, v4, 2)
    t1, p1, u1, v1 = halve(t2, p2, u2, v2, 1)

    t_out[k, 0, :] = t1[0]
    prim_out[k, 0, :] = p1[0].astype(jnp.int32)
    u_out[k, 0, :] = u1[0]
    v_out[k, 0, :] = v1[0]


def _kernel_resident(
    o_ref, d_ref, maxd_ref, excl_ref, lo_ref, hi_ref, tri_ref,
    t_out, prim_out, u_out, v_out,
):
    """Fast path: the whole (padded) triangle table is VMEM-resident and
    the running best lives in registers across one fori_loop — no scratch
    round-trips, 1D grid over RAY_ROWS-block ray super-blocks. Used when
    the table fits (<= TRI_TILE triangles). RAY_ROWS ray blocks per grid
    step amortize the per-step block DMA/bookkeeping: one (1,·,128) ray
    block is ~1.5 KB — at 16k grid steps per 2M-ray trace the per-step
    overhead, not the pair tests, bounded the round-3 kernel."""
    S, B = TRI_SUBLANES, RAY_BLOCK
    n_iters = tri_ref.shape[0] // S
    for k in range(RAY_ROWS):
        rays = _load_rays(o_ref, d_ref, maxd_ref, excl_ref, lo_ref, hi_ref, k)
        maxd = rays[6]
        init = (
            jnp.minimum(maxd, F32_MAX),
            jnp.full((S, B), -1.0, dtype=jnp.float32),
            jnp.zeros((S, B)),
            jnp.zeros((S, B)),
        )
        carry = _tri_loop(tri_ref, rays, jnp.float32(0.0), n_iters, init)
        _reduce_sublanes(*carry, t_out, prim_out, u_out, v_out, k)


def _kernel_streamed(
    o_ref, d_ref, maxd_ref, excl_ref, lo_ref, hi_ref, tri_ref,
    t_out, prim_out, u_out, v_out,
    t8, p8, u8, v8,
):
    """Streaming path: grid = (ray blocks, triangle tiles); one
    (TRI_TILE, 16) block per inner step (HBM->VMEM pipelined by Pallas),
    per-sublane running best persisted in VMEM scratch across tiles.
    Unbounded scene size."""
    S, B = TRI_SUBLANES, RAY_BLOCK
    tj = pl.program_id(1)
    n_tri_steps = pl.num_programs(1)
    rays = _load_rays(o_ref, d_ref, maxd_ref, excl_ref, lo_ref, hi_ref)
    maxd = rays[6]

    @pl.when(tj == 0)
    def _init():
        t8[:, :] = jnp.minimum(maxd, F32_MAX)
        p8[:, :] = jnp.full((S, B), -1.0, dtype=jnp.float32)
        u8[:, :] = jnp.zeros((S, B))
        v8[:, :] = jnp.zeros((S, B))

    tile_base = (tj * TRI_TILE).astype(jnp.float32)
    carry = (t8[:, :], p8[:, :], u8[:, :], v8[:, :])
    bt, bp, bu, bv = _tri_loop(tri_ref, rays, tile_base, TRI_TILE // S, carry)
    t8[:, :] = bt
    p8[:, :] = bp
    u8[:, :] = bu
    v8[:, :] = bv

    @pl.when(tj == n_tri_steps - 1)
    def _finalize():
        _reduce_sublanes(
            t8[:, :], p8[:, :], u8[:, :], v8[:, :],
            t_out, prim_out, u_out, v_out,
        )


def pack_triangles(scene) -> jax.Array:
    """(P', 16) packed per-triangle data, P' padded to TRI_TILE: n(3)
    eu(3) ev(3) cn cu cv valid inst pad(2). Row-major so one (8, 16)
    sublane tile serves 8 triangles; f32 ids keep every kernel operand in
    one dtype (exact for ids < 2^24)."""
    P = scene.tri_n.shape[0]
    packed = jnp.concatenate(
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
    # The scene buffers pad triangles to CLUSTER granularity (cornell:
    # 32 real tris ride a 128-row buffer); the tail rows are all-invalid
    # by construction (padding appended at compile), so trimming them is
    # exact — and on the sublane layout it is a REAL saving (32 tris = 4
    # sublane tiles instead of 16), unlike XLA's lane layout where
    # (R, 32) pads back to 128 lanes anyway. Dynamically deactivated
    # instances (inst_active streaming) sit before num_tris and keep
    # their runtime valid=0 masking.
    P = min(P, -(-int(scene.num_tris) // TRI_SUBLANES) * TRI_SUBLANES)
    packed = packed[:P]
    # Resident path (<= TRI_TILE tris): pad only to a sublane multiple so
    # small scenes don't iterate over a full tile of padding; streaming
    # path: pad to whole tiles.
    if P <= TRI_TILE:
        Pp = -(-P // TRI_SUBLANES) * TRI_SUBLANES
    else:
        Pp = -(-P // TRI_TILE) * TRI_TILE
    if Pp != P:
        packed = jnp.concatenate(
            [packed, jnp.zeros((Pp - P, 16), packed.dtype)]
        )
    return packed


@functools.partial(jax.jit, static_argnames=("interpret",))
def trace_pallas(packed_tris, o, d, maxd, excl, lo, hi, interpret=False):
    """Closest-hit over all rays. o/d: (R, 3); scalars (R,). R must be a
    multiple of RAY_BLOCK; on the resident path (scene fits one triangle
    tile) it must be a multiple of RAY_BLOCK * RAY_ROWS — the caller
    (_trace_pallas) pads to that. A bare RAY_BLOCK multiple would
    silently truncate the grid and leave trailing output blocks
    unwritten (ADVICE r4)."""
    R = o.shape[0]
    G = R // RAY_BLOCK
    GT = max(1, packed_tris.shape[0] // TRI_TILE)
    if GT == 1 and G % RAY_ROWS != 0:
        raise ValueError(
            f"resident pallas trace needs R % {RAY_BLOCK * RAY_ROWS} == 0 "
            f"(got R={R}); pad rays like trace/api._trace_pallas does"
        )

    o_t = o.T.reshape(3, G, RAY_BLOCK).swapaxes(0, 1)  # (G, 3, B)
    d_t = d.T.reshape(3, G, RAY_BLOCK).swapaxes(0, 1)

    def row(x):
        return x.astype(jnp.float32).reshape(G, 1, RAY_BLOCK)

    if GT == 1:
        # G is padded to a RAY_ROWS multiple by the caller (_trace_pallas).
        ray_spec = pl.BlockSpec(
            (RAY_ROWS, 1, RAY_BLOCK), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )
        vec_spec = pl.BlockSpec(
            (RAY_ROWS, 3, RAY_BLOCK), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )
        kernel = _kernel_resident
        grid = (G // RAY_ROWS,)
        tri_spec = pl.BlockSpec(memory_space=pltpu.VMEM)  # whole table
        scratch = []
    else:
        ray_spec = pl.BlockSpec(
            (1, 1, RAY_BLOCK), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        )
        vec_spec = pl.BlockSpec(
            (1, 3, RAY_BLOCK), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        )
        kernel = _kernel_streamed
        grid = (G, GT)
        tri_spec = pl.BlockSpec(
            (TRI_TILE, 16), lambda i, j: (j, 0), memory_space=pltpu.VMEM
        )
        scratch = [
            pltpu.VMEM((TRI_SUBLANES, RAY_BLOCK), jnp.float32)
            for _ in range(4)
        ]

    t, prim, u, v = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vec_spec, vec_spec, ray_spec, ray_spec, ray_spec, ray_spec,
                  tri_spec],
        out_specs=[ray_spec, ray_spec, ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((G, 1, RAY_BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((G, 1, RAY_BLOCK), jnp.int32),
            jax.ShapeDtypeStruct((G, 1, RAY_BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((G, 1, RAY_BLOCK), jnp.float32),
        ],
        scratch_shapes=scratch,
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

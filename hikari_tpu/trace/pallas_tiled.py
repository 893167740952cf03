"""Fused Pallas tile-walk: the large-scene tracer with true per-tile
early exit.

The XLA tile-binned backend (trace/tiled.py) walks all ray tiles in
LOCKSTEP: every `while_loop` step dense-tests every tile against its
next cluster, so retired tiles burn full compute until the worst tile
finishes, and each step re-gathers (T, CLUSTER, 14) of triangle data
from HBM. This kernel fuses the whole per-tile walk into one Pallas
grid step per tile, which is where the reference's divergent traversal
win (src/shaders/light.wgsl:400-486) actually comes from:

* grid = (T,) ray tiles, executed sequentially per core with the ray
  blocks pipelined HBM->VMEM by Pallas;
* each tile runs its OWN `while_loop` over its distance-sorted cluster
  list (phase 1, shared with trace/tiled.py, stays in XLA) and stops
  the moment its nearest unvisited cluster lies beyond every ray's
  current best hit — total work is sum(per-tile active clusters), not
  T * max(active clusters);
* cluster triangle blocks are double-buffered HBM->VMEM with explicit
  async DMA (one (CLUSTER, 16) block in flight while the previous one
  is tested), so the walk never stalls on memory;
* the dense test runs 8 triangles x TILE_R rays per vector op
  (triangles on sublanes, rays on lanes), with the running best kept
  per sublane in the loop carry; one 8-way select tree per tile at
  retirement.

Same contract as every other backend (trace/api.py): max/early
distance, instance exclusion, primitive-range restriction. Interpreted
on CPU for correctness tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hikari_tpu.config import F32_EPSILON, F32_MAX
from hikari_tpu.trace.tiled import (
    CLUSTER,
    _cluster_bounds,
    safe_inv_dir,
    tile_cluster_entries,
)

TILE_R = 512  # rays per tile (one grid step)
S = 8  # triangles per inner iteration (one sublane tile)


def pack_clusters(scene, cluster: int = CLUSTER):
    """(L*CLUSTER, 128) packed triangle rows (first 16 columns as
    trace/pallas_kernel.py: n(3) eu(3) ev(3) cn cu cv valid inst pad(2)),
    padded to whole clusters, plus the (L, 3) cluster AABBs.

    Each cluster's AABB additionally rides in row 0's padded columns
    16:22 (cmin xyz, cmax xyz) so the kernel can re-test the box against
    the rays' CURRENT bests after the DMA lands (the in-kernel cluster
    skip — phase-1 entries were computed against the initial max
    distance only)."""
    P = scene.tri_n.shape[0]
    packed = jnp.concatenate(
        [
            jax.lax.stop_gradient(scene.tri_n),
            jax.lax.stop_gradient(scene.tri_eu),
            jax.lax.stop_gradient(scene.tri_ev),
            jax.lax.stop_gradient(scene.tri_cn)[:, None],
            jax.lax.stop_gradient(scene.tri_cu)[:, None],
            jax.lax.stop_gradient(scene.tri_cv)[:, None],
            scene.tri_valid.astype(jnp.float32)[:, None],
            scene.tri_inst.astype(jnp.float32)[:, None],
            jnp.zeros((P, 2)),
        ],
        axis=1,
    )
    L = -(-P // cluster)
    Pp = L * cluster
    if Pp != P:
        packed = jnp.concatenate(
            [packed, jnp.zeros((Pp - P, 16), packed.dtype)]
        )
    # Pad rows to the full 128-lane width: Mosaic materializes the VMEM
    # destination lane-padded anyway, and HBM->VMEM DMA slices must be
    # tile-aligned. Costs 8x HBM bytes, still far below the compute time.
    packed = jnp.concatenate([packed, jnp.zeros((Pp, 112), packed.dtype)], axis=1)
    cmin, cmax, cvalid = _cluster_bounds(scene, cluster)
    row0 = jnp.arange(L, dtype=jnp.int32) * cluster
    packed = packed.at[row0, 16:22].set(
        jnp.concatenate([cmin, cmax], axis=1)
    )
    return packed, cmin, cmax, cvalid


def _make_kernel(tile_r: int, cluster: int, use_skip: bool = True):
    """Kernel specialized to (rays per tile, triangles per cluster).
    ``use_skip`` gates the in-kernel per-cluster AABB re-test against the
    rays' current bests (scene-dependent ±6%; see the note above
    trace_pallas_tiled)."""
    TILE_R, CLUSTER = tile_r, cluster

    def _kernel(
        order_ref,  # (1, 1, L) i32 SMEM: near-to-far cluster ids
        entry_ref,  # (1, 1, L) f32 SMEM: entry distances (ascending)
        rays_ref,  # (1, 16, TILE_R) f32 VMEM: o(3) d(3) maxd early excl lo hi
        tris_hbm,  # (L*CLUSTER, 128) f32 HBM: packed triangle rows
        t_out,  # (1, 1, TILE_R) f32
        p_out,  # (1, 1, TILE_R) i32
        u_out,  # (1, 1, TILE_R) f32
        v_out,  # (1, 1, TILE_R) f32
        tribuf,  # (2, CLUSTER, 128) f32 VMEM scratch (double buffer)
        sems,  # (2,) DMA semaphores
    ):
        L = order_ref.shape[2]

        def rrow(i):  # (1, TILE_R) ray row -> (S, TILE_R) sublane broadcast
            return jnp.broadcast_to(
                rays_ref[0, i, :].reshape(1, TILE_R), (S, TILE_R)
            )

        ox, oy, oz = rrow(0), rrow(1), rrow(2)
        dx, dy, dz = rrow(3), rrow(4), rrow(5)
        maxd, excl, lo, hi = rrow(6), rrow(8), rrow(9), rrow(10)
        early = rays_ref[0, 7, :].reshape(1, TILE_R)
        joff = jax.lax.broadcasted_iota(jnp.int32, (S, TILE_R), 0).astype(
            jnp.float32
        )

        # Single-sublane ray rows for the per-cluster slab test.
        def rrow1(i):
            return rays_ref[0, i, :].reshape(1, TILE_R)

        ox1, oy1, oz1 = rrow1(0), rrow1(1), rrow1(2)
        maxd1 = rrow1(6)
        # Per-ray retirement bound: beyond this distance the ray has no
        # clusters left to enter (tile_cluster_entries ray_maxent) — the
        # round-4 miss-ray fix (sky/unoccluded-shadow rays otherwise pin
        # the tile for the whole walk).
        maxent1 = rrow1(11)

        def sinv(x):
            return 1.0 / jnp.where(
                jnp.abs(x) < 1e-20, jnp.where(x < 0, -1e-20, 1e-20), x
            )

        ix1, iy1, iz1 = sinv(rrow1(3)), sinv(rrow1(4)), sinv(rrow1(5))

        def get_dma(j):
            slot = jax.lax.rem(j, 2)
            cid = order_ref[0, 0, jnp.minimum(j, L - 1)]
            base = pl.multiple_of(cid * CLUSTER, CLUSTER)
            return pltpu.make_async_copy(
                tris_hbm.at[pl.ds(base, CLUSTER), :],
                tribuf.at[slot],
                sems.at[slot],
            )

        get_dma(jnp.int32(0)).start()

        def test_cluster(slot, base, carry):
            """64 sublane tiles x (S, TILE_R) dense tests against the
            per-sublane running best."""

            def body(bi, carry):
                best_t, best_prim, best_u, best_v = carry
                blk = tribuf[slot, pl.ds(bi * S, S), :]  # (8, 128)

                def c(i):  # (8, 1) column -> broadcasts against (8, TILE_R)
                    return blk[:, i : i + 1]

                nx, ny, nz = c(0), c(1), c(2)
                eux, euy, euz = c(3), c(4), c(5)
                evx, evy, evz = c(6), c(7), c(8)
                cn, cu, cv = c(9), c(10), c(11)
                valid_tri = c(12)
                inst = c(13)
                prim_id = joff + base + jnp.float32(bi * S)

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

            # Static trip count: unroll fully so Mosaic software-pipelines
            # the (S, TILE_R) vector ops across sublane tiles instead of
            # serializing 8 tiny loop bodies per cluster.
            for bi in range(CLUSTER // S):
                carry = body(bi, carry)
            return carry

        init_best = (
            jnp.minimum(maxd, F32_MAX),
            jnp.full((S, TILE_R), -1.0, dtype=jnp.float32),
            jnp.zeros((S, TILE_R)),
            jnp.zeros((S, TILE_R)),
        )
        cont0 = entry_ref[0, 0, 0] < F32_MAX

        def cond(c):
            return c[1]

        def body(c):
            j, _, bt, bp, bu, bv = c
            slot = jax.lax.rem(j, 2)
            get_dma(j).wait()
            # Unconditional clamped prefetch of j+1 (re-testing a cluster is
            # idempotent; exactly one prefetch is always in flight, drained
            # after the loop).
            get_dma(j + 1).start()
            cid = order_ref[0, 0, jnp.minimum(j, L - 1)]
            base = (cid * CLUSTER).astype(jnp.float32)

            if not use_skip:
                bt, bp, bu, bv = test_cluster(slot, base, (bt, bp, bu, bv))
                e_next_ns = entry_ref[0, 0, jnp.minimum(j + 1, L - 1)]
                bt_ray_ns = jnp.min(bt, axis=0, keepdims=True)
                done_ns = jnp.any(
                    (bp >= 0.0) & (bt < early), axis=0, keepdims=True
                )
                open_ns = (
                    (~done_ns)
                    & (bt_ray_ns > e_next_ns)
                    & (maxent1 >= e_next_ns)
                )
                cont_ns = (
                    (j + 1 < L) & (e_next_ns < F32_MAX) & jnp.any(open_ns)
                )
                return (j + 1, cont_ns, bt, bp, bu, bv)

            # In-kernel cluster skip: re-test the cluster AABB (packed in
            # row 0, cols 16:22) against every ray's CURRENT best. Phase 1
            # queued this cluster against the initial max distance; once
            # rays find near hits, whole clusters become provably unable
            # to improve anyone (any hit inside the box has t >= slab
            # entry). The slab test runs on one sublane (~8% of a full
            # cluster test) and gates the 8-subtile dense test.
            ab = tribuf[slot, 0:1, 16:22]  # (1, 6)

            def a(i):
                return ab[:, i : i + 1]

            t0x, t1x = (a(0) - ox1) * ix1, (a(3) - ox1) * ix1
            t0y, t1y = (a(1) - oy1) * iy1, (a(4) - oy1) * iy1
            t0z, t1z = (a(2) - oz1) * iz1, (a(5) - oz1) * iz1
            tlo = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.minimum(t0z, t1z),
            )
            thi = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z),
            )
            box_entry = jnp.maximum(tlo, 0.0)
            bt_now = jnp.min(bt, axis=0, keepdims=True)  # (1, TILE_R)
            enters = (
                (thi >= box_entry) & (box_entry < bt_now) & (box_entry < maxd1)
            )
            bt, bp, bu, bv = jax.lax.cond(
                jnp.any(enters),
                lambda carry: test_cluster(slot, base, carry),
                lambda carry: carry,
                (bt, bp, bu, bv),
            )

            # Retire once the next-nearest cluster lies beyond every ray's
            # best (entries ascend) or every ray has early-terminated.
            e_next = entry_ref[0, 0, jnp.minimum(j + 1, L - 1)]
            bt_ray = jnp.min(bt, axis=0, keepdims=True)  # (1, TILE_R)
            done_early = jnp.any((bp >= 0.0) & (bt < early), axis=0,
                                 keepdims=True)
            ray_open = (
                (~done_early) & (bt_ray > e_next) & (maxent1 >= e_next)
            )
            cont = (j + 1 < L) & (e_next < F32_MAX) & jnp.any(ray_open)
            return (j + 1, cont, bt, bp, bu, bv)

        jf, _, t8, p8, u8, v8 = jax.lax.while_loop(
            cond, body, (jnp.int32(0), cont0) + init_best
        )
        get_dma(jf).wait()  # drain the dangling prefetch (or the j=0 start)

        # Cross-sublane select tree: per-ray winner among 8 running bests.
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
        t_out[0, 0, :] = t1[0]
        p_out[0, 0, :] = p1[0].astype(jnp.int32)
        u_out[0, 0, :] = u1[0]
        v_out[0, 0, :] = v1[0]

    return _kernel


# use_skip (off by default, correctness-neutral — see the test in
# tests/test_trace.py): in-kernel per-cluster AABB re-test against the
# rays' CURRENT bests, gating the dense test. Measured on v5e
# (tools/ablate_tiled.py) it is scene-dependent within ±6% — city-8
# (52 clusters) 14.4 -> 13.5 Mrays/s, FlightHelmet (1481) 1.91 -> 2.01,
# terrain-1m (15672) 0.59 -> 0.56 — so it is NOT auto-enabled; no
# cluster-count threshold generalizes across those three. A
# supercluster-granularity phase 1 (16 clusters per slab test, repaired
# by this skip) was also measured and REJECTED: the coarser near-to-far
# order roughly halves throughput (helmet 1.91 -> 0.98).


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "tile_r", "cluster", "use_skip"),
)
def trace_pallas_tiled(
    packed, cmin, cmax, cvalid, o, d, maxd, early, excl, lo, hi,
    interpret=False, tile_r: int = TILE_R, cluster: int = CLUSTER,
    use_skip: bool = False,
):
    """Closest-hit over (R,) flat rays, R a multiple of tile_r (caller
    pads + sorts, trace/api.py). Returns (t, prim, u, v)."""
    TILE_R_, CLUSTER_ = tile_r, cluster
    R = o.shape[0]
    T = R // TILE_R_
    L = cmin.shape[0]

    ot = o.reshape(T, TILE_R_, 3)
    inv_d = safe_inv_dir(d).reshape(T, TILE_R_, 3)
    maxdt = maxd.reshape(T, TILE_R_)
    entry_min, ray_maxent = tile_cluster_entries(
        cmin, cmax, cvalid, ot, inv_d, maxdt,
        lo.astype(jnp.float32).reshape(T, TILE_R_),
        hi.astype(jnp.float32).reshape(T, TILE_R_),
        CLUSTER_,
    )  # (T, L), (T, TILE_R_)
    order = jnp.argsort(entry_min, axis=1).astype(jnp.int32)
    entry_sorted = jnp.take_along_axis(entry_min, order, axis=1)
    order = order[:, None]  # (T, 1, L): unit sublane dim for SMEM blocks
    entry_sorted = entry_sorted[:, None]
    Lk = order.shape[2]

    rays = jnp.stack(
        [
            o[:, 0], o[:, 1], o[:, 2],
            d[:, 0], d[:, 1], d[:, 2],
            maxd.astype(jnp.float32),
            early.astype(jnp.float32),
            excl.astype(jnp.float32),
            lo.astype(jnp.float32),
            hi.astype(jnp.float32),
            ray_maxent.reshape(R),
        ]
        + [jnp.zeros((R,))] * 4,
        axis=0,
    )  # (16, R)
    rays = rays.reshape(16, T, TILE_R_).swapaxes(0, 1)  # (T, 16, TILE_R_)

    row_spec = pl.BlockSpec(
        (1, 1, TILE_R_), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    t, prim, u, v = pl.pallas_call(
        _make_kernel(TILE_R_, CLUSTER_, use_skip),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, Lk), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 1, Lk), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 16, TILE_R_), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),  # triangles stay in HBM
        ],
        out_specs=[row_spec, row_spec, row_spec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct((T, 1, TILE_R_), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, TILE_R_), jnp.int32),
            jax.ShapeDtypeStruct((T, 1, TILE_R_), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, TILE_R_), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, CLUSTER_, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(order, entry_sorted, rays, packed)
    return t.reshape(R), prim.reshape(R), u.reshape(R), v.reshape(R)

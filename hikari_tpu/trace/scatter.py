"""Cluster-major wavefront tracing — exact (ray, cluster) work
compaction for incoherent large-scene rays.

The tile-walk backends (trace/tiled.py, trace/pallas_tiled.py) test
every ray in a tile against the UNION of clusters any tile ray enters;
on incoherent bounce rays that union is ~16x the per-ray entered count
(measured on FlightHelmet: tile unions ~250 clusters vs ~15 per ray).
This backend pays only the exact entered pairs, the same reduction a
GPU wavefront path tracer gets from its per-ray traversal stack
(reference hot loop: src/shaders/light.wgsl:400-486):

1. phase A (XLA, chunked over rays): slab-test every ray against every
   cluster AABB -> per-cluster entered counts;
2. phase B (XLA, chunked): assign each entered (ray, cluster) pair a
   slot in a cluster-major item array via running per-cluster cursors +
   in-chunk cumsum ranks (each cluster's run padded to whole kernel
   blocks); scatter ray ids into the slots. Both phases are dense
   vector math + one bandwidth-bound scatter — no sorting;
3. kernel (Pallas): grid over item blocks. Each block belongs to ONE
   cluster; the (CLUSTER, 128) triangle rows are DMA'd into VMEM only
   when the cluster changes between consecutive blocks (runs are
   contiguous by construction), then 8-triangles-on-sublanes x
   128-items-on-lanes dense tests produce per-item closest hits;
4. segment-min (XLA): three bandwidth-bound scatter-mins resolve each
   ray's winner among its items (t bits, then item index for ties).

No near-to-far early exit exists here (items are unordered), but the
entered-pair floor is far below what early exit saves the tile walk.
Closest-hit semantics are exact; ``early_distance`` is accepted and
ignored (it is an optimization hint — returning the closest hit is
always a valid answer). Capacity: items beyond ``items_per_ray`` x R
(average, pooled across rays) are dropped — callers tracing highly
incoherent rays on dense geometry should raise it (see
``trace/api.py`` auto dispatch and bench_trace.py measurements).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hikari_tpu.config import F32_EPSILON, F32_MAX
from hikari_tpu.trace.pallas_tiled import pack_clusters

CLUSTER = 128  # triangles per cluster
BLOCK_R = 128  # items per kernel block
CHUNK = 65536  # rays per XLA compaction chunk
S = 8  # triangles per inner iteration (one sublane tile)


def _chunk_mask(cmin, cmax, cvalid, o, d, maxd, lo, hi):
    """(chunk, L) entered mask: slab hit before maxd, cluster valid, and
    cluster prim range overlapping the ray's [lo, hi) restriction."""
    inv = 1.0 / jnp.where(
        jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d
    )
    t0 = (cmin[None] - o[:, None]) * inv[:, None]  # (chunk, L, 3)
    t1 = (cmax[None] - o[:, None]) * inv[:, None]
    tlo = jnp.minimum(t0, t1).max(axis=-1)
    thi = jnp.maximum(t0, t1).min(axis=-1)
    entry = jnp.maximum(tlo, 0.0)
    L = cmin.shape[0]
    cstart = jnp.arange(L, dtype=jnp.int32) * CLUSTER
    range_ok = (cstart[None] < hi[:, None]) & (
        (cstart + CLUSTER)[None] > lo[:, None]
    )
    return (
        (thi >= entry)
        & (entry < maxd[:, None])
        & cvalid[None]
        & range_ok
    )


def _make_kernel(cluster: int):
    C = cluster

    def _kernel(
        meta_ref,  # (1, 1, 2) i32 SMEM: [cluster id, valid item count]
        fields_ref,  # (11, BLOCK_R) f32 VMEM: o(3) d(3) maxd excl lo hi valid
        tris_hbm,  # (L*C, 128) f32 HBM: packed triangle rows
        out_ref,  # (4, BLOCK_R) f32: t prim u v
        tribuf,  # (C, 128) f32 VMEM scratch: resident cluster
        resid,  # (1,) i32 SMEM scratch: which cluster is resident
        sem,  # DMA semaphore
    ):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _init():
            resid[0] = -1

        cb = meta_ref[0, 0, 0]
        cnt = meta_ref[0, 0, 1]

        @pl.when(cnt > 0)
        def _work():
            @pl.when(cb != resid[0])
            def _load():
                base = pl.multiple_of(cb * C, C)
                dma = pltpu.make_async_copy(
                    tris_hbm.at[pl.ds(base, C), :], tribuf, sem
                )
                dma.start()
                dma.wait()
                resid[0] = cb

            def rrow(i):  # (1, BLOCK_R) item row -> (S, BLOCK_R)
                return jnp.broadcast_to(
                    fields_ref[i, :].reshape(1, BLOCK_R), (S, BLOCK_R)
                )

            ox, oy, oz = rrow(0), rrow(1), rrow(2)
            dx, dy, dz = rrow(3), rrow(4), rrow(5)
            maxd, excl, lo, hi, valid = (
                rrow(6), rrow(7), rrow(8), rrow(9), rrow(10)
            )
            joff = jax.lax.broadcasted_iota(
                jnp.int32, (S, BLOCK_R), 0
            ).astype(jnp.float32)
            base_f = (cb * C).astype(jnp.float32)

            def body(bi, carry):
                best_t, best_prim, best_u, best_v = carry
                blk = tribuf[pl.ds(bi * S, S), :]  # (8, 128)

                def c(i):
                    return blk[:, i : i + 1]

                nx, ny, nz = c(0), c(1), c(2)
                eux, euy, euz = c(3), c(4), c(5)
                evx, evy, evz = c(6), c(7), c(8)
                cn, cu, cv = c(9), c(10), c(11)
                valid_tri = c(12)
                inst = c(13)
                prim_id = joff + base_f + (bi * S).astype(jnp.float32)

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
                    (valid > 0.5)
                    & (valid_tri > 0.5)
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
                jnp.full((S, BLOCK_R), F32_MAX),
                jnp.full((S, BLOCK_R), -1.0),
                jnp.zeros((S, BLOCK_R)),
                jnp.zeros((S, BLOCK_R)),
            )
            t8, p8, u8, v8 = jax.lax.fori_loop(0, C // S, body, init)

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
            out_ref[0, :] = t1[0]
            out_ref[1, :] = p1[0]
            out_ref[2, :] = u1[0]
            out_ref[3, :] = v1[0]

        @pl.when(cnt == 0)
        def _skip():
            out_ref[0, :] = jnp.full((BLOCK_R,), F32_MAX)
            out_ref[1, :] = jnp.full((BLOCK_R,), -1.0)
            out_ref[2, :] = jnp.zeros((BLOCK_R,))
            out_ref[3, :] = jnp.zeros((BLOCK_R,))

    return _kernel


@functools.partial(
    jax.jit, static_argnames=("interpret", "items_per_ray")
)
def trace_scatter(
    packed, cmin, cmax, cvalid, o, d, maxd, excl, lo, hi,
    interpret=False, items_per_ray: int = 32,
):
    """Closest-hit over (R,) flat rays (no ordering requirement).
    Returns (t, prim, u, v); misses carry t = min(maxd, F32_MAX),
    prim = -1."""
    R = o.shape[0]
    L = cmin.shape[0]
    chunk = min(CHUNK, R)
    n_chunks = -(-R // chunk)
    Rp = n_chunks * chunk

    def pad(x, fill):
        if Rp == R:
            return x
        return jnp.concatenate(
            [x, jnp.full((Rp - R,) + x.shape[1:], fill, dtype=x.dtype)]
        )

    op, dp = pad(o, 0.0), pad(d, 1.0)
    maxdp = pad(maxd, 0.0)  # padding rays enter nothing (maxd 0)
    exclp = pad(excl, -1)
    lop, hip = pad(lo, 0), pad(hi, 0)
    lof, hif = lop.astype(jnp.float32), hip.astype(jnp.float32)

    def sl(x, ci):
        return jax.lax.dynamic_slice_in_dim(x, ci * chunk, chunk)

    # ---- phase A: per-cluster entered counts ----
    def count_body(counts, ci):
        m = _chunk_mask(
            cmin, cmax, cvalid, sl(op, ci), sl(dp, ci), sl(maxdp, ci),
            sl(lof, ci), sl(hif, ci),
        )
        return counts + m.sum(axis=0, dtype=jnp.int32), None

    counts, _ = jax.lax.scan(
        count_body, jnp.zeros((L,), jnp.int32),
        jnp.arange(n_chunks, dtype=jnp.int32),
    )

    # Per-cluster runs padded to whole blocks; block -> cluster map.
    padded = -(-counts // BLOCK_R) * BLOCK_R
    cum = jnp.cumsum(padded)
    offsets = cum - padded  # (L,) start slot of each cluster's run
    CAP = -(-items_per_ray * R // BLOCK_R) * BLOCK_R + L * BLOCK_R
    NB = CAP // BLOCK_R
    bstart = jnp.arange(NB, dtype=jnp.int32) * BLOCK_R
    bc = jnp.searchsorted(cum, bstart, side="right").astype(jnp.int32)
    bc_safe = jnp.minimum(bc, L - 1)
    in_use = bstart < cum[-1]
    bcount = jnp.clip(
        counts[bc_safe] - (bstart - offsets[bc_safe]), 0, BLOCK_R
    )
    bcount = jnp.where(in_use, bcount, 0)
    meta = jnp.stack(
        [jnp.where(in_use, bc_safe, 0), bcount], axis=-1
    ).reshape(NB, 1, 2)

    # ---- phase B: scatter ray ids into cluster-major item slots ----
    def scatter_body(carry, ci):
        items, running = carry
        m = _chunk_mask(
            cmin, cmax, cvalid, sl(op, ci), sl(dp, ci), sl(maxdp, ci),
            sl(lof, ci), sl(hif, ci),
        )
        csum = jnp.cumsum(m.astype(jnp.int32), axis=0)  # inclusive
        pos = offsets[None] + running[None] + (csum - 1)
        flat = jnp.where(m, pos, CAP).ravel()
        rid = jnp.broadcast_to(
            (ci * chunk + jnp.arange(chunk, dtype=jnp.int32))[:, None],
            (chunk, L),
        ).ravel()
        items = items.at[flat].set(rid, mode="drop")
        return (items, running + csum[-1]), None

    items0 = jnp.full((CAP,), -1, jnp.int32)
    (items, _), _ = jax.lax.scan(
        scatter_body, (items0, jnp.zeros((L,), jnp.int32)),
        jnp.arange(n_chunks, dtype=jnp.int32),
    )

    # ---- item ray fields (channel-plane gathers) ----
    valid_item = items >= 0
    rid = jnp.maximum(items, 0)
    rays_t = jnp.stack(
        [
            op[:, 0], op[:, 1], op[:, 2],
            dp[:, 0], dp[:, 1], dp[:, 2],
            jnp.minimum(maxdp, F32_MAX),
            exclp.astype(jnp.float32),
            lof, hif,
        ],
        axis=0,
    )  # (10, Rp)
    fields = jnp.concatenate(
        [rays_t[:, rid], valid_item[None].astype(jnp.float32)], axis=0
    )  # (11, CAP)

    # ---- kernel: per-item closest hit within its cluster ----
    out = pl.pallas_call(
        _make_kernel(CLUSTER),
        grid=(NB,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (11, BLOCK_R), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (4, BLOCK_R), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((4, CAP), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((CLUSTER, 128), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(meta, fields, packed)
    it, iprim, iu, iv = out[0], out[1], out[2], out[3]

    # ---- segment-min per ray: winner by t bits, ties by item index ----
    tbits = jax.lax.bitcast_convert_type(it, jnp.uint32)  # t > 0 always
    sent = jnp.uint32(0xFFFFFFFF)
    tmin = jnp.full((Rp,), sent).at[rid].min(
        jnp.where(valid_item, tbits, sent)
    )
    idx = jnp.arange(CAP, dtype=jnp.int32)
    contender = valid_item & (tbits == tmin[rid])
    IMAX = jnp.int32(2**31 - 1)
    widx = jnp.full((Rp,), IMAX).at[rid].min(
        jnp.where(contender, idx, IMAX)
    )
    hit = (tmin < jax.lax.bitcast_convert_type(jnp.float32(F32_MAX),
                                               jnp.uint32))
    wsafe = jnp.minimum(widx, CAP - 1)
    t = jnp.where(hit, it[wsafe], jnp.minimum(maxdp, F32_MAX))
    prim = jnp.where(hit, iprim[wsafe].astype(jnp.int32), -1)
    u = jnp.where(hit, iu[wsafe], 0.0)
    v = jnp.where(hit, iv[wsafe], 0.0)
    return t[:R], prim[:R], u[:R], v[:R]

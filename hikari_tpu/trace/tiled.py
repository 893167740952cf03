"""Tile-binned cluster tracing — the TPU-native middle ground between
dense all-pairs testing and the gather-bound lockstep BVH walk.

The reference's answer to scene scale is the divergent per-ray stackless
walk (light.wgsl:400-486); on TPU that walk is dominated by per-ray
dynamic gathers. This backend restructures the hierarchy around what the
hardware does well (dense tiles, static shapes, tiny per-TILE gathers):

1. triangles are grouped into CLUSTERS of 512 consecutive primitives —
   consecutive in the compiled buffer means BVH-subtree order
   (scene/compile.py), so clusters are spatially tight;
2. rays are octant-sorted and grouped into TILES of 512; each tile
   slab-tests its rays against every cluster AABB once (dense, cheap) and
   sorts clusters by nearest entry distance;
3. a while_loop walks clusters near-to-far: at step j every still-active
   tile dense-tests its 512 rays against its j-th cluster's 512 triangles
   (one dynamic_slice of contiguous rows PER TILE — the only gather, and
   it is amortized over 512 rays). A tile retires when its next cluster's
   entry distance exceeds every ray's current best hit, and the loop ends
   when all tiles retire;
4. worst case degenerates to the dense test (exact by construction); the
   typical case tests ~L/10 clusters per tile.

Same contract as the other backends: max/early distance, instance
exclusion, primitive-range restriction (trace/api.py method="tiled").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hikari_tpu.config import F32_EPSILON, F32_MAX

CLUSTER = 512  # triangles per cluster
TILE_R = 512  # rays per tile
SUB_R = 128  # rays per inner dense sub-block


def _cluster_bounds(scene, cluster: int = CLUSTER):
    """(L, 3) min/max cluster AABBs + (L,) validity, from the padded
    triangle buffer (padding rows are degenerate zeros -> masked)."""
    tri = jax.lax.stop_gradient(scene.tri_world)  # (P, 3, 3)
    P = tri.shape[0]
    L = -(-P // cluster)
    Pp = L * cluster
    if Pp != P:
        tri = jnp.concatenate([tri, jnp.zeros((Pp - P, 3, 3), tri.dtype)])
    tmin = tri.min(axis=1).reshape(L, cluster, 3)
    tmax = tri.max(axis=1).reshape(L, cluster, 3)
    valid = scene.tri_valid
    if Pp != valid.shape[0]:
        valid = jnp.concatenate(
            [valid, jnp.zeros((Pp - valid.shape[0],), valid.dtype)]
        )
    vmask = valid.reshape(L, cluster)  # triangle validity
    big = jnp.float32(F32_MAX)
    cmin = jnp.where(vmask[..., None] > 0, tmin, big).min(axis=1)
    cmax = jnp.where(vmask[..., None] > 0, tmax, -big).max(axis=1)
    cvalid = (vmask > 0).any(axis=1)
    return cmin, cmax, cvalid


def _packed_tris(scene):
    """(Pp, 14) plane/dual-basis rows: n eu ev cn cu cv valid inst."""
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
        ],
        axis=1,
    )
    L = -(-P // CLUSTER)
    Pp = L * CLUSTER
    if Pp != P:
        packed = jnp.concatenate(
            [packed, jnp.zeros((Pp - P, 14), packed.dtype)]
        )
    return packed


def tile_cluster_entries(
    cmin, cmax, cvalid, ot, inv_d, maxdt, lot=None, hit_=None,
    cluster: int = CLUSTER,
):
    """Per-tile min cluster entry distances: slab-test each ray against
    each cluster AABB in (SUB_R, L) sub-blocks. ot/inv_d: (T, TILE_R, 3);
    maxdt: (T, TILE_R). Returns (entries (T, L), ray_maxent (T, TILE_R)):
    per-tile min entry over rays (F32_MAX where no ray enters), and per
    RAY the maximum finite entry over ALL clusters (-1 where the ray
    enters none).

    ray_maxent is the per-ray retirement bound for the near-to-far walk:
    once the tile's next (ascending, tile-min) entry e_next exceeds a
    ray's maxent, every remaining cluster's PERSONAL entry for that ray
    is >= e_next > maxent, yet any finite personal entry is <= maxent by
    definition — so all remaining personal entries are infinite and the
    ray provably cannot hit anything ahead. Without it, miss rays (sky
    pixels, unoccluded shadow rays — most of a city frame) keep best_t
    at max_distance and hold their whole tile in the walk for every
    cluster any neighbor might need (the round-4 city finding: 6
    trace dispatches at ~1 Mrays/s = ~95% of the 817 ms frame).

    ``lot``/``hit_`` (optional, (T, TILE_R) f32): the per-ray primitive
    range restriction [lo, hi). Clusters are CONTIGUOUS primitive chunks
    (``cluster`` prims each, BLAS DFS-leaf order), so a cluster whose
    index range misses [lo, hi) can be pruned here — phase 2's per-prim
    range mask would reject every test in it anyway. This is the whole
    trace for instance-restricted target rays (select_light_candidate's
    emissive target pick restricts to ONE instance's prims: on the 551k-
    tri city a ray needs ~2 of 2154 clusters) and retires range-empty
    rays (hi=0 pixels with no emissive pick) before the walk starts."""

    def tile_entry(ob, ib, mb, lb, hb):
        # ob/ib: (SUB_R, 3); mb/lb/hb: (SUB_R,). -> ((L,), (SUB_R,))
        t0 = (cmin[None] - ob[:, None]) * ib[:, None]  # (SUB_R, L, 3)
        t1 = (cmax[None] - ob[:, None]) * ib[:, None]
        tlo = jnp.minimum(t0, t1).max(axis=-1)
        thi = jnp.maximum(t0, t1).min(axis=-1)
        entry = jnp.maximum(tlo, 0.0)
        hit = (thi >= entry) & (entry < mb[:, None]) & cvalid[None]
        if lb is not None:
            # Cluster prim range [c*cluster, (c+1)*cluster) must meet the
            # ray's [lo, hi). f32 compares are exact below 2^24 prims
            # (asserted by the callers' prim_id lane packing).
            L_ = cmin.shape[0]
            c_lo = jnp.arange(L_, dtype=jnp.float32) * cluster  # (L,)
            hit = hit & (c_lo[None] < hb[:, None]) & (
                (c_lo + cluster)[None] > lb[:, None]
            )
        e = jnp.where(hit, entry, F32_MAX)
        rm = jnp.where(hit, entry, -1.0).max(axis=1)  # (SUB_R,)
        return e.min(axis=0), rm

    have_range = lot is not None
    if not have_range:
        lot = jnp.zeros_like(maxdt)
        hit_ = jnp.zeros_like(maxdt)

    def per_tile(args):
        oT, iT, mT, lT, hT = args
        subs = ot.shape[1] // SUB_R
        es, rms = [], []
        for s in range(subs):
            sl = slice(s * SUB_R, (s + 1) * SUB_R)
            e, rm = tile_entry(
                oT[sl], iT[sl], mT[sl],
                lT[sl] if have_range else None,
                hT[sl] if have_range else None,
            )
            es.append(e)
            rms.append(rm)
        return jnp.stack(es).min(axis=0), jnp.concatenate(rms)

    # Bound the (tiles_in_flight, SUB_R, L, 3) slab intermediate to
    # ~256 MB: a plain vmap over tiles materializes it for ALL tiles at
    # once, which at 1M rays x 1M triangles (L ~ 16k clusters) is ~15 GB
    # and OOMs the chip. lax.map's batch_size vmaps within a chunk and
    # scans across chunks (remainder handled), keeping phase 1 streaming.
    L = cmin.shape[0]
    per_tile_bytes = SUB_R * L * 3 * 4
    chunk = int(max(1, min(ot.shape[0], (256 << 20) // max(per_tile_bytes, 1))))
    return jax.lax.map(
        per_tile, (ot, inv_d, maxdt, lot, hit_), batch_size=chunk
    )  # ((T, L), (T, TILE_R))


def safe_inv_dir(d):
    """1/d with signed epsilon floor (slab-test convention)."""
    return 1.0 / jnp.where(
        jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d
    )


def trace_tiled(scene, o, d, maxd, early, excl, lo, hi):
    """Closest-hit over (R,) flat rays; R padded to TILE_R by the caller
    (trace/api.py). Returns (t, prim, u, v) arrays."""
    R = o.shape[0]
    T = R // TILE_R
    cmin, cmax, cvalid = _cluster_bounds(scene)
    packed = _packed_tris(scene)
    L = cmin.shape[0]
    # prim_id rides f32 lanes through the one-hot winner selects (below),
    # so ids are exact only while the padded primitive count stays under
    # 2^24 (currently ≤1M after padding; scene/compile.py would need an
    # i32 side channel before crossing 16.7M primitives).
    assert L * CLUSTER < 2**24, "f32 prim_id exact only below 2^24 prims"

    ot = o.reshape(T, TILE_R, 3)
    dt = d.reshape(T, TILE_R, 3)
    maxdt = maxd.reshape(T, TILE_R)
    earlyt = early.reshape(T, TILE_R)
    exclt = excl.reshape(T, TILE_R).astype(jnp.float32)
    lot = lo.reshape(T, TILE_R).astype(jnp.float32)
    hit_ = hi.reshape(T, TILE_R).astype(jnp.float32)

    # ---- phase 1: per-tile cluster entry distances ----
    inv_d = safe_inv_dir(dt)
    entry_min, ray_maxent = tile_cluster_entries(
        cmin, cmax, cvalid, ot, inv_d, maxdt, lot, hit_, CLUSTER
    )
    order = jnp.argsort(entry_min, axis=1)  # (T, L) near-to-far
    entry_sorted = jnp.take_along_axis(entry_min, order, axis=1)

    # ---- phase 2: near-to-far cluster walk ----
    prim_base = jnp.arange(CLUSTER, dtype=jnp.float32)

    def test_cluster(block, oT, dT, bestT, exclT, loT, hiT, maxdT, cid):
        """Dense test: (TILE_R,) rays vs one (CLUSTER, 14) block.
        Returns updated (t, prim, u, v)."""
        bt, bp, bu, bv = bestT
        n = block[:, 0:3]  # (C, 3)
        eu = block[:, 3:6]
        ev = block[:, 6:9]
        cn, cu, cv = block[:, 9], block[:, 10], block[:, 11]
        vmask = block[:, 12]
        inst = block[:, 13]
        prim_id = cid.astype(jnp.float32) * CLUSTER + prim_base  # (C,)

        for s in range(TILE_R // SUB_R):
            sl = slice(s * SUB_R, (s + 1) * SUB_R)
            ob, db = oT[sl], dT[sl]  # (SUB_R, 3)
            # (SUB_R, C) contractions on the MXU.
            dn = db @ n.T
            on = ob @ n.T
            deu = db @ eu.T
            oeu = ob @ eu.T
            dev = db @ ev.T
            oev = ob @ ev.T
            safe_dn = jnp.where(jnp.abs(dn) < F32_EPSILON, 1.0, dn)
            t = (cn[None] - on) / safe_dn
            u = (oeu - cu[None]) + t * deu
            v = (oev - cv[None]) + t * dev
            ok = (
                (vmask[None] > 0.5)
                & (jnp.abs(dn) >= F32_EPSILON)
                & (t > F32_EPSILON)
                & (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t < bt[sl][:, None])
                & (t < maxdT[sl][:, None])
                & (inst[None] != exclT[sl][:, None])
                & (prim_id[None] >= loT[sl][:, None])
                & (prim_id[None] < hiT[sl][:, None])
            )
            tm = jnp.where(ok, t, F32_MAX)
            j = jnp.argmin(tm, axis=1)  # (SUB_R,)
            # One-hot masked reduces instead of tm[rr, j] fancy indexing
            # (each is a row gather; gathers price per output row — the
            # same fix as api.py _trace_bruteforce). Exact selects.
            onehot = (
                jnp.arange(tm.shape[1], dtype=jnp.int32)[None, :]
                == j[:, None]
            )
            tj = jnp.sum(jnp.where(onehot, tm, 0.0), axis=1)
            pj = jnp.sum(jnp.where(onehot, prim_id[None, :], 0.0), axis=1)
            uj = jnp.sum(jnp.where(onehot, u, 0.0), axis=1)
            vj = jnp.sum(jnp.where(onehot, v, 0.0), axis=1)
            better = tj < bt[sl]
            bt = bt.at[sl].set(jnp.where(better, tj, bt[sl]))
            bp = bp.at[sl].set(jnp.where(better, pj, bp[sl]))
            bu = bu.at[sl].set(jnp.where(better, uj, bu[sl]))
            bv = bv.at[sl].set(jnp.where(better, vj, bv[sl]))
        return bt, bp, bu, bv

    def _tile_active(j, bt, bp):
        """Tiles whose next cluster exists, is hit, and could still beat a
        ray that hasn't early-terminated (entries ascend near-to-far).
        ray_maxent additionally retires rays whose personal cluster list
        is exhausted (see tile_cluster_entries) — without it miss rays
        pin their tile for the whole walk."""
        jc = jnp.minimum(j, L - 1)
        e_j = jnp.take_along_axis(entry_sorted, jc[None, None], axis=1)[:, 0]
        bt2 = bt.reshape(T, TILE_R)
        bp2 = bp.reshape(T, TILE_R)
        done_early = (bp2 >= 0) & (bt2 < earlyt)
        ray_open = (
            (~done_early)
            & (bt2 > e_j[:, None])
            & (ray_maxent >= e_j[:, None])
        )
        return (e_j < F32_MAX) & jnp.any(ray_open, axis=1), e_j

    def cond(carry):
        j, bt, bp, bu, bv = carry
        active, _ = _tile_active(j, bt, bp)
        return (j < L) & jnp.any(active)

    def body(carry):
        j, bt, bp, bu, bv = carry
        jc = jnp.minimum(j, L - 1)
        cid = jnp.take_along_axis(order, jc[None, None], axis=1)[:, 0]  # (T,)
        tile_active, _ = _tile_active(j, bt, bp)

        blocks = jax.vmap(
            lambda c: jax.lax.dynamic_slice(
                packed, (c * CLUSTER, 0), (CLUSTER, 14)
            )
        )(cid)  # (T, CLUSTER, 14)

        def tile_update(blk, oT, dT, btT, bpT, buT, bvT, exclT, loT, hiT,
                        maxdT, act, c):
            nt, np_, nu, nv = test_cluster(
                blk, oT, dT, (btT, bpT, buT, bvT), exclT, loT, hiT, maxdT, c
            )
            return (
                jnp.where(act, nt, btT),
                jnp.where(act, np_, bpT),
                jnp.where(act, nu, buT),
                jnp.where(act, nv, bvT),
            )

        bt2, bp2, bu2, bv2 = jax.vmap(tile_update)(
            blocks, ot, dt,
            bt.reshape(T, TILE_R), bp.reshape(T, TILE_R),
            bu.reshape(T, TILE_R), bv.reshape(T, TILE_R),
            exclt, lot, hit_, maxdt, tile_active, cid,
        )
        return (
            j + 1,
            bt2.reshape(R), bp2.reshape(R), bu2.reshape(R), bv2.reshape(R),
        )

    init = (
        jnp.zeros((), jnp.int32),
        jnp.minimum(maxd, F32_MAX).reshape(R),
        jnp.full((R,), -1.0, dtype=jnp.float32),
        jnp.zeros((R,)),
        jnp.zeros((R,)),
    )
    _, t, prim, u, v = jax.lax.while_loop(cond, body, init)
    return t, prim.astype(jnp.int32), u, v

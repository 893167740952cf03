"""Intersection-kernel tests (SURVEY.md §4): Möller-Trumbore vs analytic
hits, brute-force vs BVH agreement, exclusion and range restrictions,
and differentiable hit refinement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hikari_tpu.config import F32_MAX
from hikari_tpu.trace import (
    hit_info,
    intersects_aabb,
    intersects_triangle,
    refine_hit,
    trace_rays,
)


def test_triangle_analytic():
    v0 = jnp.array([0.0, 0.0, 0.0])
    v1 = jnp.array([1.0, 0.0, 0.0])
    v2 = jnp.array([0.0, 1.0, 0.0])
    o = jnp.array([0.25, 0.25, 1.0])
    d = jnp.array([0.0, 0.0, -1.0])
    t, u, v = intersects_triangle(o, d, v0, v1, v2)
    assert t == pytest.approx(1.0, rel=1e-6)
    assert u == pytest.approx(0.25, rel=1e-5)
    assert v == pytest.approx(0.25, rel=1e-5)

    # miss outside barycentric range
    o2 = jnp.array([0.9, 0.9, 1.0])
    t2, _, _ = intersects_triangle(o2, d, v0, v1, v2)
    assert t2 == F32_MAX

    # parallel ray misses
    d3 = jnp.array([1.0, 0.0, 0.0])
    t3, _, _ = intersects_triangle(o, d3, v0, v1, v2)
    assert t3 == F32_MAX

    # backface still hits (no culling, reference uses abs(det))
    t4, _, _ = intersects_triangle(
        jnp.array([0.25, 0.25, -1.0]), jnp.array([0.0, 0.0, 1.0]), v0, v1, v2
    )
    assert t4 == pytest.approx(1.0, rel=1e-6)


def test_aabb_analytic():
    o = jnp.array([0.0, 0.0, -5.0])
    inv_d = 1.0 / jnp.array([1e-12, 1e-12, 1.0])
    t = intersects_aabb(o, inv_d, jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0]))
    assert t == pytest.approx(4.0, rel=1e-5)
    # ray starting inside: t_min negative but hit (t_max>=0)
    t2 = intersects_aabb(
        jnp.zeros(3), inv_d, jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0])
    )
    assert t2 < 0 and t2 > -F32_MAX


def _random_rays(rng, n, spread=3.0):
    o = rng.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_bruteforce_vs_bvh(cornell_buffers, rng):
    o, d = _random_rays(rng, 512)
    hb = trace_rays(cornell_buffers, o, d, method="bruteforce")
    hv = trace_rays(cornell_buffers, o, d, method="bvh")
    np.testing.assert_allclose(np.asarray(hb.t), np.asarray(hv.t), rtol=1e-4)
    # same primitive except possible coplanar ties: compare instance + t
    same = np.asarray(hb.prim) == np.asarray(hv.prim)
    assert same.mean() > 0.99, same.mean()
    np.testing.assert_array_equal(np.asarray(hb.inst >= 0), np.asarray(hv.inst >= 0))


def test_exclusion(cornell_buffers, rng):
    o, d = _random_rays(rng, 256)
    h = trace_rays(cornell_buffers, o, d, method="bruteforce")
    hit_mask = np.asarray(h.inst) >= 0
    excl = h.inst
    h2 = trace_rays(cornell_buffers, o, d, exclude_instance=excl, method="bruteforce")
    # the excluded instance never reappears as the hit
    both = hit_mask & (np.asarray(h2.inst) >= 0)
    assert (np.asarray(h2.inst)[both] != np.asarray(excl)[both]).all()
    h3 = trace_rays(cornell_buffers, o, d, exclude_instance=excl, method="bvh")
    np.testing.assert_allclose(np.asarray(h2.t), np.asarray(h3.t), rtol=1e-4)


def test_range_restriction(cornell_buffers, rng):
    b = cornell_buffers
    o, d = _random_rays(rng, 256)
    inst = 2  # restrict to one wall
    lo = int(np.asarray(b.inst_prim_offset)[inst])
    hi = lo + int(np.asarray(b.inst_prim_count)[inst])
    h = trace_rays(b, o, d, range_lo=lo, range_hi=hi, method="bruteforce")
    prim = np.asarray(h.prim)
    ok = prim >= 0
    assert ((prim[ok] >= lo) & (prim[ok] < hi)).all()


def test_hit_info_normals(cornell_buffers, rng):
    b = cornell_buffers
    # rays from the box center outward hit walls with inward normals
    o = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (64, 1))
    d = jnp.asarray(
        np.random.default_rng(1).normal(size=(64, 3)).astype(np.float32)
    )
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    h = trace_rays(b, o, d, method="bruteforce")
    info = hit_info(b, o, d, h)
    hitm = np.asarray(h.prim) >= 0
    # The Cornell box is open at the front (no wall on the camera side),
    # so a fraction of directions escape.
    assert hitm.mean() > 0.75
    n = np.asarray(info.normal)[hitm]
    dd = np.asarray(d)[hitm]
    # double-sided quads: normal need not face the ray, but must be unit
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-4)
    pos = np.asarray(info.position)[hitm]
    assert (pos[:, 3] == 1.0).all()


def test_refine_hit_gradients(cornell_buffers):
    b = cornell_buffers
    o = jnp.array([[0.0, 1.0, 3.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    h = trace_rays(b, o, d, method="bruteforce")
    assert int(h.prim[0]) >= 0

    def dist(tri_world):
        s = jax.tree_util.tree_map(lambda x: x, b)
        s = type(b)(**{**{f: getattr(b, f) for f in b.__dataclass_fields__}, "tri_world": tri_world})
        t, _, _ = refine_hit(s, o, d, h)
        return t[0]

    g = jax.grad(dist)(b.tri_world)
    gn = np.asarray(g)
    # gradient is nonzero exactly on the hit triangle's vertices
    assert np.abs(gn[int(h.prim[0])]).sum() > 0
    mask = np.ones(len(gn), bool)
    mask[int(h.prim[0])] = False
    assert np.abs(gn[mask]).sum() == 0


def test_max_traversal_steps_cap(cornell_buffers):
    """settings.max_traversal_steps bounds the lockstep BVH walk: a tiny
    cap truncates the search (rays keep best-so-far), 0 = exact."""
    rng = np.random.default_rng(11)
    o = jnp.asarray(rng.uniform(-0.9, 0.9, (64, 3)).astype(np.float32))
    o = o.at[:, 1].add(1.0)
    d = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    full = trace_rays(cornell_buffers, o, d, method="bvh", max_steps=0)
    capped = trace_rays(cornell_buffers, o, d, method="bvh", max_steps=2)
    assert (np.asarray(full.prim) >= 0).sum() > (np.asarray(capped.prim) >= 0).sum()
    # A generous cap (>= node count) is exact.
    big = trace_rays(
        cornell_buffers, o, d, method="bvh",
        max_steps=cornell_buffers.num_nodes,
    )
    np.testing.assert_array_equal(np.asarray(full.prim), np.asarray(big.prim))


def test_bvh_ray_chunking_equivalence(cornell_buffers, monkeypatch):
    """The chunked lockstep walk (rays split into independent while_loops,
    trace/api.py BVH_RAY_CHUNK) returns identical hits to one big walk."""
    import hikari_tpu.trace.api as api

    rng = np.random.default_rng(5)
    o = jnp.asarray(rng.uniform(-0.9, 0.9, (300, 3)).astype(np.float32))
    o = o.at[:, 1].add(1.0)
    d = jnp.asarray(rng.normal(size=(300, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    full = trace_rays(cornell_buffers, o, d, method="bvh")
    monkeypatch.setattr(api, "BVH_RAY_CHUNK", 128)  # forces 3 chunks + pad
    chunked = trace_rays(cornell_buffers, o, d, method="bvh")
    np.testing.assert_array_equal(np.asarray(full.prim), np.asarray(chunked.prim))
    np.testing.assert_allclose(np.asarray(full.t), np.asarray(chunked.t), atol=1e-6)


def test_tiled_matches_bruteforce(cornell_buffers):
    """Tile-binned cluster tracing (trace/tiled.py) returns identical hits
    to the dense reference on mixed coherent/incoherent rays."""
    rng = np.random.default_rng(17)
    o = jnp.asarray(rng.uniform(-0.9, 0.9, (700, 3)).astype(np.float32))
    o = o.at[:, 1].add(1.0)
    d = jnp.asarray(rng.normal(size=(700, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    ref = trace_rays(cornell_buffers, o, d, method="bruteforce")
    til = trace_rays(cornell_buffers, o, d, method="tiled")
    np.testing.assert_array_equal(np.asarray(ref.prim), np.asarray(til.prim))
    np.testing.assert_allclose(np.asarray(ref.t), np.asarray(til.t), atol=1e-4)

    # Exclusion + max distance behave identically too.
    excl = jnp.asarray(rng.integers(-1, 8, (700,)).astype(np.int32))
    maxd = jnp.asarray(rng.uniform(0.5, 3.0, (700,)).astype(np.float32))
    ref2 = trace_rays(
        cornell_buffers, o, d, max_distance=maxd, exclude_instance=excl,
        method="bruteforce",
    )
    til2 = trace_rays(
        cornell_buffers, o, d, max_distance=maxd, exclude_instance=excl,
        method="tiled",
    )
    np.testing.assert_array_equal(np.asarray(ref2.prim), np.asarray(til2.prim))


def test_tiled_multicluster():
    """Multi-cluster walk (scene > CLUSTER triangles): exact vs dense."""
    from hikari_tpu.io.scenes import procedural_city, _sun_from_euler
    from hikari_tpu.scene import build_scene_buffers
    from hikari_tpu.scene.compile import Scene

    scene = procedural_city(
        Scene(materials=[], directional_light=_sun_from_euler(-1, 0.6, 0)),
        blocks=5,
    )
    b = build_scene_buffers(scene)
    assert b.num_tris > 512  # multiple clusters

    rng = np.random.default_rng(23)
    o = jnp.asarray(rng.uniform(-25, 25, (600, 3)).astype(np.float32))
    o = o.at[:, 1].set(jnp.abs(o[:, 1]) / 3 + 1.0)
    d = jnp.asarray(rng.normal(size=(600, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    ref = trace_rays(b, o, d, method="bruteforce")
    til = trace_rays(b, o, d, method="tiled")
    np.testing.assert_array_equal(np.asarray(ref.prim), np.asarray(til.prim))
    np.testing.assert_allclose(np.asarray(ref.t), np.asarray(til.t), atol=1e-3)


def test_pallas_tiled_matches_bruteforce():
    """Fused Pallas tile-walk (trace/pallas_tiled.py, interpreted on CPU):
    multi-cluster scene, mixed rays, full feature contract (max/early
    distance, exclusion, range restriction) vs the dense reference.
    Coplanar-tie prims may differ; t must agree everywhere."""
    from hikari_tpu.io.scenes import procedural_city, _sun_from_euler
    from hikari_tpu.scene import build_scene_buffers
    from hikari_tpu.scene.compile import Scene

    scene = procedural_city(
        Scene(materials=[], directional_light=_sun_from_euler(-1, 0.6, 0)),
        blocks=4,
    )
    b = build_scene_buffers(scene)
    assert b.num_tris > 512  # multiple clusters

    rng = np.random.default_rng(31)
    n = 700  # deliberately not a TILE_R multiple (exercises padding)
    o = jnp.asarray(rng.uniform(-20, 20, (n, 3)).astype(np.float32))
    o = o.at[:, 1].set(jnp.abs(o[:, 1]) / 3 + 1.0)
    d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    ref = trace_rays(b, o, d, method="bruteforce")
    pt = trace_rays(b, o, d, method="pallas_tiled")
    np.testing.assert_allclose(np.asarray(ref.t), np.asarray(pt.t), atol=1e-4)
    same = np.asarray(ref.prim) == np.asarray(pt.prim)
    assert same.mean() > 0.99, same.mean()
    np.testing.assert_array_equal(
        np.asarray(ref.prim >= 0), np.asarray(pt.prim >= 0)
    )

    excl = jnp.asarray(rng.integers(-1, 8, (n,)).astype(np.int32))
    maxd = jnp.asarray(rng.uniform(2.0, 30.0, (n,)).astype(np.float32))
    ref2 = trace_rays(
        b, o, d, max_distance=maxd, exclude_instance=excl,
        method="bruteforce",
    )
    pt2 = trace_rays(
        b, o, d, max_distance=maxd, exclude_instance=excl,
        method="pallas_tiled",
    )
    np.testing.assert_allclose(
        np.asarray(ref2.t), np.asarray(pt2.t), atol=1e-4
    )
    assert (np.asarray(ref2.prim) == np.asarray(pt2.prim)).mean() > 0.99

    # Range restriction to one instance's primitives.
    inst = 2
    lo = int(np.asarray(b.inst_prim_offset)[inst])
    hi = lo + int(np.asarray(b.inst_prim_count)[inst])
    pt3 = trace_rays(b, o, d, range_lo=lo, range_hi=hi, method="pallas_tiled")
    prim = np.asarray(pt3.prim)
    ok = prim >= 0
    assert ((prim[ok] >= lo) & (prim[ok] < hi)).all()
    ref3 = trace_rays(b, o, d, range_lo=lo, range_hi=hi, method="bruteforce")
    np.testing.assert_allclose(np.asarray(ref3.t), np.asarray(pt3.t), atol=1e-4)

    # Early distance: any-hit semantics — the returned hit must be a real
    # intersection no farther than the closest one would allow to stand
    # in for it (t <= early implies a valid occluder was found).
    early = jnp.full((n,), 5.0, dtype=jnp.float32)
    pt4 = trace_rays(b, o, d, early_distance=early, method="pallas_tiled")
    hit4 = np.asarray(pt4.prim) >= 0
    refhit = np.asarray(ref.prim) >= 0
    # early-exit may only be taken where a genuine hit exists
    assert (hit4 == refhit).all()
    t4 = np.asarray(pt4.t)
    t_ref = np.asarray(ref.t)
    # wherever the exact closest hit is beyond `early`, results agree
    far = refhit & (t_ref >= 5.0)
    np.testing.assert_allclose(t4[far], t_ref[far], atol=1e-4)
    # wherever early-exit could trigger, the returned t is a real hit
    # distance <= some intersection (at least as small as maxd bound)
    near = refhit & (t_ref < 5.0)
    assert (t4[near] < 5.0 + 1e-4).all()


def test_scatter_matches_bruteforce():
    """Cluster-major wavefront backend (trace/scatter.py, interpreted on
    CPU): exact closest hit via per-(ray, cluster) compaction. Same
    contract checks as the tile walk: max distance, instance exclusion,
    primitive-range restriction."""
    from hikari_tpu.io.scenes import procedural_city, _sun_from_euler
    from hikari_tpu.scene import build_scene_buffers
    from hikari_tpu.scene.compile import Scene

    scene = procedural_city(
        Scene(materials=[], directional_light=_sun_from_euler(-1, 0.6, 0)),
        blocks=4,
    )
    b = build_scene_buffers(scene)
    assert b.num_tris > 512  # multiple clusters

    rng = np.random.default_rng(47)
    n = 600
    o = jnp.asarray(rng.uniform(-20, 20, (n, 3)).astype(np.float32))
    o = o.at[:, 1].set(jnp.abs(o[:, 1]) / 3 + 1.0)
    d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    ref = trace_rays(b, o, d, method="bruteforce")
    sc = trace_rays(b, o, d, method="scatter")
    np.testing.assert_allclose(np.asarray(ref.t), np.asarray(sc.t), atol=1e-4)
    assert (np.asarray(ref.prim) == np.asarray(sc.prim)).mean() > 0.99
    np.testing.assert_array_equal(
        np.asarray(ref.prim >= 0), np.asarray(sc.prim >= 0)
    )

    excl = jnp.asarray(rng.integers(-1, 8, (n,)).astype(np.int32))
    maxd = jnp.asarray(rng.uniform(2.0, 30.0, (n,)).astype(np.float32))
    ref2 = trace_rays(
        b, o, d, max_distance=maxd, exclude_instance=excl,
        method="bruteforce",
    )
    sc2 = trace_rays(
        b, o, d, max_distance=maxd, exclude_instance=excl,
        method="scatter",
    )
    np.testing.assert_allclose(
        np.asarray(ref2.t), np.asarray(sc2.t), atol=1e-4
    )
    assert (np.asarray(ref2.prim) == np.asarray(sc2.prim)).mean() > 0.99

    inst = 2
    lo = int(np.asarray(b.inst_prim_offset)[inst])
    hi = lo + int(np.asarray(b.inst_prim_count)[inst])
    sc3 = trace_rays(b, o, d, range_lo=lo, range_hi=hi, method="scatter")
    prim = np.asarray(sc3.prim)
    ok = prim >= 0
    assert ((prim[ok] >= lo) & (prim[ok] < hi)).all()
    ref3 = trace_rays(b, o, d, range_lo=lo, range_hi=hi, method="bruteforce")
    np.testing.assert_allclose(np.asarray(ref3.t), np.asarray(sc3.t), atol=1e-4)


def test_auto_xla_dispatch():
    """auto_xla (the sharded pipeline's tracer mode, parallel/sharding.py)
    must never select a Pallas backend — pallas_call has no GSPMD
    partitioning rule — and must agree with the dense reference."""
    from hikari_tpu.io.scenes import procedural_city, _sun_from_euler
    from hikari_tpu.scene import build_scene_buffers
    from hikari_tpu.scene.compile import Scene

    scene = procedural_city(
        Scene(materials=[], directional_light=_sun_from_euler(-1, 0.6, 0)),
        blocks=4,
    )
    b = build_scene_buffers(scene)
    assert b.num_tris > 512

    rng = np.random.default_rng(5)
    o = jnp.asarray(rng.uniform(-15, 15, (256, 3)).astype(np.float32))
    o = o.at[:, 1].set(jnp.abs(o[:, 1]) / 3 + 1.0)
    d = jnp.asarray(rng.normal(size=(256, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    ref = trace_rays(b, o, d, method="bruteforce")
    ax = trace_rays(b, o, d, method="auto_xla")
    np.testing.assert_array_equal(np.asarray(ref.prim), np.asarray(ax.prim))
    np.testing.assert_allclose(np.asarray(ref.t), np.asarray(ax.t), atol=1e-3)


def test_pallas_tiled_inkernel_skip(monkeypatch):
    """The in-kernel per-cluster AABB skip (trace_pallas_tiled's
    ``use_skip``, an off-by-default measured tuning knob) re-tests each
    cluster's box against the rays' current bests and skips provably-dead
    clusters — it must never change the result. Forced on here via the
    module entry point trace/api.py resolves at call time."""
    import functools

    from hikari_tpu.io.scenes import procedural_city, _sun_from_euler
    from hikari_tpu.scene import build_scene_buffers
    from hikari_tpu.scene.compile import Scene
    from hikari_tpu.trace import pallas_tiled

    monkeypatch.setattr(
        pallas_tiled,
        "trace_pallas_tiled",
        functools.partial(pallas_tiled.trace_pallas_tiled, use_skip=True),
    )

    scene = procedural_city(
        Scene(materials=[], directional_light=_sun_from_euler(-1, 0.6, 0)),
        blocks=16,
    )
    b = build_scene_buffers(scene)
    assert -(-b.num_tris // 64) > 64  # long cluster lists

    rng = np.random.default_rng(77)
    n = 520
    o = jnp.asarray(rng.uniform(-30, 30, (n, 3)).astype(np.float32))
    o = o.at[:, 1].set(jnp.abs(o[:, 1]) / 3 + 1.0)
    d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    ref = trace_rays(b, o, d, method="bruteforce")
    pt = trace_rays(b, o, d, method="pallas_tiled")
    np.testing.assert_allclose(np.asarray(ref.t), np.asarray(pt.t), atol=1e-4)
    assert (np.asarray(ref.prim) == np.asarray(pt.prim)).mean() > 0.99
    np.testing.assert_array_equal(
        np.asarray(ref.prim >= 0), np.asarray(pt.prim >= 0)
    )

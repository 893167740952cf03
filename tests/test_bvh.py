"""BVH build/flatten invariants (SURVEY.md §4 test pyramid, unit tier):
entry/exit reachability, leaf flags, one-prim-per-leaf, AABB containment —
the structural contract the reference gets from the Rust bvh crate
(src/mesh_material/mod.rs:458-459) and never tests."""

import numpy as np
import pytest

from hikari_tpu.scene.bvh import (
    build_flat_bvh,
    build_flat_bvh_numpy,
    validate_flat_bvh,
)
from hikari_tpu.scene import native


def random_aabbs(rng, n, spread=10.0):
    centers = rng.uniform(-spread, spread, size=(n, 3))
    half = rng.uniform(0.01, 0.5, size=(n, 3))
    return (centers - half).astype(np.float32), (centers + half).astype(np.float32)


@pytest.mark.parametrize("n", [1, 2, 3, 7, 64, 257])
def test_invariants_numpy(rng, n):
    mins, maxs = random_aabbs(rng, n)
    bvh = build_flat_bvh_numpy(mins, maxs)
    validate_flat_bvh(bvh, n)
    assert bvh.count == (2 * n - 1 if n > 1 else 1)


@pytest.mark.parametrize("n", [1, 2, 5, 64, 1000])
def test_invariants_native(rng, n):
    builder = native.get_builder()
    assert builder is not None, "C++ builder failed to compile"
    mins, maxs = random_aabbs(rng, n)
    bvh = builder.build(mins, maxs)
    validate_flat_bvh(bvh, n)
    assert bvh.count == (2 * n - 1 if n > 1 else 1)


def test_root_bounds(rng):
    mins, maxs = random_aabbs(rng, 100)
    bvh = build_flat_bvh(mins, maxs)
    np.testing.assert_allclose(bvh.mins[0], mins.min(axis=0), rtol=1e-6)
    np.testing.assert_allclose(bvh.maxs[0], maxs.max(axis=0), rtol=1e-6)


def walk_collect_leaf_order(bvh):
    """Walk taking every entry branch; collect leaf prims in DFS order."""
    order = []
    idx, count = 0, bvh.count
    stack = [0]
    seen = set()
    while stack:
        i = stack.pop()
        if i >= count or i in seen:
            continue
        seen.add(i)
        if bvh.entry[i] < 0:
            order.append(-bvh.entry[i] - 1)
        else:
            stack.append(int(bvh.entry[i]))
        stack.append(int(bvh.exit[i]))
    return order


def test_traversal_equivalence_brute_force(rng):
    """Stackless walk with AABB tests finds the same closest prim as brute
    force over all AABBs (ray-marching the entry/exit graph on host)."""
    n = 200
    mins, maxs = random_aabbs(rng, n)
    bvh = build_flat_bvh(mins, maxs)
    validate_flat_bvh(bvh, n)

    def ray_aabb(o, inv_d, mn, mx):
        t1 = (mn - o) * inv_d
        t2 = (mx - o) * inv_d
        tmin = np.minimum(t1, t2).max(axis=-1)
        tmax = np.maximum(t1, t2).min(axis=-1)
        return np.where((tmax >= tmin) & (tmax >= 0), tmin, np.inf)

    for _ in range(50):
        o = rng.uniform(-15, 15, size=3)
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        inv_d = 1.0 / d

        # brute force: closest aabb entry t
        t_all = ray_aabb(o, inv_d, mins, maxs)
        best_brute = t_all.min()

        # stackless walk, treating each leaf's prim AABB hit t as "distance"
        best = np.inf
        idx = 0
        while idx < bvh.count:
            if bvh.entry[idx] < 0:
                prim = -bvh.entry[idx] - 1
                t = ray_aabb(o, inv_d, mins[prim], maxs[prim])
                best = min(best, float(t))
                idx = int(bvh.exit[idx])
            else:
                hit = ray_aabb(o, inv_d, bvh.mins[idx], bvh.maxs[idx])
                idx = int(bvh.entry[idx]) if hit < best else int(bvh.exit[idx])
        assert best == pytest.approx(best_brute, rel=1e-5) or (
            np.isinf(best) and np.isinf(best_brute)
        )

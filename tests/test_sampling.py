"""Sampling-pdf tests (SURVEY.md §4 tier 1): chi-square / moment checks of
the cosine-hemisphere, cone and triangle samplers against closed forms, and
the emissive-BVH reservoir walk's uniformity."""

import jax.numpy as jnp
import numpy as np

from hikari_tpu.render.sampling import (
    sample_cosine_hemisphere,
    sample_uniform_cone,
    sample_uniform_disk,
    sample_uniform_triangle_barycentric,
    select_light_candidate,
)
from hikari_tpu.utils import normal_basis, dot3


def _rand2(rng, n):
    return jnp.asarray(rng.uniform(size=(n, 2)).astype(np.float32))


def test_cosine_hemisphere_moments(rng):
    d, pdf = sample_cosine_hemisphere(_rand2(rng, 50_000))
    d = np.asarray(d)
    assert (d[:, 2] >= 0).all()
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)
    # E[cos theta] = 2/3 for cosine-weighted hemisphere
    np.testing.assert_allclose(d[:, 2].mean(), 2.0 / 3.0, atol=0.01)
    np.testing.assert_allclose(np.asarray(pdf), d[:, 2] / np.pi, atol=1e-4)


def test_uniform_cone(rng):
    cos_angle = 0.9
    d, pdf = sample_uniform_cone(_rand2(rng, 50_000), cos_angle)
    d = np.asarray(d)
    assert (d[:, 2] >= cos_angle - 1e-5).all()
    # uniform in z in [cos_angle, 1]
    np.testing.assert_allclose(d[:, 2].mean(), (1 + cos_angle) / 2, atol=0.002)
    np.testing.assert_allclose(
        np.asarray(pdf), 1.0 / (2 * np.pi * (1 - cos_angle)), rtol=1e-5
    )


def test_uniform_disk(rng):
    p = np.asarray(sample_uniform_disk(_rand2(rng, 50_000)))
    r = np.linalg.norm(p, axis=-1)
    assert (r <= 1.0 + 1e-6).all()
    # E[r] = 2/3 for uniform disk
    np.testing.assert_allclose(r.mean(), 2.0 / 3.0, atol=0.01)


def test_uniform_triangle(rng):
    b = np.asarray(sample_uniform_triangle_barycentric(_rand2(rng, 50_000)))
    assert (b >= 0).all() and (b.sum(-1) <= 1.0 + 1e-6).all()
    # Centroid of uniform barycentric samples = (1/3, 1/3)
    np.testing.assert_allclose(b.mean(axis=0), [1 / 3, 1 / 3], atol=0.01)


def test_normal_basis_orthonormal(rng):
    n = rng.normal(size=(1000, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    basis = np.asarray(normal_basis(jnp.asarray(n)))
    t, b, nz = basis[..., 0], basis[..., 1], basis[..., 2]
    np.testing.assert_allclose(nz, n, atol=1e-5)
    np.testing.assert_allclose((t * b).sum(-1), 0.0, atol=1e-4)
    np.testing.assert_allclose((t * n).sum(-1), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1.0, atol=1e-4)
    # local +Z maps to n
    v = np.einsum("nij,j->ni", basis, np.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(v, n, atol=1e-5)


def test_select_light_candidate_cornell(cornell_buffers, rng):
    """Inside the Cornell box, emissive selection should find the light
    quad and return a consistent pdf + target point on it."""
    b = cornell_buffers
    n = 256
    pos = jnp.asarray(
        np.stack(
            [
                rng.uniform(-0.8, 0.8, n),
                rng.uniform(0.2, 1.5, n),
                rng.uniform(-0.8, 0.8, n),
            ],
            axis=-1,
        ).astype(np.float32)
    )
    normal = jnp.tile(jnp.array([0.0, 1.0, 0.0]), (n, 1))
    rand = jnp.asarray(rng.uniform(size=(n, 4)).astype(np.float32))
    inst = jnp.zeros((n,), jnp.int32)
    cand, info = select_light_candidate(
        b, rand, pos, normal, inst, 0.046, sample_emissive=True,
        trace_method="bruteforce",
    )
    em = np.asarray(cand.emissive_instance)
    em_inst = int(np.asarray(b.em_instance)[0])
    frac = (em == em_inst).mean()
    assert frac > 0.8, frac  # upward normals see the ceiling light
    ok = em == em_inst
    # target points lie on the light instance's AABB
    tp = np.asarray(info.position)[ok, :3]
    lo = np.asarray(b.inst_min)[em_inst] - 1e-3
    hi = np.asarray(b.inst_max)[em_inst] + 1e-3
    assert ((tp >= lo) & (tp <= hi)).all()
    assert (np.asarray(cand.p)[ok] > 0).all()
    # directions point from the shading point toward the target
    d = np.asarray(cand.direction)[ok]
    delta = tp - np.asarray(pos)[ok]
    delta /= np.linalg.norm(delta, axis=-1, keepdims=True)
    # The target ray originates at position + normal*RAY_BIAS (0.02), so
    # direction-from-position deviates by up to ~bias/distance.
    np.testing.assert_allclose(d, delta, atol=0.04)

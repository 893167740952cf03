"""Alias-table probability invariants (SURVEY.md §4): the table's implied
per-bucket pdf equals area_i / total_area — the property the reference's
pour-loop construction (src/mesh_material/mod.rs:330-376) guarantees but
never tests."""

import numpy as np
import pytest

from hikari_tpu.scene.alias import (
    alias_sample_pdf,
    build_alias_table,
    build_alias_table_numpy,
)
from hikari_tpu.scene import native


@pytest.mark.parametrize("n", [1, 2, 3, 17, 256])
def test_pdf_matches_areas(rng, n):
    areas = rng.uniform(0.1, 5.0, size=n).astype(np.float32)
    prob, index = build_alias_table_numpy(areas)
    pdf = alias_sample_pdf(prob, index)
    np.testing.assert_allclose(pdf, areas / areas.sum(), rtol=1e-4)


def test_native_matches_numpy(rng):
    builder = native.get_builder()
    assert builder is not None
    areas = rng.uniform(0.1, 5.0, size=100).astype(np.float32)
    p0, i0 = build_alias_table_numpy(areas)
    p1, i1 = builder.build_alias_table(areas)
    pdf0 = alias_sample_pdf(p0, i0)
    pdf1 = alias_sample_pdf(p1, i1)
    np.testing.assert_allclose(pdf0, pdf1, atol=1e-5)


def test_uniform_areas():
    prob, index = build_alias_table(np.ones(8, dtype=np.float32))
    np.testing.assert_allclose(alias_sample_pdf(prob, index), np.full(8, 1 / 8), atol=1e-6)


def test_sampling_chi_square(rng):
    """Monte-carlo draw through the table (the sampler from
    light.wgsl:661-664) reproduces the target distribution."""
    areas = rng.uniform(0.5, 3.0, size=16).astype(np.float32)
    prob, index = build_alias_table(areas)
    n_draws = 200_000
    u = rng.uniform(size=n_draws)
    v = rng.uniform(size=n_draws)
    bucket = np.minimum((u * len(areas)).astype(np.int64), len(areas) - 1)
    chosen = np.where(v < prob[bucket], index[bucket], bucket)
    counts = np.bincount(chosen, minlength=len(areas))
    expected = areas / areas.sum() * n_draws
    chi2 = float(((counts - expected) ** 2 / expected).sum())
    # dof=15 -> p0.001 threshold ~ 37.7
    assert chi2 < 45.0, chi2

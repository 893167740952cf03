"""Reservoir-op unit tests (reference logic light.wgsl:138-179, 911-1004):
streaming update statistics, merge counts, clamp rescaling, validation
resets, Jacobian clamps."""

import jax.numpy as jnp
import numpy as np
import pytest

from hikari_tpu.render.restir import (
    Reservoir,
    Sample,
    check_previous_reservoir,
    clamp_reservoir,
    compute_jacobian,
    finalize_w,
    merge_reservoir,
    set_reservoir,
    temporal_restir,
    update_reservoir,
)


def mk_sample(shape=(4,), rand=0.5, radiance=1.0):
    s = Sample.zeros(shape)
    return Sample(
        radiance=jnp.full(shape + (4,), radiance),
        random=jnp.full(shape + (4,), rand),
        visible_position=s.visible_position,
        visible_normal=s.visible_normal,
        visible_instance=s.visible_instance,
        sample_position=s.sample_position,
        sample_normal=s.sample_normal,
    )


def test_set_reservoir():
    s = mk_sample()
    r = set_reservoir(s, jnp.full((4,), 2.0))
    assert (np.asarray(r.count) == 1.0).all()
    assert (np.asarray(r.w_sum) == 2.0).all()
    assert (np.asarray(r.w2_sum) == 4.0).all()
    assert (np.asarray(r.lifetime) == 0.0).all()


def test_update_reservoir_statistics():
    r = Reservoir.zeros((4,))
    s = mk_sample(rand=0.1)
    r = update_reservoir(r, s, jnp.full((4,), 3.0))
    assert (np.asarray(r.count) == 1.0).all()
    assert (np.asarray(r.w_sum) == 3.0).all()
    # rand = fract(0.4) = 0.4 < 3/3 -> replaced
    assert (np.asarray(r.s.radiance[..., 0]) == 1.0).all()


def test_update_reservoir_replacement_probability():
    # With w_new/w_sum tiny, the incoming sample should NOT replace.
    r = set_reservoir(mk_sample(rand=0.9, radiance=7.0), jnp.full((4,), 100.0))
    s2 = mk_sample(rand=0.9, radiance=1.0)  # fract(3.6)=0.6 > w/wsum
    r2 = update_reservoir(r, s2, jnp.full((4,), 0.001))
    assert (np.asarray(r2.s.radiance[..., 0]) == 7.0).all()
    assert (np.asarray(r2.count) == 2.0).all()


def test_merge_counts_add():
    a = set_reservoir(mk_sample(radiance=1.0), jnp.full((4,), 1.0))
    b = set_reservoir(mk_sample(radiance=2.0), jnp.full((4,), 1.0))
    b = Reservoir(s=b.s, count=jnp.full((4,), 5.0), lifetime=b.lifetime,
                  w=jnp.full((4,), 0.5), w_sum=b.w_sum, w2_sum=b.w2_sum)
    m = merge_reservoir(a, b, jnp.full((4,), 1.0))
    assert (np.asarray(m.count) == 6.0).all()
    # w_sum += p * other.w * other.count = 1*0.5*5
    np.testing.assert_allclose(np.asarray(m.w_sum), 3.5)


def test_clamp_rescales():
    r = set_reservoir(mk_sample(), jnp.full((4,), 10.0))
    r = Reservoir(s=r.s, count=jnp.full((4,), 100.0), lifetime=r.lifetime,
                  w=r.w, w_sum=jnp.full((4,), 50.0), w2_sum=jnp.full((4,), 25.0))
    c = clamp_reservoir(r, 50)
    np.testing.assert_allclose(np.asarray(c.count), 50.0)
    np.testing.assert_allclose(np.asarray(c.w_sum), 25.0)
    np.testing.assert_allclose(np.asarray(c.w2_sum), 12.5)


def test_temporal_restir_caps_count():
    r = Reservoir.zeros((2,))
    s = mk_sample(shape=(2,))
    for _ in range(10):
        r = temporal_restir(r, s, jnp.ones((2,)), max_count=4)
    assert (np.asarray(r.count) <= 4.0).all()


def test_check_previous_reservoir_resets_on_mismatch():
    shape = (3,)
    s = Sample.zeros(shape)
    s = Sample(
        radiance=s.radiance,
        random=jnp.zeros(shape + (4,)),
        visible_position=jnp.concatenate(
            [jnp.zeros(shape + (3,)), jnp.ones(shape + (1,))], -1
        ),
        visible_normal=jnp.tile(jnp.array([0.0, 0.0, 1.0]), shape + (1,)),
        visible_instance=jnp.array([1, 1, 1], dtype=jnp.int32),
        sample_position=s.sample_position,
        sample_normal=s.sample_normal,
    )
    r = set_reservoir(s, jnp.ones(shape))
    # depths: same, 2x off, same; instances: same, same, different
    prev_s = Sample(
        radiance=s.radiance,
        random=s.random,
        visible_position=jnp.stack(
            [
                jnp.array([0.0, 0, 0, 1.0]),
                jnp.array([0.0, 0, 0, 2.0]),
                jnp.array([0.0, 0, 0, 1.0]),
            ]
        ),
        visible_normal=s.visible_normal,
        visible_instance=jnp.array([1, 1, 2], dtype=jnp.int32),
        sample_position=s.sample_position,
        sample_normal=s.sample_normal,
    )
    r_prev = set_reservoir(prev_s, jnp.full(shape, 5.0))
    out, ok = check_previous_reservoir(r_prev, s)
    assert np.asarray(ok).tolist() == [True, False, False]
    assert np.asarray(out.count)[1] == 0.0
    assert np.asarray(out.count)[2] == 0.0
    assert np.asarray(out.count)[0] == 1.0


def test_finalize_w():
    r = set_reservoir(mk_sample(), jnp.full((4,), 6.0))
    r = Reservoir(s=r.s, count=jnp.full((4,), 3.0), lifetime=r.lifetime,
                  w=r.w, w_sum=jnp.full((4,), 6.0), w2_sum=r.w2_sum)
    out = finalize_w(r, jnp.full((4,), 2.0))
    np.testing.assert_allclose(np.asarray(out.w), 1.0)
    out0 = finalize_w(r, jnp.zeros((4,)))
    np.testing.assert_allclose(np.asarray(out0.w), 0.0)


def test_jacobian_clamped():
    q = Sample.zeros((8,))
    r = Sample.zeros((8,))
    j = compute_jacobian(q, r)
    assert (np.asarray(j) >= 1.0).all() and (np.asarray(j) <= 50.0).all()

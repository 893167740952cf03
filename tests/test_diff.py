"""Gradient tests (SURVEY.md §4 tier 3): autodiff pixel gradients vs
central finite differences for material and light parameters, plus
nonzero vertex gradients at fixed hit topology."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hikari_tpu.config import RenderSettings, Taa, Upscale
from hikari_tpu.diff import finite_difference_grad, replace_scene_field
from hikari_tpu.io.scenes import cornell_config
from hikari_tpu.render import initial_state, render_frame
from hikari_tpu.scene import build_scene_buffers


@pytest.fixture(scope="module")
def setup():
    """Spatial reuse disabled: the spatial pass detaches reservoir reuse
    (estimator machinery, see render/spatial.py policy note), so AD-vs-FD
    comparisons must run on the fully differentiable temporal path. The
    full-default config (spatial on) is covered by the finiteness test."""
    scene, cam, _ = cornell_config(size=24)
    settings = RenderSettings(
        width=24, height=24, upscale=Upscale.none(), denoise=True,
        taa=Taa.NONE, indirect_bounces=1, indirect_spatial_reuse=False,
        emissive_spatial_reuse=False,
        # f16 reservoir storage quantizes the forward response below FD's
        # epsilon (AD differentiates the cast exactly; central differences
        # see rounding steps) — the gate runs on the smooth f32 path.
        reservoir_f16=False,
    )
    buffers = build_scene_buffers(scene)
    state = initial_state(settings)
    return buffers, cam, state, settings


def _loss_fn(buffers, cam, state, settings, field):
    def f(value):
        b = replace_scene_field(buffers, **{field: value})
        out, _ = render_frame(b, cam, state, settings)
        return jnp.mean(out.image[..., :3])

    return jax.jit(f)


def test_base_color_grads_match_fd(setup):
    buffers, cam, state, settings = setup
    f = _loss_fn(buffers, cam, state, settings, "mat_base_color")
    x0 = buffers.mat_base_color
    g = np.asarray(jax.jit(jax.grad(f))(x0))
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0, "gradient identically zero"

    # Check the largest-magnitude entries against finite differences.
    flat_idx = np.argsort(-np.abs(g).reshape(-1))[:3]
    fd = finite_difference_grad(
        lambda x: f(jnp.asarray(x)), np.asarray(x0), eps=3e-3, indices=flat_idx
    )
    for i in flat_idx:
        a = g.reshape(-1)[i]
        b = fd.reshape(-1)[i]
        assert b == pytest.approx(a, rel=0.15, abs=1e-4), (i, a, b)


def test_emissive_grads_match_fd(setup):
    """FD on the continuous emissive path: with the emissive NEE channel
    and bounces disabled, the image depends on mat_emissive only through
    the direct channel's surface self-emission (RENDER_EMISSIVE), which is
    smooth. Full-pipeline FD would step across discrete ReSTIR reuse
    decisions (the estimator is differentiable a.e., not at eps scale)."""
    buffers, cam, state, _ = setup
    settings = RenderSettings(
        width=24, height=24, upscale=Upscale.none(), denoise=False,
        taa=Taa.NONE, indirect_bounces=0, emissive_lit=False,
        temporal_reuse=False,
    )
    state = initial_state(settings)
    f = _loss_fn(buffers, cam, state, settings, "mat_emissive")
    # Evaluate in the smooth region: at emissive=0 the tonemapper's
    # max(color, 0.0039) floor (reference tone_mapping.wgsl:29) clamps
    # black pixels, correctly zeroing AD while FD steps over the kink.
    x0 = buffers.mat_emissive + jnp.asarray([0.001, 0.001, 0.001, 0.0])
    g = np.asarray(jax.jit(jax.grad(f))(x0))
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0
    flat_idx = np.argsort(-np.abs(g).reshape(-1))[:3]
    fd = finite_difference_grad(
        lambda x: f(jnp.asarray(x)), np.asarray(x0), eps=1e-4, indices=flat_idx
    )
    for i in flat_idx:
        a = g.reshape(-1)[i]
        b = fd.reshape(-1)[i]
        assert b == pytest.approx(a, rel=0.15, abs=1e-4), (i, a, b)


def test_full_pipeline_grads_finite(setup):
    """Full pipeline (ReSTIR + spatial reuse + denoise): gradients must be
    finite and nonzero even where FD is not meaningful."""
    buffers, cam, state, _ = setup
    settings = RenderSettings(
        width=24, height=24, upscale=Upscale.none(), denoise=True,
        taa=Taa.NONE, indirect_bounces=1,
    )
    state = initial_state(settings)
    for field in ["mat_emissive", "mat_base_color"]:
        f = _loss_fn(buffers, cam, state, settings, field)
        g = np.asarray(jax.jit(jax.grad(f))(getattr(buffers, field)))
        assert np.isfinite(g).all(), field
        assert np.abs(g).sum() > 0, field


def test_light_grads(setup):
    buffers, cam, state, settings = setup
    f = _loss_fn(buffers, cam, state, settings, "ambient_color")
    g = np.asarray(jax.jit(jax.grad(f))(buffers.ambient_color))
    assert np.isfinite(g).all()
    assert (g != 0).any()


def test_vertex_grads_nonzero(setup):
    buffers, cam, state, settings = setup
    f = _loss_fn(buffers, cam, state, settings, "tri_world")
    g = np.asarray(jax.jit(jax.grad(f))(buffers.tri_world))
    assert np.isfinite(g).all()
    # fixed-topology gradients flow through hit refinement
    assert np.abs(g).sum() > 0


def test_firewall_bias_quantified(setup):
    """Quantify the pass-boundary firewall's clipping bias: gradients with
    the firewall vs exact gradients (HIKARI_NO_GRAD_CLIP=1) on a smooth
    config where both are finite. With the known quotient sites now exact
    (diff.stable_div), the remaining clip should engage rarely: bias bound
    asserted at <1% relative on material gradients."""
    import os

    buffers, cam, state, settings = setup

    def grads(field):
        f = _loss_fn(buffers, cam, state, settings, field)
        return np.asarray(jax.grad(f)(getattr(buffers, field)))

    g_clip = grads("mat_base_color")
    os.environ["HIKARI_NO_GRAD_CLIP"] = "1"
    try:
        g_exact = grads("mat_base_color")
    finally:
        del os.environ["HIKARI_NO_GRAD_CLIP"]

    assert np.isfinite(g_clip).all()
    assert np.isfinite(g_exact).all(), "exact grads non-finite; firewall load-bearing"
    denom = max(np.abs(g_exact).max(), 1e-12)
    rel = np.abs(g_clip - g_exact).max() / denom
    # Documented bias bound (VERDICT round-1 item 5).
    assert rel < 1e-2, f"firewall bias {rel:.3e} exceeds 1% bound"


def test_spatial_radiance_grads_flag():
    """settings.spatial_radiance_grads keeps reservoir radiance attached
    through the spatial-reuse merge: gradients stay finite and the
    emissive-parameter gradient changes vs the fully-detached policy."""
    scene, cam, _ = cornell_config(size=24)
    base = RenderSettings(
        width=24, height=24, upscale=Upscale.none(), denoise=False,
        taa=Taa.NONE, indirect_bounces=1, indirect_spatial_reuse=True,
        emissive_spatial_reuse=True, reservoir_f16=False,
    )
    buffers = build_scene_buffers(scene)
    state = initial_state(base)

    # Warm two frames so spatial reservoirs carry real samples.
    for _ in range(2):
        _, state = render_frame(buffers, cam, state, base)

    def grad_for(settings):
        f = _loss_fn(buffers, cam, state, settings, "mat_emissive")
        return np.asarray(jax.grad(f)(buffers.mat_emissive))

    g_detached = grad_for(base)
    g_attached = grad_for(base.replace(spatial_radiance_grads=True))
    assert np.isfinite(g_detached).all()
    assert np.isfinite(g_attached).all()
    assert np.abs(g_attached).sum() > 0
    # The attached policy routes additional gradient through the reuse
    # merge — the two must differ.
    assert not np.allclose(g_attached, g_detached)


def test_clip_engagement_counter(monkeypatch):
    """HIKARI_COUNT_CLIP=1 records per-site cotangent clamp engagement
    through the custom-vjp backward (round-2 VERDICT item 9)."""
    import jax
    import jax.numpy as jnp

    from hikari_tpu import diff

    monkeypatch.setenv("HIKARI_COUNT_CLIP", "1")
    diff.reset_clip_engagement()

    def f(x):
        return jnp.sum(diff.clip_gradient(x**2, 1e4, "test_site") * 1e9)

    g = jax.grad(f)(jnp.arange(4.0))
    jax.block_until_ready(g)
    rep = diff.clip_engagement_report()
    assert "test_site" in rep
    engaged, total, rate = rep["test_site"]
    assert total == 4 and engaged == 4  # every cotangent is 1e9 > 1e4
    # And the clip itself still applies.
    assert float(jnp.max(jnp.abs(g))) <= 1e4 * 2 * 3 + 1e-3
    diff.reset_clip_engagement()

"""Post-process unit tests: tone mapping math, YCoCg roundtrip, AABB color
clipping, FSR shapes (reference tone_mapping.wgsl / taa.wgsl / smaa.wgsl)."""

import jax.numpy as jnp
import numpy as np

from hikari_tpu.render.tonemap import (
    inverse_reinhard_luminance,
    reinhard_luminance,
    tone_mapping,
)
from hikari_tpu.render.taa import clip_towards_aabb_center
from hikari_tpu.utils import luminance, rgb_to_ycocg, ycocg_to_rgb


def test_reinhard_luminance():
    c = jnp.array([[2.0, 1.0, 0.5]])
    out = np.asarray(reinhard_luminance(c))
    l_old = float(luminance(c)[0])
    l_new = l_old / (1 + l_old)
    np.testing.assert_allclose(
        np.asarray(luminance(jnp.asarray(out)))[0], l_new, rtol=1e-5
    )
    # hue preserved (channel ratios unchanged)
    np.testing.assert_allclose(out[0] / out[0, 0], [1.0, 0.5, 0.25], rtol=1e-5)


def test_inverse_reinhard_roundtrip():
    c = jnp.array([[0.3, 0.2, 0.1]])
    fwd = reinhard_luminance(c)
    back = inverse_reinhard_luminance(fwd)
    np.testing.assert_allclose(np.asarray(back), np.asarray(c), rtol=1e-4)


def test_tone_mapping_clear_color():
    z = jnp.zeros((2, 2, 4))
    fg = z.at[..., 3].set(jnp.array([[1.0, 0.0], [0.0, 1.0]]))
    out = np.asarray(tone_mapping(fg, z, z, (0.1, 0.2, 0.3, 1.0)))
    np.testing.assert_allclose(out[0, 1, :3], [0.1, 0.2, 0.3], atol=1e-6)
    assert (out[0, 0, :3] > 0).all()  # floor 0.0039 through reinhard


def test_ycocg_roundtrip(rng):
    rgb = jnp.asarray(rng.uniform(size=(64, 3)).astype(np.float32))
    back = ycocg_to_rgb(rgb_to_ycocg(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)


def test_clip_towards_aabb_center():
    lo = jnp.array([0.0, 0.0, 0.0])
    hi = jnp.array([1.0, 1.0, 1.0])
    inside = jnp.array([0.5, 0.5, 0.5])
    np.testing.assert_allclose(
        np.asarray(clip_towards_aabb_center(inside, inside, lo, hi)),
        np.asarray(inside),
    )
    outside = jnp.array([2.0, 0.5, 0.5])
    clipped = np.asarray(clip_towards_aabb_center(outside, inside, lo, hi))
    assert (clipped <= np.asarray(hi) + 1e-5).all()
    assert (clipped >= np.asarray(lo) - 1e-5).all()


def test_fsr_shapes(rng):
    from hikari_tpu.render.fsr import fsr_upscale

    img = jnp.asarray(rng.uniform(size=(32, 32, 4)).astype(np.float32))
    up = fsr_upscale(img, (64, 64), sharpness=0.0)
    assert up.shape == (64, 64, 4)
    assert np.isfinite(np.asarray(up)).all()


def test_bloom_brightens_highlights(rng):
    from hikari_tpu.render.bloom import bloom

    img = jnp.zeros((64, 64, 3)).at[32, 32].set(jnp.array([20.0, 20.0, 20.0]))
    out = np.asarray(bloom(img, threshold=1.0, intensity=0.5))
    assert np.isfinite(out).all()
    # energy spreads to neighbors of the highlight
    assert out[32, 36].sum() > 0
    # bloom falls off with distance (deep mips spread a faint wide halo)
    assert out[16, 16].sum() < 0.05 * out[32, 36].sum()


def test_hdr_bloom_pipeline(cornell_buffers):
    from hikari_tpu.config import RenderSettings, Taa, Upscale
    from hikari_tpu.io.scenes import cornell_config
    from hikari_tpu.render import initial_state, render_frame_jit

    _, cam, _ = cornell_config(size=32)
    settings = RenderSettings(
        width=32, height=32, upscale=Upscale.none(), taa=Taa.NONE,
        denoise=False, hdr=True, bloom=True,
    )
    state = initial_state(settings)
    out, _ = render_frame_jit(cornell_buffers, cam, state, settings)
    assert np.isfinite(np.asarray(out.image)).all()


def test_fxaa_smooths_edges(rng):
    from hikari_tpu.render.fxaa import fxaa

    # jagged diagonal staircase: the aliasing pattern FXAA targets
    # (perfectly straight edges are correctly left alone)
    img = np.zeros((32, 32, 3), np.float32)
    for y in range(32):
        img[y, y:] = 1.0
    out = np.asarray(fxaa(jnp.asarray(img)))
    assert np.isfinite(out).all()
    # staircase corners get blended
    changed = np.abs(out - img).sum()
    assert changed > 0.1, changed
    # flat interior untouched
    np.testing.assert_allclose(out[24, 4], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[4, 28], [1, 1, 1], atol=1e-6)


def test_fxaa_pipeline(cornell_buffers):
    from hikari_tpu.config import RenderSettings, Taa, Upscale
    from hikari_tpu.io.scenes import cornell_config
    from hikari_tpu.render import initial_state, render_frame_jit

    _, cam, _ = cornell_config(size=32)
    settings = RenderSettings(
        width=32, height=32, upscale=Upscale.none(), taa=Taa.NONE,
        denoise=False, fxaa=True,
    )
    state = initial_state(settings)
    out, _ = render_frame_jit(cornell_buffers, cam, state, settings)
    assert np.isfinite(np.asarray(out.image)).all()


def test_fsr_easu_exact_algorithm(rng):
    """EASU (exact ffx_fsr1.h re-derivation): sharper than bilinear on
    edges, bounded by the 2x2 dering hull (no over/undershoot)."""
    from hikari_tpu.render.filters import bilinear_sample
    from hikari_tpu.render.fsr import easu
    from hikari_tpu.utils import uv_grid

    # Step edge (the adversarial case for ringing).
    img = np.zeros((32, 32, 3), np.float32)
    img[:, 16:] = 1.0
    img = jnp.asarray(img)
    up = np.asarray(easu(img, (64, 64)))
    # Dering hull: output within the global input range.
    assert up.min() >= -1e-6 and up.max() <= 1.0 + 1e-6
    bil = np.asarray(bilinear_sample(img, uv_grid((64, 64))))
    # Edge sharpness: the transition band (values strictly between
    # 0.05 and 0.95) is no wider than bilinear's.
    band_easu = ((up[32] > 0.05) & (up[32] < 0.95)).sum()
    band_bil = ((bil[32] > 0.05) & (bil[32] < 0.95)).sum()
    assert band_easu <= band_bil, (band_easu, band_bil)

    # Identity-ish: flat regions are preserved.
    flat = jnp.ones((16, 16, 3)) * 0.37
    upf = np.asarray(easu(flat, (32, 32)))
    np.testing.assert_allclose(upf, 0.37, atol=1e-5)


def test_fsr_rcas_no_clip(rng):
    """RCAS sharpens without ringing: output bounded by the local
    neighborhood (the limiter solves for the non-clipping gain)."""
    from hikari_tpu.render.fsr import rcas

    img = jnp.asarray(rng.uniform(size=(48, 48, 3)).astype(np.float32))
    out = np.asarray(rcas(img, sharpness=0.0))
    assert np.isfinite(out).all()
    # RCAS lobe is clamped so results stay in a sane range.
    assert out.min() >= -0.25 and out.max() <= 1.5

    # Sharpening increases local contrast on a soft edge.
    soft = np.zeros((32, 32, 3), np.float32)
    soft[:, :14] = 0.2
    soft[:, 14] = 0.4
    soft[:, 15] = 0.6
    soft[:, 16:] = 0.8
    sharpened = np.asarray(rcas(jnp.asarray(soft), sharpness=0.0))
    grad_in = np.abs(np.diff(soft[16, :, 1]))
    grad_out = np.abs(np.diff(sharpened[16, :, 1]))
    assert grad_out.max() >= grad_in.max()
    # sharpness=2 stops reduces the effect vs sharpness=0.
    mild = np.asarray(rcas(jnp.asarray(soft), sharpness=2.0))
    dev_max = np.abs(sharpened - soft).sum()
    dev_mild = np.abs(mild - soft).sum()
    assert dev_mild <= dev_max

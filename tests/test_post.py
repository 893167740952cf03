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

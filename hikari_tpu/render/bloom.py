"""Bloom: threshold + separable-Gaussian mip chain + additive composite.

The reference chains Bevy's built-in BloomNode after its overlay
(src/lib.rs:332-365 wires OVERLAY -> BLOOM -> TONEMAPPING -> ...), used by
the HDR example scenes (examples/simple.rs). This is the equivalent
physically-motivated bloom: bright-pass threshold, progressive downsample
with a 5-tap Gaussian, upsample-and-accumulate, additive blend — all
static-shape dense ops.
"""

from __future__ import annotations

import jax.numpy as jnp

from hikari_tpu.render.filters import bilinear_sample
from hikari_tpu.utils import luminance, uv_grid

_GAUSS = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def _blur_axis(img, axis):
    acc = img * _GAUSS[2]
    for k, off in ((0, -2), (1, -1), (3, 1), (4, 2)):
        acc = acc + jnp.roll(img, off, axis=axis) * _GAUSS[k]
    return acc


def _downsample(img):
    return 0.25 * (
        img[0::2, 0::2] + img[1::2, 0::2] + img[0::2, 1::2] + img[1::2, 1::2]
    )


def bloom(color, threshold: float = 1.0, intensity: float = 0.15, levels: int = 4):
    """color: (h, w, 3|4) linear HDR. Returns color + bloom."""
    rgb = color[..., :3]
    lum = luminance(rgb)
    soft = jnp.maximum(lum - threshold, 0.0) / jnp.maximum(lum, 1e-4)
    bright = rgb * soft[..., None]

    mips = []
    cur = bright
    for _ in range(levels):
        if min(cur.shape[0], cur.shape[1]) < 8:
            break
        cur = _downsample(cur)
        cur = _blur_axis(_blur_axis(cur, 0), 1)
        mips.append(cur)

    h, w = rgb.shape[0], rgb.shape[1]
    acc = jnp.zeros_like(rgb)
    uv = uv_grid((h, w))
    for i, m in enumerate(mips):
        acc = acc + bilinear_sample(m, uv) / (i + 1.0)

    out = rgb + intensity * acc
    if color.shape[-1] == 4:
        out = jnp.concatenate([out, color[..., 3:4]], axis=-1)
    return out

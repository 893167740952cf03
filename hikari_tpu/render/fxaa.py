"""FXAA 3.11 (console variant, simplified): luma-driven edge anti-alias.

The reference's render graph chains Bevy's FxaaNode after tonemapping
(src/lib.rs:332-365: ... -> TONEMAPPING -> FXAA -> UPSCALING). This is the
standard Lottes FXAA shape: local-contrast gate, edge-direction estimate
from the 3x3 luma neighborhood, then a blend along the perpendicular,
clamped by subpixel aliasing amount. Static-offset rolls only — dense VPU.
"""

from __future__ import annotations

import jax.numpy as jnp

from hikari_tpu.utils import luminance

EDGE_THRESHOLD_MIN = 0.0312
EDGE_THRESHOLD = 0.125
SUBPIXEL_QUALITY = 0.75


def _shift(img, dy, dx):
    out = jnp.roll(jnp.roll(img, -dy, axis=0), -dx, axis=1)
    return out


def fxaa(color):
    """color (h, w, 3|4) LDR -> anti-aliased, same shape."""
    rgb = color[..., :3]
    luma = luminance(jnp.clip(rgb, 0.0, 1.0))

    l_c = luma
    l_n = _shift(luma, -1, 0)
    l_s = _shift(luma, 1, 0)
    l_e = _shift(luma, 0, 1)
    l_w = _shift(luma, 0, -1)
    l_ne = _shift(luma, -1, 1)
    l_nw = _shift(luma, -1, -1)
    l_se = _shift(luma, 1, 1)
    l_sw = _shift(luma, 1, -1)

    l_min = jnp.minimum(l_c, jnp.minimum(jnp.minimum(l_n, l_s), jnp.minimum(l_e, l_w)))
    l_max = jnp.maximum(l_c, jnp.maximum(jnp.maximum(l_n, l_s), jnp.maximum(l_e, l_w)))
    rng = l_max - l_min
    active = rng >= jnp.maximum(EDGE_THRESHOLD_MIN, l_max * EDGE_THRESHOLD)

    # Edge orientation from second derivatives (FXAA console).
    edge_h = (
        jnp.abs(l_nw + l_ne - 2 * l_n)
        + 2 * jnp.abs(l_w + l_e - 2 * l_c)
        + jnp.abs(l_sw + l_se - 2 * l_s)
    )
    edge_v = (
        jnp.abs(l_nw + l_sw - 2 * l_w)
        + 2 * jnp.abs(l_n + l_s - 2 * l_c)
        + jnp.abs(l_ne + l_se - 2 * l_e)
    )
    horizontal = edge_h >= edge_v

    # Blend amount from average-neighborhood contrast (subpixel aliasing).
    l_avg = (2 * (l_n + l_s + l_e + l_w) + l_ne + l_nw + l_se + l_sw) / 12.0
    sub = jnp.clip(jnp.abs(l_avg - l_c) / jnp.maximum(rng, 1e-6), 0.0, 1.0)
    blend = jnp.square(sub * sub) * SUBPIXEL_QUALITY

    # Average across the edge (perpendicular direction).
    cross_avg = jnp.where(
        horizontal[..., None],
        0.5 * (_shift(rgb, -1, 0) + _shift(rgb, 1, 0)),
        0.5 * (_shift(rgb, 0, -1) + _shift(rgb, 0, 1)),
    )
    b = jnp.where(active, blend, 0.0)[..., None]
    out = rgb * (1.0 - b) + cross_avg * b
    if color.shape[-1] == 4:
        out = jnp.concatenate([out, color[..., 3:4]], axis=-1)
    return out

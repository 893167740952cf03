"""Tone mapping: sum the three lighting channels and apply
luminance-space Reinhard (reference src/shaders/tone_mapping.wgsl:21-32,
using ``reinhard_luminance`` from bevy_core_pipeline::tonemapping)."""

from __future__ import annotations

import jax.numpy as jnp

from hikari_tpu.utils import luminance


def reinhard_luminance(color):
    """l_new = l/(1+l); scale color by l_new/l_old (bevy tonemapping.wgsl)."""
    l_old = luminance(color)
    l_new = l_old / (1.0 + l_old)
    scale = l_new / jnp.maximum(l_old, 1e-8)
    return color * scale[..., None]


def inverse_reinhard_luminance(color):
    """Reference overlay HDR path (src/shaders/overlay.wgsl:27-31)."""
    l_old = jnp.clip(luminance(color), 0.0005, 0.995)
    l_new = l_old / (1.0 - l_old)
    return color * (l_new / jnp.maximum(l_old, 1e-8))[..., None]


def tone_mapping(direct, emissive, indirect, clear_color):
    """(rh,rw,4) channels in, (rh,rw,4) out. Alpha sums; background (a==0)
    becomes the clear color (tone_mapping.wgsl:24-31).

    Non-finite radiance is scrubbed to 0 here: everything downstream
    (SMAA/TAA) carries cross-frame history, and a single NaN texel would
    otherwise poison it permanently (the reference scrubs at the denoiser,
    denoise.wgsl:190/239, and falls back per-pixel at the overlay)."""
    color = direct + emissive + indirect
    color = jnp.where(jnp.isfinite(color), color, 0.0)
    rgb = reinhard_luminance(jnp.maximum(color[..., :3], 0.0039))
    out = jnp.concatenate([rgb, color[..., 3:4]], axis=-1)
    clear = jnp.asarray(clear_color)
    return jnp.where(color[..., 3:4] > 0.0, out, clear)

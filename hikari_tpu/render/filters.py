"""Texture-sampling primitives: the jnp analogues of the reference's
nearest/linear samplers and ``textureGather`` (used throughout
src/shaders/{taa,smaa,denoise}.wgsl). Clamp-to-edge addressing, image
layout (h, w, c), uv = (u right, v down) like WGSL."""

from __future__ import annotations

import jax.numpy as jnp

from hikari_tpu.utils import gather_pixels


def _uv_to_xy(img, uv):
    h, w = img.shape[0], img.shape[1]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    return x, y, h, w


def nearest_sample(img, uv):
    """textureSampleLevel(..., nearest) — (...,2) uv -> (..., c)."""
    h, w = img.shape[0], img.shape[1]
    x = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    return gather_pixels(img, y, x)


def bilinear_sample(img, uv):
    """textureSampleLevel(..., linear) with clamp addressing."""
    x, y, h, w = _uv_to_xy(img, uv)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    c00 = gather_pixels(img, y0i, x0i)
    c10 = gather_pixels(img, y0i, x1i)
    c01 = gather_pixels(img, y1i, x0i)
    c11 = gather_pixels(img, y1i, x1i)
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def texture_gather(img, uv, component: int):
    """WGSL ``textureGather(component, ...)``: the 4 texels bilinear would
    blend, order (x, y, z, w) = (-+, ++, +-, --) quadrants — returns
    (..., 4)."""
    x, y, h, w = _uv_to_xy(img, uv)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    c = img[..., component]
    # WGSL gather order: (umin,vmax), (umax,vmax), (umax,vmin), (umin,vmin)
    return jnp.stack(
        [c[y1, x0], c[y1, x1], c[y0, x1], c[y0, x0]], axis=-1
    )


def shift2d(img, dy: int, dx: int):
    """Shift so out[y, x] = img[y + dy, x + dx]; returns (shifted, valid)
    where valid marks in-bounds source texels (the reference skips
    out-of-bounds stencil taps, denoise.wgsl:122-125)."""
    h, w = img.shape[0], img.shape[1]
    shifted = jnp.roll(jnp.roll(img, -dy, axis=0), -dx, axis=1)
    ys = jnp.arange(h)[:, None] + dy
    xs = jnp.arange(w)[None, :] + dx
    valid = (ys >= 0) & (ys < h) & (xs >= 0) & (xs < w)
    return shifted, valid

"""Material textures: fixed-size texture stack with manual bilinear
sampling.

The reference binds a variable-count ``binding_array`` of textures +
samplers (mesh_material/mod.rs:488-675, sampled in retreive_surface,
light.wgsl:749-794). TPU gathers want uniform shapes, so at scene compile
every texture is resampled to one stack resolution (T, S, S, 4); sampling
is a manual bilinear gather with repeat addressing — uniform work per
pixel, id -1 = "no texture" (reference uses u32::MAX)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

TEXTURE_SIZE = 256


def resample_to_stack(images: list[np.ndarray], size: int = TEXTURE_SIZE) -> np.ndarray:
    """Host-side: resize a list of (h,w,3|4) uint8/float images to a
    uniform (T, size, size, 4) float32 stack in [0,1]."""
    from PIL import Image

    out = np.ones((max(len(images), 1), size, size, 4), dtype=np.float32)
    for i, img in enumerate(images):
        arr = np.asarray(img)
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 255.0
        if arr.shape[-1] == 3:
            arr = np.concatenate(
                [arr, np.ones(arr.shape[:-1] + (1,), dtype=np.float32)], axis=-1
            )
        pil = Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8), "RGBA")
        pil = pil.resize((size, size), Image.BILINEAR)
        out[i] = np.asarray(pil, dtype=np.float32) / 255.0
    return out


def sample_texture_stack(stack, tex_id, uv):
    """Bilinear sample with repeat addressing. ``tex_id`` (...,) i32 may be
    -1 (returns white). ``uv`` (...,2). Returns (...,4)."""
    T, S = stack.shape[0], stack.shape[1]
    safe_id = jnp.clip(tex_id, 0, T - 1)
    u = uv[..., 0] * S - 0.5
    v = uv[..., 1] * S - 0.5
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx = (u - x0)[..., None]
    fy = (v - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), S)
    x1i = jnp.mod(x0i + 1, S)
    y0i = jnp.mod(y0.astype(jnp.int32), S)
    y1i = jnp.mod(y0i + 1, S)
    from hikari_tpu.utils import gather_channels

    flat = stack.reshape(T * S * S, 4)

    def g(yi, xi):
        return gather_channels(flat, (safe_id * S + yi) * S + xi)

    c00 = g(y0i, x0i)
    c10 = g(y0i, x1i)
    c01 = g(y1i, x0i)
    c11 = g(y1i, x1i)
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    result = top * (1 - fy) + bot * fy
    return jnp.where((tex_id >= 0)[..., None], result, 1.0)


def srgb_to_linear(c):
    """glTF base-color/emissive textures are sRGB-encoded."""
    return jnp.where(
        c <= 0.04045, c / 12.92, jnp.power((c + 0.055) / 1.055, 2.4)
    )

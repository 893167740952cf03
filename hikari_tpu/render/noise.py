"""Blue-noise texture bank.

The reference embeds 16 prebuilt 64x64 RGBA LDR blue-noise PNGs
(src/lib.rs:189-219, NOISE_TEXTURE_COUNT=16; sampled at
light.wgsl:1075-1079 with golden-ratio temporal scrambling). We generate an
equivalent bank procedurally (no asset copying): white noise shaped by a
high-pass radial filter in Fourier space, then rank-order normalized to an
exact uniform [0,1) distribution per channel — standard "FFT blue noise".
Deterministic seed; cached in-process.
"""

from __future__ import annotations

import functools

import numpy as np

from hikari_tpu.config import NOISE_TEXTURE_COUNT

NOISE_SIZE = 64


def _blue_noise_channel(rng: np.random.Generator, size: int) -> np.ndarray:
    white = rng.standard_normal((size, size))
    f = np.fft.fft2(white)
    fx = np.fft.fftfreq(size)[None, :]
    fy = np.fft.fftfreq(size)[:, None]
    rad = np.sqrt(fx * fx + fy * fy)
    # High-pass: suppress low frequencies (keep a tiny DC floor to avoid
    # banding), boost ~ linearly with radius like true blue noise.
    weight = np.minimum(rad / 0.5, 1.0) ** 1.5
    shaped = np.real(np.fft.ifft2(f * weight))
    # Rank-order normalize to exactly uniform [0,1).
    flat = shaped.reshape(-1)
    ranks = np.empty_like(flat, dtype=np.float64)
    ranks[np.argsort(flat, kind="stable")] = (
        np.arange(flat.size, dtype=np.float64) + 0.5
    ) / flat.size
    return ranks.reshape(size, size).astype(np.float32)


@functools.lru_cache(maxsize=1)
def blue_noise_bank(
    count: int = NOISE_TEXTURE_COUNT, size: int = NOISE_SIZE, seed: int = 0x51D
) -> np.ndarray:
    """(count, size, size, 4) float32 in [0,1) — the analogue of the
    reference's ``NoiseTextures`` binding array (src/lib.rs:515-598)."""
    rng = np.random.default_rng(seed)
    bank = np.stack(
        [
            np.stack([_blue_noise_channel(rng, size) for _ in range(4)], axis=-1)
            for _ in range(count)
        ]
    )
    return bank


REFERENCE_NOISE_DIR = "/root/reference/src/noise"


@functools.lru_cache(maxsize=1)
def reference_noise_bank(
    directory: str = REFERENCE_NOISE_DIR, count: int = NOISE_TEXTURE_COUNT
) -> np.ndarray:
    """Exact-RNG parity mode: load the reference's 16 embedded 64x64 RGBA
    blue-noise textures (src/lib.rs:189-219 include_bytes! of
    noise/LDR_RGBA_{0..15}.png, loaded non-sRGB) as a (16, 64, 64, 4)
    float32 bank in [0,1]. Used by tests/comparison harness so stochastic
    intermediates can be compared 1:1 against the reference (SURVEY.md §7
    hard-part 6); the procedural ``blue_noise_bank`` stays the default.

    Raises FileNotFoundError when the reference checkout is absent.
    """
    import os

    from PIL import Image

    planes = []
    for i in range(count):
        path = os.path.join(directory, f"LDR_RGBA_{i}.png")
        img = np.asarray(Image.open(path).convert("RGBA"), dtype=np.float32)
        planes.append(img / 255.0)
    return np.stack(planes)


def noise_plane(bank, frame_number: int | "jax.Array", size_hw):
    """``sample_noise`` evaluated at the full (h, w) pixel grid: the index
    pattern (pixel + frame) % noise_size is PERIODIC with the 64-texel
    tile, so the fetch is one dynamic texture pick + a roll + jnp.tile —
    zero gathers, vs a ~6 ms (h*w)-row gather at render res on v5e.
    Bitwise-equal to sample_noise on the meshgrid (tests/test_render.py).
    """
    import jax
    import jax.numpy as jnp

    bank = jnp.asarray(bank)
    count, size = bank.shape[0], bank.shape[1]
    tex = jnp.mod(frame_number, count)
    tile = jax.lax.dynamic_slice(
        bank, (tex, 0, 0, 0), (1, size, size, bank.shape[3])
    )[0]
    shift = jnp.mod(frame_number, size)
    rolled = jnp.roll(tile, (-shift, -shift), axis=(0, 1))
    h, w = size_hw
    out = jnp.tile(rolled, (-(-h // size), -(-w // size), 1))
    return out[:h, :w, :]


def sample_noise(bank, frame_number: int | "jax.Array", coords_y, coords_x):
    """Reference noise fetch (light.wgsl:1075-1079): texture index =
    frame % NOISE_TEXTURE_COUNT; uv = (pixel + frame + 0.5)/noise_size with
    repeat addressing + nearest filtering -> integer wrap."""
    import jax.numpy as jnp

    from hikari_tpu.utils import gather_channels

    bank = jnp.asarray(bank)
    count, size = bank.shape[0], bank.shape[1]
    tex = jnp.mod(frame_number, count)
    y = jnp.mod(coords_y + frame_number, size)
    x = jnp.mod(coords_x + frame_number, size)
    flat = bank.reshape(count * size * size, 4)
    return gather_channels(flat, (tex * size + y) * size + x)

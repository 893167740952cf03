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


def edge_shift(img, dy: int, dx: int):
    """out[y, x] = img[clip(y + dy), clip(x + dx)] — a static shift with
    exact clamp-to-edge addressing, built from pad(edge) + slice: zero
    gathers (TPU gathers cost ~7.5 ns per output row; rolls/slices are
    ~20x cheaper — tools/bench_gather.py)."""
    h, w = img.shape[0], img.shape[1]
    ay, by = max(-dy, 0), max(dy, 0)
    ax, bx = max(-dx, 0), max(dx, 0)
    pad = [(ay, by), (ax, bx)] + [(0, 0)] * (img.ndim - 2)
    padded = jnp.pad(img, pad, mode="edge")
    return padded[dy + ay : dy + ay + h, dx + ax : dx + ax + w]


def _corner_pack(img):
    """(H, W, C) -> (H, W, 4C): channels of the 2x2 quad at (y, x) —
    [c00 | c10(x+1) | c01(y+1) | c11(y+1,x+1)], clamp-to-edge. One row
    gather of the packed image fetches all four bilinear corners."""
    if img.ndim == 2:
        img = img[..., None]
    return jnp.concatenate(
        [img, edge_shift(img, 0, 1), edge_shift(img, 1, 0),
         edge_shift(img, 1, 1)],
        axis=-1,
    )


def bilinear_sample(img, uv):
    """textureSampleLevel(..., linear) with clamp addressing. The 2x2
    corner quad is pre-packed into row channels (3 static edge-shifts)
    so the dynamic fetch is ONE row gather instead of four."""
    x, y, h, w = _uv_to_xy(img, uv)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    # At the high edge the packed c10/c01/c11 clamp to the same texel,
    # matching clip(x0i + 1, 0, w - 1).
    C = img.shape[-1] if img.ndim == 3 else 1
    quad = gather_pixels(_corner_pack(img), y0i, x0i)  # (..., 4C)
    c00, c10, c01, c11 = (
        quad[..., 0:C], quad[..., C:2 * C],
        quad[..., 2 * C:3 * C], quad[..., 3 * C:4 * C],
    )
    if img.ndim == 2:
        c00, c10, c01, c11 = (c[..., 0] for c in (c00, c10, c01, c11))
        fx, fy = fx[..., 0], fy[..., 0]
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def texture_gather(img, uv, component: int):
    """WGSL ``textureGather(component, ...)``: the 4 texels bilinear would
    blend, order (x, y, z, w) = (-+, ++, +-, --) quadrants — returns
    (..., 4). One row gather of the corner-packed component plane."""
    x, y, h, w = _uv_to_xy(img, uv)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    c = img[..., component] if img.ndim == 3 else img
    quad = gather_pixels(_corner_pack(c), y0, x0)  # (..., 4)
    c00, c10, c01, c11 = (
        quad[..., 0], quad[..., 1], quad[..., 2], quad[..., 3]
    )
    # WGSL gather order: (umin,vmax), (umax,vmax), (umax,vmin), (umin,vmin)
    return jnp.stack([c01, c11, c10, c00], axis=-1)


def pack_window_gather(specs, ky, kx):
    """ONE row gather serving many taps around a shared base index.

    ``specs``: list of (img (H, W, C), dys, dxs). For every image, the
    edge-clamped static shifts over its (dys x dxs) window are packed as
    row channels; the packed plane is gathered once at (ky, kx); the
    returned accessor ``at(slot, dy, dx) -> (..., C)`` slices a tap out of
    the gathered rows.

    Rationale: a TPU gather costs ~7.5-17 ns per OUTPUT ROW and is only
    mildly width-dependent (2M rows: 16ch ~12 ms, 96ch ~27 ms, 224ch
    ~35 ms — tools/bench_gather.py), so 12 separate reprojection taps
    cost ~12x more than one wide gather of all their texels.

    Clamp semantics: per-tap clamp-to-edge from the UNCLAMPED base
    (edge_shift padding), provided the caller clamps (ky, kx) into the
    image — exact WGSL sampler behavior for any in-image base."""
    parts, index, off = [], {}, 0
    for si, (img, dys, dxs) in enumerate(specs):
        if img.ndim == 2:
            img = img[..., None]
        C = img.shape[-1]
        for dy in dys:
            for dx in dxs:
                parts.append(edge_shift(img, dy, dx))
                index[(si, dy, dx)] = (off, C)
                off += C
    packed = jnp.concatenate(parts, axis=-1)
    rows = gather_pixels(packed, ky, kx)

    def at(si, dy, dx):
        o, C = index[(si, dy, dx)]
        return rows[..., o : o + C]

    return at


def make_dyn_at(at, bit_y, bit_x):
    """Wrap a pack_window_gather accessor with per-axis offsets that are
    either static ints or (lo, hi) pairs selected by that axis's
    half-texel bit (frac >= 0.5 of the gather coordinate)."""

    def dyn(slot, oy_opts, ox_opts, sl=slice(None)):
        def pick(opts, bit, get):
            if isinstance(opts, int):
                return get(opts)
            return jnp.where(bit[..., None], get(opts[1]), get(opts[0]))

        def row(oy):
            return pick(ox_opts, bit_x, lambda ox: at(slot, oy, ox)[..., sl])

        return pick(oy_opts, bit_y, row)

    return dyn


def quad_phase_sampler(img, j, pad: int = 4):
    """Sampler for SMAA TU4x's static-affine "quad uv" taps: every tap of
    the form nearest/gather at uv = ((2x + j + 0.5 + bx) / W, ...) lands on
    the out-res texel (2y + j + cy, 2x + j + cx) with STATIC integer
    (cy, cx) and only the frame-parity phase ``j`` dynamic. Returns
    ``tap(cy, cx)`` = one dynamic_slice of an edge-padded copy + a [::2]
    strided view — zero gathers (TPU gathers cost ~7.5 ns per output row;
    slices are ~20x cheaper — tools/bench_gather.py).

    Clamp semantics: the edge padding replicates borders, so
    tap(cy, cx)[y, x] == img[clip(2y + j + cy, 0, H-1), clip(...W-1)] —
    per-tap clamping from the UNCLAMPED base, which is what WGSL's
    clamp-to-edge sampler does for each gathered texel."""
    P = pad
    padded = jnp.pad(
        img, [(P, P), (P, P)] + [(0, 0)] * (img.ndim - 2), mode="edge"
    )
    h2, w2 = img.shape[0], img.shape[1]
    h, w = h2 // 2, w2 // 2
    size = (2 * (h - 1) + 1, 2 * (w - 1) + 1) + img.shape[2:]
    import jax as _jax

    def tap(cy: int, cx: int):
        assert -P <= cy + 1 <= P and -P <= cx + 1 <= P
        start = (P + j + cy, P + j + cx) + (0,) * (img.ndim - 2)
        win = _jax.lax.dynamic_slice(padded, start, size)
        return win[::2, ::2]

    return tap


def parity_shift(img, even, dy0: int, dx0: int, dy1: int, dx1: int):
    """select(even, edge_shift(img, dy0, dx0), edge_shift(img, dy1, dx1)) —
    a static shift whose offset depends only on frame parity."""
    a = edge_shift(img, dy0, dx0)
    b = edge_shift(img, dy1, dx1)
    e = jnp.reshape(even, (1,) * img.ndim)
    return jnp.where(e, a, b)


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

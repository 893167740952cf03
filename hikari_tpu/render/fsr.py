"""FSR 1.0: EASU (edge-adaptive spatial upsampling) + RCAS (robust
contrast-adaptive sharpening).

The reference ships these as prebuilt SPIR-V binaries
(src/shaders/fsr/fsr_pass_easu.spv / fsr_pass_rcas.spv, dispatched at
src/post_process.rs:1279-1308 with the FsrConstantsUniform ratio/sharpness,
src/post_process.rs:503-534). This is a from-scratch jnp implementation of
AMD's publicly documented FidelityFX-FSR 1.0 algorithm (ffx_fsr1.h):

* EASU: 12-tap pattern around the source position; luma-based edge
  direction + feature-length analysis drives an anisotropic elliptical
  lanczos-like kernel; output clamped to the 2x2 deringing hull.
* RCAS: 5-tap (+ cross) sharpen whose per-pixel gain is limited so no
  ring/clip occurs; ``sharpness`` 0.0 = max (matching Upscale::Fsr1).
"""

from __future__ import annotations

import jax.numpy as jnp

from hikari_tpu.render.filters import bilinear_sample
from hikari_tpu.utils import uv_grid


def _luma(c):
    # FSR uses R*0.5+G+B*0.25-ish approximations; plain BT.709-ish works.
    return 0.5 * c[..., 0] + c[..., 1] + 0.25 * c[..., 2]


def easu(img, out_size):
    """Upscale (h,w,c) -> out_size using edge-adaptive filtering."""
    ih, iw = img.shape[0], img.shape[1]
    oh, ow = out_size
    uv = uv_grid((oh, ow))
    # Source-space position of each output pixel.
    px = uv[..., 0] * iw - 0.5
    py = uv[..., 1] * ih - 0.5
    ix = jnp.floor(px)
    iy = jnp.floor(py)
    fx = (px - ix)[..., None]
    fy = (py - iy)[..., None]
    ixi = ix.astype(jnp.int32)
    iyi = iy.astype(jnp.int32)

    def tap(dx, dy):
        x = jnp.clip(ixi + dx, 0, iw - 1)
        y = jnp.clip(iyi + dy, 0, ih - 1)
        return img[y, x][..., :3]

    # 12-tap pattern (FSR's b,c / e,f,g,h / i,j,k,l / n,o quads):
    #     b c
    #   e f g h
    #   i j k l
    #     n o
    b = tap(0, -1); c = tap(1, -1)
    e = tap(-1, 0); f = tap(0, 0); g = tap(1, 0); h = tap(2, 0)
    i = tap(-1, 1); j = tap(0, 1); k = tap(1, 1); l = tap(2, 1)
    n = tap(0, 2); o = tap(1, 2)

    lb, lc = _luma(b), _luma(c)
    le, lf, lg, lh = _luma(e), _luma(f), _luma(g), _luma(h)
    li, lj, lk, ll = _luma(i), _luma(j), _luma(k), _luma(l)
    ln, lo = _luma(n), _luma(o)

    # Edge direction from luma gradients at the 4 nearest taps (f,g,j,k),
    # interpolated by the subpixel position — the core of ffx EASU's
    # FsrEasuSet analysis.
    def dir_len(l_up, l_left, l_c, l_right, l_down, w):
        dirx = l_right - l_left
        diry = l_down - l_up
        # feature length: how much the center deviates -> isotropy control
        lenx = jnp.clip(jnp.abs(dirx) / jnp.maximum(
            jnp.maximum(l_right, jnp.maximum(l_left, l_c)) - jnp.minimum(
                l_right, jnp.minimum(l_left, l_c)), 1e-4), 0.0, 1.0)
        leny = jnp.clip(jnp.abs(diry) / jnp.maximum(
            jnp.maximum(l_down, jnp.maximum(l_up, l_c)) - jnp.minimum(
                l_down, jnp.minimum(l_up, l_c)), 1e-4), 0.0, 1.0)
        return dirx * w, diry * w, (lenx * lenx + leny * leny) * w

    fxs = fx[..., 0]
    fys = fy[..., 0]
    wf = (1 - fxs) * (1 - fys)
    wg = fxs * (1 - fys)
    wj = (1 - fxs) * fys
    wk = fxs * fys
    dfx, dfy, flen = dir_len(lb, le, lf, lg, lj, wf)
    dgx, dgy, glen = dir_len(lc, lf, lg, lh, lk, wg)
    djx, djy, jlen = dir_len(lf, li, lj, lk, ln, wj)
    dkx, dky, klen = dir_len(lg, lj, lk, ll, lo, wk)
    dirx = dfx + dgx + djx + dkx
    diry = dfy + dgy + djy + dky
    feat = flen + glen + jlen + klen

    # Normalize direction; degenerate -> axis aligned.
    dl2 = dirx * dirx + diry * diry
    scale = jnp.where(dl2 < 1e-8, 1.0, 1.0 / jnp.sqrt(jnp.maximum(dl2, 1e-8)))
    dirx_n = jnp.where(dl2 < 1e-8, 1.0, dirx * scale)
    diry_n = jnp.where(dl2 < 1e-8, 0.0, diry * scale)

    stretch = 1.0 + 1.0 * feat * feat  # anisotropy along the edge
    # Kernel window scales (FSR uses {1/(1+stretch), ...}).
    len2 = feat * feat
    lob = 0.5 + ((1.0 / 4.0 - 0.04) - 0.5) * len2  # negative-lobe strength
    clp = 1.0 / jnp.maximum(lob, 1e-3)

    def kernel_w(dx, dy):
        # Rotate offset into edge frame, squash across the edge.
        vx = (dx - fxs) * dirx_n + (dy - fys) * diry_n
        vy = -(dx - fxs) * diry_n + (dy - fys) * dirx_n
        vx = vx / stretch
        d2 = jnp.minimum(vx * vx + vy * vy, clp)
        # FSR's polynomial lanczos-ish window: (d2*w-1)^2 * (d2*lob-1)^2-ish
        a_ = d2 * (2.0 / 5.0) - 1.0
        b_ = d2 * lob - 1.0
        return (a_ * a_) * (b_ * b_) * (25.0 / 16.0 - (25.0 / 16.0 - 1.0) * 0)

    taps = [
        (b, 0, -1), (c, 1, -1),
        (e, -1, 0), (f, 0, 0), (g, 1, 0), (h, 2, 0),
        (i, -1, 1), (j, 0, 1), (k, 1, 1), (l, 2, 1),
        (n, 0, 2), (o, 1, 2),
    ]
    acc = jnp.zeros((oh, ow, 3))
    wsum = jnp.zeros((oh, ow))
    for color, dx, dy in taps:
        wk_ = kernel_w(float(dx), float(dy))
        acc = acc + color * wk_[..., None]
        wsum = wsum + wk_
    out = acc / jnp.maximum(wsum[..., None], 1e-5)

    # Deringing: clamp to the min/max of the 2x2 nearest quad.
    quad = jnp.stack([f, g, j, k], axis=0)
    out = jnp.clip(out, quad.min(axis=0), quad.max(axis=0))
    return out


def rcas(img, sharpness: float = 0.0):
    """Sharpening; ``sharpness`` in stops (0 = maximum, 2 = weak), matching
    FsrRcasCon. 4-neighbor cross pattern with clip-proof gain."""
    denoise_limit = 0.25 - 1.0 / 16.0
    peak = -1.0 / (2.0 ** sharpness * 8.0 / 5.0)

    def shift(dx, dy):
        return jnp.roll(jnp.roll(img[..., :3], -dy, axis=0), -dx, axis=1)

    e = img[..., :3]
    b = shift(0, -1)
    d = shift(-1, 0)
    f = shift(1, 0)
    h = shift(0, 1)

    # Luma-weighted min/max of the cross.
    mn = jnp.minimum(jnp.minimum(jnp.minimum(b, d), jnp.minimum(f, h)), e)
    mx = jnp.maximum(jnp.maximum(jnp.maximum(b, d), jnp.maximum(f, h)), e)
    # Limiters: amount of sharpening that avoids clipping.
    hit_min = mn / jnp.maximum(4.0 * mx, 1e-4)
    hit_max = (1.0 - mx) / jnp.maximum(4.0 * mn - 4.0, -1e4)
    lobe = jnp.maximum(
        -hit_min, jnp.minimum(hit_max, 0.0)
    )
    lobe = jnp.clip(lobe, peak, 0.0)
    out = (lobe * (b + d + f + h) + e) / (4.0 * lobe + 1.0)
    if img.shape[-1] == 4:
        out = jnp.concatenate([out, img[..., 3:4]], axis=-1)
    return out


def fsr_upscale(img, out_size, sharpness: float = 0.0):
    """EASU upscale + RCAS sharpen — the reference's FSR pass pair
    (src/post_process.rs:1279-1308)."""
    up = easu(img, out_size)
    if img.shape[-1] == 4:
        a = bilinear_sample(img[..., 3:4], uv_grid(out_size))
        up = jnp.concatenate([up, a], axis=-1)
    return rcas(up, sharpness)

"""FSR 1.0: EASU (edge-adaptive spatial upsampling) + RCAS (robust
contrast-adaptive sharpening).

The reference ships these as prebuilt SPIR-V binaries
(src/shaders/fsr/fsr_pass_easu.spv / fsr_pass_rcas.spv, dispatched at
src/post_process.rs:1279-1308 with the FsrConstantsUniform ratio/sharpness,
src/post_process.rs:503-534; algorithm source in src/shaders/fsr/source.zip
= AMD FidelityFX ffx_fsr1.h). This is a faithful jnp re-derivation of that
public algorithm:

* EASU (``FsrEasuF``): 12-tap pattern around the source position; per-quad
  luma gradients accumulate a bilinear-weighted edge direction + feature
  length; the direction rotates and the length anisotropically stretches a
  polynomial Lanczos2 approximation ``(25/16 (2/5 d2-1)^2 - 9/16)(lob*d2-1)^2``
  whose negative-lobe strength/window clip adapt to edge-ness; the result
  is clamped to the min/max of the nearest 2x2 (dering hull).
* RCAS (``FsrRcasF``): cross-tap (b,d,e,f,h) sharpen whose per-pixel
  negative lobe solves for the largest gain that cannot clip, limited to
  FSR_RCAS_LIMIT and scaled by ``exp2(-sharpness)``; sharpness 0.0 = max
  (matching ``Upscale::Fsr1``, reference src/lib.rs:502-507).

Where ffx uses bit-trick reciprocal approximations (APrxLoRcpF1 etc.) for
pre-RDNA ALU throughput, we use exact reciprocals — TPU transcendentals
are full-rate and the approximations only add error.
"""

from __future__ import annotations

import jax.numpy as jnp

from hikari_tpu.utils import gather_pixels, saturate

FSR_RCAS_LIMIT = 0.25 - 1.0 / 16.0


def _luma2(c):
    """FSR's "luma times 2" (ffx_fsr1.h:366): B*0.5 + R*0.5 + G."""
    return 0.5 * c[..., 0] + c[..., 1] + 0.5 * c[..., 2]


def _easu_set(dir_x, dir_y, length, w, lA, lB, lC, lD, lE):
    """``FsrEasuSetF`` (ffx_fsr1.h:276-312): accumulate the bilinear-
    weighted '+' gradient direction and edge-ness length at one quad tap.
    lA..lE follow the plus layout  a / b c d / e."""
    dc = lD - lC
    cb = lC - lB
    len_x = 1.0 / jnp.maximum(jnp.maximum(jnp.abs(dc), jnp.abs(cb)), 1e-20)
    dir_xx = lD - lB
    dir_x = dir_x + dir_xx * w
    len_x = saturate(jnp.abs(dir_xx) * len_x)
    len_x = len_x * len_x
    length = length + len_x * w

    ec = lE - lC
    ca = lC - lA
    len_y = 1.0 / jnp.maximum(jnp.maximum(jnp.abs(ec), jnp.abs(ca)), 1e-20)
    dir_yy = lE - lA
    dir_y = dir_y + dir_yy * w
    len_y = saturate(jnp.abs(dir_yy) * len_y)
    len_y = len_y * len_y
    length = length + len_y * w
    return dir_x, dir_y, length


def easu(img, out_size):
    """``FsrEasuF`` (ffx_fsr1.h:315-436) over the whole output grid.
    img: (ih, iw, >=3); returns (oh, ow, 3)."""
    ih, iw = img.shape[0], img.shape[1]
    oh, ow = out_size

    # con0: output integer position -> input pixel position ('f').
    ox = jnp.arange(ow, dtype=jnp.float32)[None, :]
    oy = jnp.arange(oh, dtype=jnp.float32)[:, None]
    ppx = ox * (iw / ow) + (0.5 * iw / ow - 0.5)
    ppy = oy * (ih / oh) + (0.5 * ih / oh - 0.5)
    ppx, ppy = jnp.broadcast_to(ppx, (oh, ow)), jnp.broadcast_to(ppy, (oh, ow))
    fpx = jnp.floor(ppx)
    fpy = jnp.floor(ppy)
    px = ppx - fpx  # pp in [0,1): position inside the f/g/j/k quad
    py = ppy - fpy
    ix = fpx.astype(jnp.int32)
    iy = fpy.astype(jnp.int32)

    def tap(dx, dy):
        x = jnp.clip(ix + dx, 0, iw - 1)
        y = jnp.clip(iy + dy, 0, ih - 1)
        return gather_pixels(img[..., :3], y, x)  # (oh, ow, 3)

    # 12-tap pattern (ffx_fsr1.h:330-334):
    #     b c
    #   e f g h
    #   i j k l
    #     n o
    b = tap(0, -1); c = tap(1, -1)
    e = tap(-1, 0); f = tap(0, 0); g = tap(1, 0); h = tap(2, 0)
    i = tap(-1, 1); j = tap(0, 1); k = tap(1, 1); l = tap(2, 1)
    n = tap(0, 2); o = tap(1, 2)

    bL, cL, eL, fL, gL, hL = map(_luma2, (b, c, e, f, g, h))
    iL, jL, kL, lL, nL, oL = map(_luma2, (i, j, k, l, n, o))

    # Bilinear-weighted direction/length accumulation (ffx_fsr1.h:388-391).
    dir_x = jnp.zeros((oh, ow))
    dir_y = jnp.zeros((oh, ow))
    length = jnp.zeros((oh, ow))
    dir_x, dir_y, length = _easu_set(
        dir_x, dir_y, length, (1.0 - px) * (1.0 - py), bL, eL, fL, gL, jL
    )
    dir_x, dir_y, length = _easu_set(
        dir_x, dir_y, length, px * (1.0 - py), cL, fL, gL, hL, kL
    )
    dir_x, dir_y, length = _easu_set(
        dir_x, dir_y, length, (1.0 - px) * py, fL, iL, jL, kL, nL
    )
    dir_x, dir_y, length = _easu_set(
        dir_x, dir_y, length, px * py, gL, jL, kL, lL, oL
    )

    # Normalize direction; zero-gradient pixels become (1, 0)
    # (ffx_fsr1.h:394-402).
    dir_r = dir_x * dir_x + dir_y * dir_y
    zro = dir_r < (1.0 / 32768.0)
    dir_rs = 1.0 / jnp.sqrt(jnp.maximum(dir_r, 1e-30))
    dir_rs = jnp.where(zro, 1.0, dir_rs)
    dir_x = jnp.where(zro, 1.0, dir_x) * dir_rs
    dir_y = jnp.where(zro, 0.0, dir_y) * dir_rs

    # len in {0..2} -> {0..1}, shaped (ffx_fsr1.h:404-405).
    length = (length * 0.5) ** 2
    # Kernel stretch: 1.0 horz/vert to sqrt(2) diagonal (ffx_fsr1.h:407).
    stretch = (dir_x * dir_x + dir_y * dir_y) / jnp.maximum(
        jnp.maximum(jnp.abs(dir_x), jnp.abs(dir_y)), 1e-20
    )
    len2_x = 1.0 + (stretch - 1.0) * length
    len2_y = 1.0 - 0.5 * length
    # Negative lobe strength + window clip (ffx_fsr1.h:413-416).
    lob = 0.5 + ((1.0 / 4.0 - 0.04) - 0.5) * length
    clp = 1.0 / lob

    # Dering hull: min/max of the nearest 2x2 f,g,j,k (ffx_fsr1.h:419-422).
    min4 = jnp.minimum(jnp.minimum(f, g), jnp.minimum(j, k))
    max4 = jnp.maximum(jnp.maximum(f, g), jnp.maximum(j, k))

    aC = jnp.zeros((oh, ow, 3))
    aW = jnp.zeros((oh, ow))

    def accum(aC, aW, off_x, off_y, color):
        """``FsrEasuTapF`` (ffx_fsr1.h:240-270)."""
        vx = (off_x - px) * dir_x + (off_y - py) * dir_y
        vy = (off_x - px) * (-dir_y) + (off_y - py) * dir_x
        vx = vx * len2_x
        vy = vy * len2_y
        d2 = jnp.minimum(vx * vx + vy * vy, clp)
        wB = (2.0 / 5.0) * d2 - 1.0
        wA = lob * d2 - 1.0
        wB = wB * wB
        wA = wA * wA
        wB = (25.0 / 16.0) * wB - (25.0 / 16.0 - 1.0)
        w = wB * wA
        return aC + color * w[..., None], aW + w

    for off_x, off_y, color in (
        (0.0, -1.0, b), (1.0, -1.0, c),
        (-1.0, 1.0, i), (0.0, 1.0, j), (0.0, 0.0, f), (-1.0, 0.0, e),
        (1.0, 1.0, k), (2.0, 1.0, l), (2.0, 0.0, h), (1.0, 0.0, g),
        (1.0, 2.0, o), (0.0, 2.0, n),
    ):
        aC, aW = accum(aC, aW, off_x, off_y, color)

    pix = aC / jnp.maximum(aW, 1e-20)[..., None]
    return jnp.clip(pix, min4, max4)


def rcas(img, sharpness: float = 0.0):
    """``FsrRcasF`` (ffx_fsr1.h:684-772): sharpen without ringing.
    ``sharpness`` in stops: 0.0 = maximum (FsrRcasCon, ffx_fsr1.h:662)."""
    ih, iw = img.shape[0], img.shape[1]
    gain = float(2.0 ** (-sharpness))
    rgb = img[..., :3]

    ys = jnp.arange(ih, dtype=jnp.int32)[:, None]
    xs = jnp.arange(iw, dtype=jnp.int32)[None, :]

    def tap(dx, dy):
        x = jnp.clip(xs + dx, 0, iw - 1)
        y = jnp.clip(ys + dy, 0, ih - 1)
        return gather_pixels(rgb, jnp.broadcast_to(y, (ih, iw)),
                             jnp.broadcast_to(x, (ih, iw)))

    b = tap(0, -1)
    d = tap(-1, 0)
    e = rgb
    f = tap(1, 0)
    h = tap(0, 1)

    # Min/max of the cross ring, per channel (ffx_fsr1.h:739-744).
    mn4 = jnp.minimum(jnp.minimum(b, d), jnp.minimum(f, h))
    mx4 = jnp.maximum(jnp.maximum(b, d), jnp.maximum(f, h))
    # Limiters: largest negative lobe that cannot clip (ffx_fsr1.h:746-755).
    hit_min = jnp.minimum(mn4, e) / jnp.maximum(4.0 * mx4, 1e-20)
    hit_max = (1.0 - jnp.maximum(mx4, e)) / jnp.minimum(4.0 * mn4 - 4.0, -1e-20)
    lobe_rgb = jnp.maximum(-hit_min, hit_max)
    lobe = jnp.maximum(
        -FSR_RCAS_LIMIT,
        jnp.minimum(jnp.max(lobe_rgb, axis=-1), 0.0),
    ) * gain
    # Resolve (ffx_fsr1.h:761-765).
    rcp_l = 1.0 / (4.0 * lobe + 1.0)
    out = (lobe[..., None] * (b + d + f + h) + e) * rcp_l[..., None]
    if img.shape[-1] > 3:
        out = jnp.concatenate([out, img[..., 3:]], axis=-1)
    return out


def fsr_upscale(img, out_size, sharpness: float = 0.0):
    """EASU upscale + RCAS sharpen, preserving any alpha channel
    (the reference's two dispatches, src/post_process.rs:1279-1308)."""
    up = easu(img, out_size)
    if img.shape[-1] > 3:
        from hikari_tpu.render.filters import bilinear_sample
        from hikari_tpu.utils import uv_grid

        alpha = bilinear_sample(img[..., 3:], uv_grid(out_size))
        up = jnp.concatenate([up, alpha], axis=-1)
    return rcas(up, sharpness)

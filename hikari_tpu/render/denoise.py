"""SVGF-style denoiser: demodulation + 4-level edge-aware à-trous filter.

jnp equivalent of src/shaders/denoise.wgsl (entry points ``demodulation``
and ``denoise`` with DENOISE_LEVEL_{0..3} specializations, step sizes
8/4/2/1 — denoise.wgsl:101-114), dispatched per lighting channel by
``PostProcessNode::run`` (src/post_process.rs:1190-1224). Temporal
accumulation stays disabled exactly like the reference (denoise.wgsl:
285-312 commented out; CHANGELOG.md "[0.3.2] Disable denoiser's temporal
accumulation").

TPU-first: every à-trous tap is a *static* pixel offset, so the whole
filter is rolls + masked weighted sums — dense VPU work, no gathers, and
fully differentiable."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hikari_tpu.config import F32_EPSILON, RenderSettings
from hikari_tpu.render.filters import nearest_sample, shift2d
from hikari_tpu.render.light import jittered_deferred_uv, render_coords
from hikari_tpu.render.types import GBuffer
from hikari_tpu.utils import ATROUS_KERNEL, luminance, safe_sqrt0

_OFFSETS = [(-1, -1), (0, -1), (1, -1), (-1, 0), (1, 0), (-1, 1), (0, 1), (1, 1)]

STEP_SIZES = (8, 4, 2, 1)


def _deferred_maps(gbuffer: GBuffer, settings: RenderSettings, frame_number):
    """Per-render-pixel nearest samples of the full-res G-buffer at the
    jittered deferred uv (denoise.wgsl:37-42 with 0.5 amount). Integer
    upscale ratios take the strided-slice path (render/light.py)."""
    ratio = settings.upscale_ratio
    if float(ratio).is_integer():
        from hikari_tpu.render.light import (
            _deferred_phase,
            strided_deferred_plane,
        )

        c = _deferred_phase(frame_number, int(ratio), 0.5)
        f = lambda a: strided_deferred_plane(
            a, c, int(ratio), settings.render_size
        )
        return (
            f(gbuffer.position)[..., 3],
            f(gbuffer.normal),
            f(gbuffer.depth_gradient),
            f(gbuffer.instance.astype(jnp.float32)),
        )
    rh, rw = settings.render_size
    ys, xs = render_coords(settings.render_size)
    uv = jnp.stack(
        [(xs.astype(jnp.float32) + 0.5) / rw, (ys.astype(jnp.float32) + 0.5) / rh],
        axis=-1,
    )
    duv = jittered_deferred_uv(
        uv, frame_number, settings.output_size, settings.upscale_ratio, amount=0.5
    )
    pos = nearest_sample(gbuffer.position, duv)
    normal = nearest_sample(gbuffer.normal, duv)
    grad = nearest_sample(gbuffer.depth_gradient, duv)
    inst = nearest_sample(gbuffer.instance[..., None].astype(jnp.float32), duv)[..., 0]
    return pos[..., 3], normal, grad, inst


def normal_weight(n0, n1):
    """(denoise.wgsl:45-48): pow(max(0, dot), 16)."""
    return jnp.power(jnp.maximum(0.0, jnp.sum(n0 * n1, axis=-1)), 16.0)


def depth_weight(d0, d1, gradient, offset):
    """(denoise.wgsl:51-54)."""
    eps = 0.01
    grad_dot = gradient[..., 0] * offset[0] + gradient[..., 1] * offset[1]
    return jnp.exp(-jnp.abs(d0 - d1) / (jnp.abs(grad_dot) + eps))


def luminance_weight(l0, l1, variance):
    """(denoise.wgsl:57-62)."""
    strictness, exponent, eps = 4.0, 0.25, 0.001
    return jnp.exp(
        -jnp.abs(l0 - l1)
        / (strictness * jnp.power(jnp.maximum(variance, 0.0), exponent) + eps)
    )


def instance_weight(i0, i1):
    """(denoise.wgsl:65-67)."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(i0 - i1))


def demodulate(radiance, albedo_rr):
    """irradiance = radiance / albedo, black where albedo < 0.01
    (denoise.wgsl:151-153). ``albedo_rr``: albedo at render res."""
    dark = albedo_rr < 0.01
    irr = jnp.where(dark, 0.0, radiance / jnp.where(dark, 1.0, albedo_rr))
    return irr


def filtered_variance(variance):
    """3x3 kernel-weighted variance gather (denoise.wgsl:155-162)."""
    kernel = ATROUS_KERNEL
    out = kernel[1][1] * jnp.maximum(variance, 0.0)
    for dx, dy in _OFFSETS:
        v, valid = shift2d(variance, dy, dx)
        out = out + kernel[dy + 1][dx + 1] * jnp.where(valid, jnp.maximum(v, 0.0), 0.0)
    return out


def atrous_level(irradiance, var, guides, settings: RenderSettings, tap):
    """One edge-aware à-trous level. ``guides`` = (depth, normal, grad,
    inst); ``tap(name, dy, dx) -> (tap_array, valid)`` supplies the
    shifted fields — dense rolls (shift2d) in the single-device path, or
    halo-exchanged local slices in the shard_map path
    (parallel/halo.py denoise_channel_sharded). One body, two transports:
    numerics are identical by construction."""
    depth, normal, grad, inst = guides
    kernel = ATROUS_KERNEL
    lum_c = luminance(irradiance)
    center_w = kernel[1][1]
    # NaN scrub matches denoise.wgsl:190-196.
    nan_c = jnp.any(jnp.isnan(irradiance) | (irradiance > 3.0e38), axis=-1)
    irr_c = jnp.where(nan_c[..., None], 0.0, irradiance)
    sum_irr = irr_c * center_w
    sum_w = jnp.where(nan_c, 0.0, center_w)

    if settings.firefly_filtering:
        ff_m1 = jnp.zeros_like(lum_c)
        ff_m2 = jnp.zeros_like(lum_c)
        ff_n = jnp.zeros_like(lum_c)

    for dx, dy in _OFFSETS:
        s_irr, valid = tap("irr", dy, dx)
        s_norm, _ = tap("normal", dy, dx)
        s_depth, _ = tap("depth", dy, dx)
        s_inst, _ = tap("inst", dy, dx)
        s_lum = luminance(s_irr)
        nan_s = jnp.any(jnp.isnan(s_irr) | (s_irr > 3.0e38), axis=-1)
        ok = valid & ~nan_s

        w = (
            normal_weight(normal, s_norm)
            * depth_weight(depth, s_depth, grad, (dx, dy))
            * instance_weight(inst, s_inst)
            * luminance_weight(lum_c, s_lum, var)
        )
        w = jnp.clip(w, 0.0, 1.0) * kernel[dy + 1][dx + 1]
        w = jnp.where(ok, w, 0.0)
        # Edge-stopping weights are guides, not signal: detach them so
        # the filter is linear in irradiance. This avoids the infinite
        # d/dv of variance^0.25 at v=0 (NaN grads) and matches the
        # usual differentiable-SVGF formulation.
        w = jax.lax.stop_gradient(w)
        sum_irr = sum_irr + jnp.where(ok[..., None], s_irr, 0.0) * w[..., None]
        sum_w = sum_w + w

        if settings.firefly_filtering:
            ff_m1 = ff_m1 + jnp.where(ok, s_lum, 0.0)
            ff_m2 = ff_m2 + jnp.where(ok, s_lum * s_lum, 0.0)
            ff_n = ff_n + jnp.where(ok, 1.0, 0.0)

    new_irr = jnp.where(
        (sum_w < 0.0001)[..., None], 0.0, sum_irr / jnp.maximum(sum_w[..., None], 0.0001)
    )

    if settings.firefly_filtering:
        ff_mean = ff_m1 / jnp.maximum(ff_n, 1.0)
        ff_var = ff_m2 / jnp.maximum(ff_n, 1.0) - ff_mean * ff_mean
        fire = lum_c > ff_mean + 3.0 * safe_sqrt0(ff_var)
        scale = jnp.where(fire, ff_mean / jnp.maximum(lum_c, 1e-8), 1.0)
        new_irr = new_irr * scale[..., None]

    return new_irr


def dense_tap(fields, step: int):
    """Dense (single-device / GSPMD) tap transport: whole-array rolls."""

    def tap(name, dy, dx):
        return shift2d(fields[name], dy * step, dx * step)

    return tap


def denoise_channel(
    radiance,  # (rh, rw, 3) channel output (post temporal/spatial)
    variance,  # (rh, rw)
    albedo_rr,  # (rh, rw, 3) albedo resampled to render res
    gbuffer: GBuffer,
    frame_number,
    settings: RenderSettings,
):
    """Full chain for one channel: demodulation + 4 à-trous levels +
    optional firefly clamp, re-modulating albedo at the last level."""
    depth, normal, grad, inst = _deferred_maps(gbuffer, settings, frame_number)
    background = depth < F32_EPSILON

    irradiance = demodulate(radiance, albedo_rr)
    var = filtered_variance(variance)

    for step in STEP_SIZES:
        fields = {"irr": irradiance, "normal": normal, "depth": depth, "inst": inst}
        irradiance = atrous_level(
            irradiance, var, (depth, normal, grad, inst), settings,
            dense_tap(fields, step),
        )

    out = irradiance * albedo_rr  # re-modulate (denoise.wgsl:314-315)
    return jnp.where(background[..., None], 0.0, out)

"""SMAA TU4x temporal upscaler (checkerboard 4x reconstruction).

jnp equivalent of src/shaders/smaa.wgsl: each low-res render pixel maps to
a 2x2 output quad; the current sample fills one diagonal slot (by frame
parity), the reprojected previous frame fills the other (with depth/
instance/velocity disocclusion + 2x2 YCoCg clipping + subpixel-velocity
differential remix), and ``smaa_tu4x_extrapolate`` fills the remaining two
slots by differential blending of 6 neighbors.

TPU formulation: the four quad slots are computed as four (h, w) planes and
interleaved with static strided writes — no scatter."""

from __future__ import annotations

import jax.numpy as jnp

from hikari_tpu.render.filters import (
    make_dyn_at,
    pack_window_gather,
    parity_shift,
    quad_phase_sampler,
)
from hikari_tpu.render.taa import clip_towards_aabb_center
from hikari_tpu.render.types import GBuffer
from hikari_tpu.utils import TAU, fract, luminance, rgb_to_ycocg, uv_grid, ycocg_to_rgb


def _quad_uv(ys, xs, jitter, out_size):
    oh, ow = out_size
    x = 2 * xs + jitter
    y = 2 * ys + jitter
    return jnp.stack(
        [(x.astype(jnp.float32) + 0.5) / ow, (y.astype(jnp.float32) + 0.5) / oh],
        axis=-1,
    )


def _nearest_velocity_quad(pos_tap, vel_tap):
    """taa.nearest_velocity evaluated at the static-affine quad uv
    (taa.wgsl:54-73): the 4 diagonal depth taps and the dilated velocity
    fetch all land on out-res texels (2y + j + c) — strided taps, zero
    gathers. The dilation offset per axis is a small integer (the sum of
    tied max-depth tap signs, in [-2, 2]), so the final velocity fetch is
    a 25-way select over strided taps."""
    # offs order matches taa.nearest_velocity: (ox, oy) signs
    offs = [(1, 1), (-1, 1), (1, -1), (-1, -1)]
    depths = jnp.stack(
        [pos_tap(oy, ox)[..., 3] for ox, oy in offs], axis=-1
    )
    depth = pos_tap(0, 0)[..., 3]
    max_depth = jnp.max(depths, axis=-1)
    is_max = depths == max_depth[..., None]
    xsign = jnp.asarray([1.0, -1.0, 1.0, -1.0])
    ysign = jnp.asarray([1.0, 1.0, -1.0, -1.0])
    sx = jnp.sum(jnp.where(is_max, xsign, 0.0), axis=-1).astype(jnp.int32)
    sy = jnp.sum(jnp.where(is_max, ysign, 0.0), axis=-1).astype(jnp.int32)
    take = depth < max_depth
    sx = jnp.where(take, sx, 0)
    sy = jnp.where(take, sy, 0)
    vel = vel_tap(0, 0)[..., :2]
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            if dy == 0 and dx == 0:
                continue
            m = (sy == dy) & (sx == dx)
            vel = jnp.where(m[..., None], vel_tap(dy, dx)[..., :2], vel)
    return vel


def smaa_tu4x(
    render,  # (h, w, 4) tonemapped current at render res
    prev_upscaled,  # (2h, 2w, 4) previous output
    gbuffer: GBuffer,
    prev_gbuffer: GBuffer,
    frame_number,
):
    h, w = render.shape[0], render.shape[1]
    oh, ow = 2 * h, 2 * w
    out_texel = jnp.asarray([1.0 / ow, 1.0 / oh])
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    uv = uv_grid((h, w))

    even = (frame_number & 1) == 0
    cur_j = jnp.where(even, 0, 1)
    prev_j = jnp.where(even, 1, 0)

    current_color = render[..., :3]

    prev_out_uv = _quad_uv(ys, xs, prev_j, (oh, ow))
    # Static-affine taps: every fetch at prev_out_uv + const lands on the
    # out-res texel (2y + j + c) — strided slices via quad_phase_sampler,
    # zero gathers (the gather rework; only velocity-dependent reprojection
    # fetches below remain true gathers).
    pos_tap = quad_phase_sampler(gbuffer.position, prev_j)
    vel_tap = quad_phase_sampler(gbuffer.velocity_uv, prev_j)
    inst_tap = quad_phase_sampler(
        gbuffer.instance[..., None].astype(jnp.float32), prev_j
    )
    velocity = _nearest_velocity_quad(pos_tap, vel_tap)
    prev_reproj_uv = prev_out_uv - velocity

    boundary_miss = jnp.any(jnp.abs(prev_reproj_uv - 0.5) > 0.5, axis=-1)

    cur_instance = inst_tap(0, 0)[..., 0]
    cur_depth = pos_tap(0, 0)[..., 3]

    # ---- ONE window gather for every reprojected fetch ----
    # The ±2.5-texel bias taps (prev depth textureGathers + prev instance
    # nearests), the prev-upscaled nearest, and the prev-velocity nearest
    # all index out-res planes at prev_reproj_uv + const: pack their
    # windows around the shared base floor(sp - 0.5) and gather once
    # (pack_window_gather) — 12 narrow gathers -> 1 wide one.
    sp = prev_reproj_uv * jnp.asarray([ow, oh], dtype=jnp.float32)
    tp = jnp.floor(sp - 0.5)
    fr = sp - 0.5 - tp
    kx = jnp.clip(tp[..., 0].astype(jnp.int32), 0, ow - 1)
    ky = jnp.clip(tp[..., 1].astype(jnp.int32), 0, oh - 1)
    bit_x = fr[..., 0] >= 0.5
    bit_y = fr[..., 1] >= 0.5

    DPTH, INST, PREV, PVEL = 0, 1, 2, 3
    at = pack_window_gather(
        [
            (prev_gbuffer.position[..., 3], range(-3, 5), range(-3, 5)),
            (
                prev_gbuffer.instance.astype(jnp.float32),
                (-2, 0, 1, 3),
                (-2, 0, 1, 3),
            ),
            (prev_upscaled[..., :3], (0, 1), (0, 1)),
            (prev_gbuffer.velocity_uv[..., :2], (0, 1), (0, 1)),
        ],
        ky,
        kx,
    )
    dyn_at = make_dyn_at(at, bit_y, bit_x)

    previous_color = dyn_at(PREV, (0, 1), (0, 1))

    def gather_base(o):
        """textureGather corner base offset for uv bias o: floor(frac + o)
        — static for o=0, a half-texel bit select for o=±2.5."""
        if o == 0.0:
            return 0
        return (2, 3) if o > 0 else (-3, -2)

    def nearest_off(o):
        """nearest-sample offset for uv bias o: floor(sp + o) - k."""
        if o == 0.0:
            return (0, 1)
        return 3 if o > 0 else -2

    depth_miss = cur_depth == 0.0
    instance_miss = jnp.zeros((h, w), dtype=bool)
    biases = [(0.0, 0.0), (2.5, 2.5), (-2.5, 2.5), (2.5, -2.5), (-2.5, -2.5)]
    for bx, by in biases:
        gy, gx = gather_base(by), gather_base(bx)

        def corner(dy, dx):
            oy = gy + dy if isinstance(gy, int) else (gy[0] + dy, gy[1] + dy)
            ox = gx + dx if isinstance(gx, int) else (gx[0] + dx, gx[1] + dx)
            return dyn_at(DPTH, oy, ox)[..., 0]

        prev_depths = jnp.stack(
            [corner(dy, dx) for dy in (0, 1) for dx in (0, 1)], axis=-1
        )
        ratio = jnp.where(
            prev_depths == 0.0,
            1.0,
            cur_depth[..., None] / jnp.where(prev_depths == 0.0, 1.0, prev_depths),
        )
        miss_here = jnp.any(ratio < 0.95, axis=-1)
        depth_miss = depth_miss | miss_here
        prev_instance = dyn_at(INST, nearest_off(by), nearest_off(bx))[..., 0]
        instance_miss = instance_miss | (
            miss_here & (jnp.abs(prev_instance - cur_instance) > 1.0)
        )

    prev_velocity = dyn_at(PVEL, (0, 1), (0, 1))
    velocity_miss = jnp.linalg.norm(velocity - prev_velocity, axis=-1) > 0.0001

    # Disocclusion -> nearest-depth-biased 2x2 YCoCg clip (smaa.wgsl:159-189).
    # Both the depth-distance taps (gbuffer at prev_out_uv + bias) and the
    # render-texture gather at the winning bias are static-affine: the
    # gather corners are strided taps whose offset depends only on frame
    # parity — zero gathers, a 5-way select over precomputed corner quads.
    # floor shift of the out-res gather base per bias magnitude:
    _BSHIFT = {0.0: 0, 2.5: 2, -2.5: -3}
    # floor shift of the render-res gather base per (j, bias):
    _RSHIFT1 = {0.0: 0, 2.5: 1, -2.5: -1}  # even frames (j = 1)
    _RSHIFT0 = {0.0: -1, 2.5: 1, -2.5: -2}  # odd frames (j = 0)
    rgb = render[..., :3]
    min_ds = jnp.full((h, w), 10.0)
    quad_rgb = None  # (h, w, 4, 3) corner colors at the winning bias
    for bx, by in biases:
        cy, cx = _BSHIFT[by], _BSHIFT[bx]
        ds = jnp.stack(
            [pos_tap(cy + dy, cx + dx)[..., 3] for dy in (0, 1) for dx in (0, 1)],
            axis=-1,
        )
        dds = jnp.linalg.norm(cur_depth[..., None] - ds, axis=-1)
        take = dds < min_ds
        q = jnp.stack(
            [
                parity_shift(
                    rgb,
                    even,
                    _RSHIFT1[by] + dy, _RSHIFT1[bx] + dx,
                    _RSHIFT0[by] + dy, _RSHIFT0[bx] + dx,
                )
                for dy in (0, 1)
                for dx in (0, 1)
            ],
            axis=-2,
        )  # (h, w, 4, 3)
        quad_rgb = q if quad_rgb is None else jnp.where(
            take[..., None, None], q, quad_rgb
        )
        min_ds = jnp.minimum(min_ds, dds)

    taps = [rgb_to_ycocg(quad_rgb[..., i, :]) for i in range(4)]
    s_mm = rgb_to_ycocg(jnp.clip(current_color, 0.0, 1.0))
    m1 = sum(taps)
    m2 = sum(t * t for t in taps)
    mean = m1 / 4.0
    variance = jnp.sqrt(jnp.maximum(m2 / 4.0 - mean * mean, 0.0))
    clipped = ycocg_to_rgb(
        clip_towards_aabb_center(
            rgb_to_ycocg(previous_color), s_mm, mean - variance, mean + variance
        )
    )
    do_clip = boundary_miss | ((depth_miss | instance_miss) & velocity_miss)
    previous_color = jnp.where(do_clip[..., None], clipped, previous_color)

    # Subpixel-velocity differential remix (smaa.wgsl:186-195).
    subpix = fract(velocity / (2.0 * out_texel))
    blend = jnp.clip(
        -jnp.cos(jnp.max(subpix, axis=-1) * TAU), 0.0, 1.0
    )
    # Bilinear at prev_out_uv on the render texture: parity-static corners
    # (even j=1: base 0, fx 0.25; odd j=0: base -1, fx 0.75), per-tap
    # edge clamp — zero gathers.
    c00 = parity_shift(rgb, even, 0, 0, -1, -1)
    c10 = parity_shift(rgb, even, 0, 1, -1, 0)
    c01 = parity_shift(rgb, even, 1, 0, 0, -1)
    c11 = parity_shift(rgb, even, 1, 1, 0, 0)
    fxy = jnp.where(even, 0.25, 0.75)
    remix = (
        (c00 * (1 - fxy) + c10 * fxy) * (1 - fxy)
        + (c01 * (1 - fxy) + c11 * fxy) * fxy
    )
    previous_color = previous_color + (remix - previous_color) * blend[..., None]

    cur_rgba = jnp.concatenate([current_color, jnp.ones((h, w, 1))], axis=-1)
    prev_rgba = jnp.concatenate([previous_color, jnp.ones((h, w, 1))], axis=-1)

    # Quad planes: slot (j, j) gets current on even frames etc.
    evenf = even
    q00 = jnp.where(evenf, cur_rgba, prev_rgba)
    q11 = jnp.where(evenf, prev_rgba, cur_rgba)

    # ------ extrapolate pass (smaa.wgsl:201-271) ------
    def shift(img, dy, dx):
        return jnp.roll(jnp.roll(img, -dy, axis=0), -dx, axis=1)

    t_c = q00
    b_c = q11
    n_c = shift(q11, -1, 0)
    e_c = shift(q00, 0, 1)
    s_c = shift(q00, 1, 0)
    w_c = shift(q11, 0, -1)

    dh = jnp.stack(
        [
            luminance(jnp.abs(w_c[..., :3] - b_c[..., :3])),
            luminance(jnp.abs(t_c[..., :3] - e_c[..., :3])),
        ],
        axis=-1,
    )
    dv = jnp.stack(
        [
            luminance(jnp.abs(t_c[..., :3] - s_c[..., :3])),
            luminance(jnp.abs(n_c[..., :3] - b_c[..., :3])),
        ],
        axis=-1,
    )
    factor_x = jnp.maximum(dv[..., 0], 0.001) * jnp.maximum(dv[..., 1], 0.001)
    factor_y = jnp.maximum(dh[..., 0], 0.001) * jnp.maximum(dh[..., 1], 0.001)
    factor_z = 1.0 / (factor_x + factor_y)

    def diff_blend(t_, b_, l_, r_):
        return (0.5 * factor_z)[..., None] * (
            (l_ + r_) * factor_x[..., None] + (t_ + b_) * factor_y[..., None]
        )

    q10 = diff_blend(t_c, s_c, w_c, b_c)  # x slot: out[2y+1, 2x]
    q01 = diff_blend(n_c, b_c, t_c, e_c)  # y slot: out[2y, 2x+1]

    out = jnp.zeros((oh, ow, 4))
    out = out.at[0::2, 0::2].set(q00)
    out = out.at[0::2, 1::2].set(q01)
    out = out.at[1::2, 0::2].set(q10)
    out = out.at[1::2, 1::2].set(q11)
    return out

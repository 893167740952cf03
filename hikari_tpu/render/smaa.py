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

from hikari_tpu.render.filters import bilinear_sample, nearest_sample, texture_gather
from hikari_tpu.render.taa import clip_towards_aabb_center, nearest_velocity
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
    velocity = nearest_velocity(gbuffer, prev_out_uv, (1.0 / ow, 1.0 / oh))
    prev_reproj_uv = prev_out_uv - velocity
    previous_color = nearest_sample(prev_upscaled, prev_reproj_uv)[..., :3]

    boundary_miss = jnp.any(jnp.abs(prev_reproj_uv - 0.5) > 0.5, axis=-1)

    inst_img = gbuffer.instance[..., None].astype(jnp.float32)
    prev_inst_img = prev_gbuffer.instance[..., None].astype(jnp.float32)
    cur_instance = nearest_sample(inst_img, prev_out_uv)[..., 0]
    cur_depth = nearest_sample(gbuffer.position, prev_out_uv)[..., 3]

    depth_miss = cur_depth == 0.0
    instance_miss = jnp.zeros((h, w), dtype=bool)
    biases = [(0.0, 0.0), (2.5, 2.5), (-2.5, 2.5), (2.5, -2.5), (-2.5, -2.5)]
    for bx, by in biases:
        b_uv = prev_reproj_uv + jnp.asarray([bx, by]) * out_texel
        prev_depths = texture_gather(prev_gbuffer.position, b_uv, 3)
        ratio = jnp.where(
            prev_depths == 0.0,
            1.0,
            cur_depth[..., None] / jnp.where(prev_depths == 0.0, 1.0, prev_depths),
        )
        miss_here = jnp.any(ratio < 0.95, axis=-1)
        depth_miss = depth_miss | miss_here
        prev_instance = nearest_sample(prev_inst_img, b_uv)[..., 0]
        instance_miss = instance_miss | (
            miss_here & (jnp.abs(prev_instance - cur_instance) > 1.0)
        )

    prev_velocity = nearest_sample(prev_gbuffer.velocity_uv, prev_reproj_uv)[..., :2]
    velocity_miss = jnp.linalg.norm(velocity - prev_velocity, axis=-1) > 0.0001

    # Disocclusion -> nearest-depth-biased 2x2 YCoCg clip (smaa.wgsl:159-189).
    min_ds = jnp.full((h, w), 10.0)
    uv_bias = jnp.zeros((h, w, 2))
    for bx, by in biases:
        b = jnp.asarray([bx, by]) * out_texel
        ds = texture_gather(gbuffer.position, prev_out_uv + b, 3)
        dds = jnp.linalg.norm(cur_depth[..., None] - ds, axis=-1)
        take = dds < min_ds
        uv_bias = jnp.where(take[..., None], b, uv_bias)
        min_ds = jnp.minimum(min_ds, dds)

    g_uv = prev_out_uv + uv_bias
    cr = texture_gather(render, g_uv, 0)
    cg = texture_gather(render, g_uv, 1)
    cb = texture_gather(render, g_uv, 2)
    taps = [
        rgb_to_ycocg(jnp.stack([cr[..., i], cg[..., i], cb[..., i]], axis=-1))
        for i in range(4)
    ]
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
    remix = bilinear_sample(render, prev_out_uv)[..., :3]
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

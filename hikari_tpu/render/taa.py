"""TAA "Jasmine" — temporal anti-aliasing with nearest-velocity dilation,
5-tap Catmull-Rom history resampling, multi-probe disocclusion tests, and
3x3 YCoCg variance clipping on disocclusion.

jnp equivalent of src/shaders/taa.wgsl (entry ``taa_jasmine``), run by
``PostProcessNode`` at the post-SMAA resolution (src/post_process.rs:
1260-1277)."""

from __future__ import annotations

import jax.numpy as jnp

from hikari_tpu.render.filters import (
    edge_shift,
    make_dyn_at,
    nearest_sample,
    pack_window_gather,
)
from hikari_tpu.render.types import GBuffer
from hikari_tpu.utils import rgb_to_ycocg, uv_grid, ycocg_to_rgb


def clip_towards_aabb_center(prev_c, cur_c, aabb_min, aabb_max):
    """(taa.wgsl:37-45)."""
    p_clip = 0.5 * (aabb_max + aabb_min)
    e_clip = 0.5 * (aabb_max - aabb_min)
    v_clip = prev_c - p_clip
    v_unit = v_clip / jnp.where(e_clip == 0.0, 1e-8, e_clip)
    ma_unit = jnp.max(jnp.abs(v_unit), axis=-1, keepdims=True)
    clipped = p_clip + v_clip / jnp.maximum(ma_unit, 1e-8)
    return jnp.where(ma_unit > 1.0, clipped, prev_c)


def nearest_velocity(gbuffer: GBuffer, uv, inv_size):
    """Velocity dilation via 4-tap max-depth (taa.wgsl:54-73). ``inv_size``
    is the texel size of the *render* texture the pass runs at.

    When the pass runs at the G-buffer's own resolution (the default
    SMAA-TU4x pipeline) the ``uv`` grid is the identity mapping, so the
    four diagonal depth taps are static ±1-texel shifts (edge_shift,
    zero gathers) and the center read is the array itself; only the
    final dilated velocity fetch stays a dynamic gather."""
    tx, ty = inv_size
    gh, gw = gbuffer.position.shape[:2]
    same_res = uv.shape[:2] == (gh, gw)
    offs = [(tx, ty), (-tx, ty), (tx, -ty), (-tx, -ty)]
    if same_res:
        pos_depth = gbuffer.position[..., 3]
        depths = [
            edge_shift(pos_depth, int(round(oy * gh)), int(round(ox * gw)))
            for ox, oy in offs
        ]
        depth = pos_depth
    else:
        depths = [
            nearest_sample(gbuffer.position, uv + jnp.asarray(o))[..., 3]
            for o in offs
        ]
        depth = nearest_sample(gbuffer.position, uv)[..., 3]
    depths = jnp.stack(depths, axis=-1)  # (..., 4)
    max_depth = jnp.max(depths, axis=-1)
    is_max = depths == max_depth[..., None]
    xsign = jnp.asarray([1.0, -1.0, 1.0, -1.0])
    ysign = jnp.asarray([1.0, 1.0, -1.0, -1.0])
    if same_res:
        # The dilated fetch offset is a small integer per axis (the sum of
        # tied max-depth tap signs, in [-2, 2]) from the identity uv — a
        # 25-way select over static edge shifts, zero gathers.
        sx = jnp.sum(jnp.where(is_max, xsign, 0.0), axis=-1).astype(jnp.int32)
        sy = jnp.sum(jnp.where(is_max, ysign, 0.0), axis=-1).astype(jnp.int32)
        take = depth < max_depth
        sx = jnp.where(take, sx, 0)
        sy = jnp.where(take, sy, 0)
        vel = gbuffer.velocity_uv[..., :2]
        out = vel
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                if dy == 0 and dx == 0:
                    continue
                m = (sy == dy) & (sx == dx)
                out = jnp.where(m[..., None], edge_shift(vel, dy, dx), out)
        return out
    ox = tx * jnp.sum(jnp.where(is_max, xsign, 0.0), axis=-1)
    oy = ty * jnp.sum(jnp.where(is_max, ysign, 0.0), axis=-1)
    offset = jnp.where(
        (depth < max_depth)[..., None], jnp.stack([ox, oy], axis=-1), 0.0
    )
    return nearest_sample(gbuffer.velocity_uv, uv + offset)[..., :2]


def catmull_rom_5tap(img, sample_position, size_hw):
    """5-tap Catmull-Rom history resample (taa.wgsl:127-144; TheRealMJP).

    Every texel the five bilinear taps touch lies inside the 4x4 window
    whose corner is one texel above-left of the sample, so the whole
    resample is ONE row gather of the 16-texel corner-packed history
    (rows of 16C) instead of five separate bilinear fetches — ~2x on the
    measured row-gather cost model (tools/bench_gather.py). The taps are
    then recomputed from the window with the published weights. Border
    semantics: the window base clamps into the image and the packed
    shifts clamp to edge, which matches per-tap clamping except for
    samples reprojected >1 texel outside the image — those pixels are
    boundary-disoccluded and variance-clipped anyway."""
    h, w = size_hw
    C = img.shape[-1]
    texel_pos_1 = jnp.floor(sample_position - 0.5) + 0.5
    f = sample_position - texel_pos_1
    kx = jnp.clip(jnp.floor(texel_pos_1[..., 0]).astype(jnp.int32), 0, w - 1)
    ky = jnp.clip(jnp.floor(texel_pos_1[..., 1]).astype(jnp.int32), 0, h - 1)
    from hikari_tpu.utils import gather_pixels

    window = jnp.concatenate(
        [
            edge_shift(img, i - 1, j - 1)
            for i in range(4)
            for j in range(4)
        ],
        axis=-1,
    )  # (h, w, 16C)
    rows = gather_pixels(window, ky, kx)  # (..., 16C)

    def W(i, j):
        k = (i * 4 + j) * C
        return rows[..., k : k + C]

    return _catmull_apply(W, f)


def _catmull_apply(W, f):
    """Catmull-Rom 5-tap weights applied to a 4x4 window accessor
    ``W(i, j) -> (..., C)`` (window row i, col j; the sample sits between
    (1,1) and (2,2)) with ``f`` the in-texel fraction."""
    w0 = f * (-0.5 + f * (1.0 - 0.5 * f))
    w1 = 1.0 + f * f * (-2.5 + 1.5 * f)
    w2 = f * (0.5 + f * (2.0 - 1.5 * f))
    w3 = f * f * (-0.5 + 0.5 * f)
    w12 = w1 + w2
    offset12 = w2 / jnp.maximum(w1 + w2, 1e-8)

    ox = offset12[..., 0][..., None]
    oy = offset12[..., 1][..., None]

    def lx(a, b):
        return a + (b - a) * ox

    def ly(a, b):
        return a + (b - a) * oy

    def cl(x):
        return jnp.clip(x, 0.0, 1.0)

    t_x12_y0 = cl(lx(W(0, 1), W(0, 2)))
    t_x0_y12 = cl(ly(W(1, 0), W(2, 0)))
    t_x12_y12 = cl(ly(lx(W(1, 1), W(1, 2)), lx(W(2, 1), W(2, 2))))
    t_x3_y12 = cl(ly(W(1, 3), W(2, 3)))
    t_x12_y3 = cl(lx(W(3, 1), W(3, 2)))

    out = t_x12_y0 * (w12[..., 0] * w0[..., 1])[..., None]
    out += t_x0_y12 * (w0[..., 0] * w12[..., 1])[..., None]
    out += t_x12_y12 * (w12[..., 0] * w12[..., 1])[..., None]
    out += t_x3_y12 * (w3[..., 0] * w12[..., 1])[..., None]
    out += t_x12_y3 * (w12[..., 0] * w3[..., 1])[..., None]
    return out


def taa_jasmine(
    render,  # (h, w, 4) current frame at this pass's resolution
    previous_render,  # (h, w, 4) TAA history
    gbuffer: GBuffer,  # current G-buffer (full deferred res)
    prev_gbuffer: GBuffer,
    clear_color,
    upscale_ratio: float,
):
    h, w = render.shape[0], render.shape[1]
    texel = jnp.asarray([1.0 / w, 1.0 / h])
    uv = uv_grid((h, w))

    current_color = render[..., :3]
    velocity = nearest_velocity(gbuffer, uv, (1.0 / w, 1.0 / h))
    previous_uv = uv - velocity
    boundary_miss = jnp.any(jnp.abs(previous_uv - 0.5) > 0.5, axis=-1)

    biases = [
        (0.0, 0.0),
        (1.5, 1.5),
        (-1.5, 1.5),
        (1.5, -1.5),
        (-1.5, -1.5),
    ]

    same_res = gbuffer.position.shape[:2] == (h, w)
    # identity-uv nearest sample == the array itself (no gather)
    cur_pd = gbuffer.position if same_res else nearest_sample(
        gbuffer.position, uv
    )
    cur_depth = cur_pd[..., 3]
    has_content = cur_depth > 0.0
    depth_miss = cur_depth == 0.0
    position_miss = cur_depth == 0.0

    # ---- ONE window gather for every reprojected fetch ----
    # All previous-frame taps (bias-loop depth gathers and position
    # nearests, the velocity nearest, and the Catmull-Rom history window)
    # share the base index k = floor(sample_position - 0.5): the ±1.5-texel
    # bias taps land at k + static offset + a half-texel bit, all inside a
    # 6x6 (history: 4x4) window. Pack the windows as row channels and
    # gather ONCE (pack_window_gather) — 12 narrow gathers -> 1 wide one.
    size = jnp.asarray([w, h], dtype=jnp.float32)
    sample_position = previous_uv * size
    tp = jnp.floor(sample_position - 0.5)
    fr = sample_position - 0.5 - tp  # in-texel fraction, == catmull's f
    kx = jnp.clip(tp[..., 0].astype(jnp.int32), 0, w - 1)
    ky = jnp.clip(tp[..., 1].astype(jnp.int32), 0, h - 1)
    bit_x = fr[..., 0] >= 0.5
    bit_y = fr[..., 1] >= 0.5

    POS, VEL, HIST = 0, 1, 2
    at = pack_window_gather(
        [
            (prev_gbuffer.position, range(-2, 4), range(-2, 4)),
            (prev_gbuffer.velocity_uv[..., :2], (0, 1), (0, 1)),
            (previous_render[..., :3], range(-1, 3), range(-1, 3)),
        ],
        ky,
        kx,
    )

    dyn_at = make_dyn_at(at, bit_y, bit_x)

    def gather_base(o):
        """texture_gather corner base offset for uv bias o (texels):
        floor(frac + o) over frac in [0,1) — static for o=0, a half-texel
        bit select for o=±1.5."""
        if o == 0.0:
            return 0
        return (1, 2) if o > 0 else (-2, -1)

    def nearest_off(o):
        """nearest-sample offset for uv bias o: floor(sp + o) - k."""
        if o == 0.0:
            return (0, 1)
        return 2 if o > 0 else -1

    for bx, by in biases:
        gy, gx = gather_base(by), gather_base(bx)

        def corner(dy, dx):
            oy = gy + dy if isinstance(gy, int) else (gy[0] + dy, gy[1] + dy)
            ox = gx + dx if isinstance(gx, int) else (gx[0] + dx, gx[1] + dx)
            return dyn_at(POS, oy, ox, slice(3, 4))[..., 0]

        prev_depths = jnp.stack(
            [corner(dy, dx) for dy in (0, 1) for dx in (0, 1)], axis=-1
        )
        ratio = jnp.where(
            prev_depths == 0.0, 1.0, cur_depth[..., None] / jnp.where(prev_depths == 0.0, 1.0, prev_depths)
        )
        has_content = has_content | jnp.any(prev_depths > 0.0, axis=-1)
        depth_miss = depth_miss | jnp.any(ratio < 0.95, axis=-1)
        prev_pos = dyn_at(POS, nearest_off(by), nearest_off(bx), slice(0, 3))
        dist = jnp.linalg.norm(cur_pd[..., :3] - prev_pos, axis=-1)
        position_miss = position_miss | (dist > 0.5)

    prev_velocity = dyn_at(VEL, (0, 1), (0, 1), slice(0, 2))
    velocity_miss = (
        jnp.linalg.norm(velocity - prev_velocity, axis=-1) > 0.00005
    )

    previous_color = _catmull_apply(
        lambda i, j: at(HIST, i - 1, j - 1), fr
    )

    # Disocclusion -> 3x3 YCoCg variance clipping (taa.wgsl:146-164).
    # The taps are static ±1-texel offsets of the pass's own render
    # texture — pure edge_shifts, zero gathers.
    rgb = jnp.clip(render[..., :3], 0.0, 1.0)

    def s_ycocg(dx, dy):
        return rgb_to_ycocg(edge_shift(rgb, dy, dx))

    taps = [
        s_ycocg(-1, 1),
        s_ycocg(0, 1),
        s_ycocg(1, 1),
        s_ycocg(-1, 0),
        rgb_to_ycocg(jnp.clip(current_color, 0.0, 1.0)),
        s_ycocg(1, 0),
        s_ycocg(-1, -1),
        s_ycocg(0, -1),
        s_ycocg(1, -1),
    ]
    m1 = sum(taps)
    m2 = sum(t * t for t in taps)
    mean = m1 / 9.0
    variance = jnp.sqrt(jnp.maximum(m2 / 9.0 - mean * mean, 0.0))
    prev_y = rgb_to_ycocg(previous_color)
    clipped = clip_towards_aabb_center(
        prev_y, taps[4], mean - variance, mean + variance
    )
    do_clip = boundary_miss | (position_miss & velocity_miss & depth_miss)
    previous_color = jnp.where(
        do_clip[..., None], ycocg_to_rgb(clipped), previous_color
    )

    blend = 0.1 / upscale_ratio
    output = previous_color + (current_color - previous_color) * blend
    out = jnp.concatenate([output, render[..., 3:4]], axis=-1)
    clear = jnp.broadcast_to(jnp.asarray(clear_color), out.shape)
    return jnp.where(has_content[..., None], out, clear)

"""TAA "Jasmine" — temporal anti-aliasing with nearest-velocity dilation,
5-tap Catmull-Rom history resampling, multi-probe disocclusion tests, and
3x3 YCoCg variance clipping on disocclusion.

jnp equivalent of src/shaders/taa.wgsl (entry ``taa_jasmine``), run by
``PostProcessNode`` at the post-SMAA resolution (src/post_process.rs:
1260-1277).

TPU formulation: the pass body works on 2D per-channel planes end to end
— colors are (r, g, b) tuples of (H, W) arrays, stacked to (H, W, C) only
at the pass boundary. Any materialized rank-3 temp with a small minor
channel dim lane-pads up to 128x on TPU (XLA keeps the degenerate
{2,1,0} layout on remat copies), which OOMed the round-2 driver bench at
90 GB HBM / 1.8% utilization (BENCH_r02.json). All reprojected fetches
ride ONE 128-channel window gather (filters.pack_window_gather)."""

from __future__ import annotations

import jax.numpy as jnp

from hikari_tpu.render.filters import (
    cond_window_gather,
    cross,
    edge_shift,
    identity_window_accessor,
    make_dyn_at,
    nearest_sample,
    pack_window_gather,
)
from hikari_tpu.render.types import GBuffer
from hikari_tpu.utils import rgb_to_ycocg, safe_sqrt0, uv_grid, ycocg_to_rgb


def clip_towards_aabb_center(prev_c, cur_c, aabb_min, aabb_max):
    """(taa.wgsl:37-45)."""
    p_clip = 0.5 * (aabb_max + aabb_min)
    e_clip = 0.5 * (aabb_max - aabb_min)
    v_clip = prev_c - p_clip
    v_unit = v_clip / jnp.where(e_clip == 0.0, 1e-8, e_clip)
    ma_unit = jnp.max(jnp.abs(v_unit), axis=-1, keepdims=True)
    clipped = p_clip + v_clip / jnp.maximum(ma_unit, 1e-8)
    return jnp.where(ma_unit > 1.0, clipped, prev_c)


def clip_aabb_planes(prev, aabb_min, aabb_max):
    """clip_towards_aabb_center on per-channel 2D planes: ``prev``,
    ``aabb_min``, ``aabb_max`` are same-length tuples of (H, W) arrays;
    the channel max reduction becomes a running jnp.maximum."""
    p_clips, v_clips = [], []
    ma = None
    for pc, mn, mx in zip(prev, aabb_min, aabb_max):
        p_clip = 0.5 * (mx + mn)
        e_clip = 0.5 * (mx - mn)
        v_clip = pc - p_clip
        v_unit = v_clip / jnp.where(e_clip == 0.0, 1e-8, e_clip)
        a = jnp.abs(v_unit)
        ma = a if ma is None else jnp.maximum(ma, a)
        p_clips.append(p_clip)
        v_clips.append(v_clip)
    denom = jnp.maximum(ma, 1e-8)
    take = ma > 1.0
    return [
        jnp.where(take, p + v / denom, pc)
        for p, v, pc in zip(p_clips, v_clips, prev)
    ]


def rgb_to_ycocg_planes(r, g, b):
    """(taa.wgsl:20-26) on 2D planes."""
    y = r / 4.0 + g / 2.0 + b / 4.0
    co = r / 2.0 - b / 2.0
    cg = -r / 4.0 + g / 2.0 - b / 4.0
    return y, co, cg


def ycocg_to_rgb_planes(y, co, cg):
    """(taa.wgsl:28-34) on 2D planes — clamps to [0,1]."""
    r = jnp.clip(y + co - cg, 0.0, 1.0)
    g = jnp.clip(y + cg, 0.0, 1.0)
    b = jnp.clip(y - co - cg, 0.0, 1.0)
    return r, g, b


def _nearest_velocity_planes(gbuffer: GBuffer):
    """Velocity dilation via 4-tap max-depth (taa.wgsl:54-73) at the
    G-buffer's own resolution: the four diagonal depth taps are static
    ±1-texel shifts and the dilated fetch is a 25-way select over static
    shifts — zero gathers, every intermediate a 2D plane. Returns
    (vel_x, vel_y) planes."""
    pos_depth = gbuffer.position[..., 3]
    # offs order: (ox, oy) signs (+,+), (-,+), (+,-), (-,-)
    signs = [(1.0, 1.0), (-1.0, 1.0), (1.0, -1.0), (-1.0, -1.0)]
    # uv offset (+tx, +ty) maps to texel shift (dy=+1, dx=+1)
    depths = [
        edge_shift(pos_depth, int(oy), int(ox)) for ox, oy in signs
    ]
    max_depth = depths[0]
    for d in depths[1:]:
        max_depth = jnp.maximum(max_depth, d)
    sx = jnp.zeros_like(pos_depth)
    sy = jnp.zeros_like(pos_depth)
    for (xsgn, ysgn), d in zip(signs, depths):
        is_max = d == max_depth
        sx = sx + jnp.where(is_max, xsgn, 0.0)
        sy = sy + jnp.where(is_max, ysgn, 0.0)
    take = pos_depth < max_depth
    sx = jnp.where(take, sx, 0.0).astype(jnp.int32)
    sy = jnp.where(take, sy, 0.0).astype(jnp.int32)
    vx = gbuffer.velocity_uv[..., 0]
    vy = gbuffer.velocity_uv[..., 1]
    out_x, out_y = vx, vy
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            if dy == 0 and dx == 0:
                continue
            m = (sy == dy) & (sx == dx)
            out_x = jnp.where(m, edge_shift(vx, dy, dx), out_x)
            out_y = jnp.where(m, edge_shift(vy, dy, dx), out_y)
    return out_x, out_y


def nearest_velocity(gbuffer: GBuffer, uv, inv_size):
    """Velocity dilation via 4-tap max-depth (taa.wgsl:54-73). ``inv_size``
    is the texel size of the *render* texture the pass runs at. Same-res
    identity uv takes the zero-gather planes path; the general path keeps
    dynamic nearest-sample taps."""
    gh, gw = gbuffer.position.shape[:2]
    if uv.shape[:2] == (gh, gw):
        out_x, out_y = _nearest_velocity_planes(gbuffer)
        return jnp.stack([out_x, out_y], axis=-1)
    tx, ty = inv_size
    offs = [(tx, ty), (-tx, ty), (tx, -ty), (-tx, -ty)]
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
    ox = tx * jnp.sum(jnp.where(is_max, xsign, 0.0), axis=-1)
    oy = ty * jnp.sum(jnp.where(is_max, ysign, 0.0), axis=-1)
    offset = jnp.where(
        (depth < max_depth)[..., None], jnp.stack([ox, oy], axis=-1), 0.0
    )
    return nearest_sample(gbuffer.velocity_uv, uv + offset)[..., :2]


# 4x4 Catmull-Rom window taps actually used by the 5-tap scheme: the four
# corners never enter _catmull_apply_planes, so the packed window carries
# 12 taps (x3 channels = 36 lanes) instead of 16.
CATMULL_TAPS = [
    (i - 1, j - 1)
    for i in range(4)
    for j in range(4)
    if (i, j) not in ((0, 0), (0, 3), (3, 0), (3, 3))
]


def catmull_rom_5tap(img, sample_position, size_hw):
    """5-tap Catmull-Rom history resample (taa.wgsl:127-144; TheRealMJP).

    Every texel the five bilinear taps touch lies inside the 4x4 window
    whose corner is one texel above-left of the sample, so the whole
    resample is ONE row gather of the 12 used window taps
    (pack_window_gather) instead of five separate bilinear fetches. The
    taps are then recomputed from the window with the published weights.
    Border semantics: the window base clamps into the image and the
    packed shifts clamp to edge, which matches per-tap clamping except
    for samples reprojected >1 texel outside the image — those pixels are
    boundary-disoccluded and variance-clipped anyway."""
    h, w = size_hw
    texel_pos_1 = jnp.floor(sample_position - 0.5) + 0.5
    f = sample_position - texel_pos_1
    kx = jnp.clip(jnp.floor(texel_pos_1[..., 0]).astype(jnp.int32), 0, w - 1)
    ky = jnp.clip(jnp.floor(texel_pos_1[..., 1]).astype(jnp.int32), 0, h - 1)
    at = pack_window_gather([(img, CATMULL_TAPS)], ky, kx)
    out = _catmull_apply_planes(
        lambda i, j: at(0, i - 1, j - 1), f[..., 0], f[..., 1]
    )
    if img.ndim == 2:
        return out[0]
    return jnp.stack(out, axis=-1)


def _catmull_apply_planes(W, fx, fy):
    """Catmull-Rom 5-tap weights applied to a 4x4 window accessor
    ``W(i, j) -> [2D plane per channel]`` (window row i, col j; the sample
    sits between (1,1) and (2,2)); ``fx``/``fy`` are the in-texel fraction
    planes. Returns a list of 2D planes. Corner taps (0,0)/(0,3)/(3,0)/
    (3,3) are never requested (see CATMULL_TAPS)."""

    def weights(f):
        w0 = f * (-0.5 + f * (1.0 - 0.5 * f))
        w1 = 1.0 + f * f * (-2.5 + 1.5 * f)
        w2 = f * (0.5 + f * (2.0 - 1.5 * f))
        w3 = f * f * (-0.5 + 0.5 * f)
        return w0, w1, w2, w3

    wx = weights(fx)
    wy = weights(fy)
    w12x = wx[1] + wx[2]
    w12y = wy[1] + wy[2]
    ox = wx[2] / jnp.maximum(w12x, 1e-8)
    oy = wy[2] / jnp.maximum(w12y, 1e-8)

    def lx(a, b):
        return [pa + (pb - pa) * ox for pa, pb in zip(a, b)]

    def ly(a, b):
        return [pa + (pb - pa) * oy for pa, pb in zip(a, b)]

    def cl(planes):
        return [jnp.clip(p, 0.0, 1.0) for p in planes]

    t_x12_y0 = cl(lx(W(0, 1), W(0, 2)))
    t_x0_y12 = cl(ly(W(1, 0), W(2, 0)))
    t_x12_y12 = cl(ly(lx(W(1, 1), W(1, 2)), lx(W(2, 1), W(2, 2))))
    t_x3_y12 = cl(ly(W(1, 3), W(2, 3)))
    t_x12_y3 = cl(lx(W(3, 1), W(3, 2)))

    out = []
    for c in range(len(t_x12_y12)):
        acc = t_x12_y0[c] * (w12x * wy[0])
        acc += t_x0_y12[c] * (wx[0] * w12y)
        acc += t_x12_y12[c] * (w12x * w12y)
        acc += t_x3_y12[c] * (wx[3] * w12y)
        acc += t_x12_y3[c] * (w12x * wy[3])
        out.append(acc)
    return out


def taa_jasmine(
    render,  # (h, w, 4) current frame at this pass's resolution
    previous_render,  # (h, w, 4) TAA history
    gbuffer: GBuffer,  # current G-buffer (full deferred res)
    prev_gbuffer: GBuffer,
    clear_color,
    upscale_ratio: float,
    reproject: str = "adaptive",
):
    h, w = render.shape[0], render.shape[1]

    cur_r, cur_g, cur_b = (render[..., c] for c in range(3))

    same_res = gbuffer.position.shape[:2] == (h, w)
    if same_res:
        vel_x, vel_y = _nearest_velocity_planes(gbuffer)
        cur_depth = gbuffer.position[..., 3]
        cur_px = gbuffer.position[..., 0]
        cur_py = gbuffer.position[..., 1]
        cur_pz = gbuffer.position[..., 2]
    else:
        uv = uv_grid((h, w))
        vel = nearest_velocity(gbuffer, uv, (1.0 / w, 1.0 / h))
        vel_x, vel_y = vel[..., 0], vel[..., 1]
        cur_pd = nearest_sample(gbuffer.position, uv)
        cur_depth = cur_pd[..., 3]
        cur_px, cur_py, cur_pz = (cur_pd[..., c] for c in range(3))

    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    ux = (xs.astype(jnp.float32) + 0.5) / w
    uy = (ys.astype(jnp.float32) + 0.5) / h
    prev_ux = ux - vel_x
    prev_uy = uy - vel_y
    boundary_miss = (jnp.abs(prev_ux - 0.5) > 0.5) | (
        jnp.abs(prev_uy - 0.5) > 0.5
    )

    has_content = cur_depth > 0.0
    depth_miss = cur_depth == 0.0
    position_miss = cur_depth == 0.0

    # ---- ONE window gather for every reprojected fetch ----
    # All previous-frame taps (bias-loop depth gathers and position
    # nearests, the velocity nearest, and the Catmull-Rom history window)
    # share the base index k = floor(sample_position - 0.5): the ±1.5-texel
    # bias taps land at k + static offset + a half-texel bit, all inside a
    # 6x6 window (position xyz: 4x4; history: the 12 used Catmull taps).
    # Packed channels: depth 36 + xyz 48 + velocity 8 + history 36 = 128 —
    # exactly one TPU lane tile, one wide gather.
    # (xs + 0.5) - vel*size, NOT prev_ux*size: the (x+0.5)/w*w fp
    # roundtrip loses bits exactly at the integer floor boundaries the
    # base index sits on, so zero velocity would not reproduce the
    # identity base (and the static-camera fast path would never engage).
    spx = (xs.astype(jnp.float32) + 0.5) - vel_x * w
    spy = (ys.astype(jnp.float32) + 0.5) - vel_y * h
    tpx = jnp.floor(spx - 0.5)
    tpy = jnp.floor(spy - 0.5)
    frx = spx - 0.5 - tpx  # in-texel fraction, == catmull's f
    fry = spy - 0.5 - tpy
    kx = jnp.clip(tpx.astype(jnp.int32), 0, w - 1)
    ky = jnp.clip(tpy.astype(jnp.int32), 0, h - 1)
    bit_x = frx >= 0.5
    bit_y = fry >= 0.5

    DEPTH, POS, VEL, HIST = 0, 1, 2, 3
    # DEPTH channels are 2x2-MAXED windows (reduce=(2, 2), see
    # filters.pack_window_gather): the bias loop's two OR-reductions over
    # each 2x2 gather — any(pd > 0) and any(cur/pd < 0.95) — are both
    # monotone in pd, so one maxed channel serves both. Tap lists carry
    # only the USED offsets (sign-pair combos + the unbiased base), not
    # the per-axis cross: 36 -> 17 depth channels, 48 -> 24 position.
    specs = [
        (
            prev_gbuffer.position[..., 3],
            [(0, 0)] + cross((1, 2, -2, -1), (1, 2, -2, -1)),
            None,
            (2, 2),
        ),
        (
            prev_gbuffer.position,
            cross((0, 1), (0, 1)) + cross((2, -1), (2, -1)),
            (0, 1, 2),
        ),
        (prev_gbuffer.velocity_uv, cross((0, 1), (0, 1)), (0, 1)),
        (previous_render, CATMULL_TAPS, (0, 1, 2)),
    ]
    # Zero-velocity steady state (static camera): the base is the pixel
    # grid itself, so every previous-frame tap is a static shift and the
    # pack build + wide gather (+ their backward scatter-adds) are
    # skipped — see filters.cond_window_gather.
    identity = jnp.all(ky == ys) & jnp.all(kx == xs)

    def _taa_body(at):
        return _taa_consume(
            at,
            (DEPTH, POS, VEL, HIST),
            (frx, fry, bit_y, bit_x),
            (cur_r, cur_g, cur_b),
            (cur_depth, cur_px, cur_py, cur_pz),
            (vel_x, vel_y),
            (has_content, depth_miss, position_miss, boundary_miss),
            render,
            clear_color,
            upscale_ratio,
        )

    return cond_window_gather(
        identity,
        lambda: identity_window_accessor(specs),
        lambda: pack_window_gather(specs, ky, kx),
        _taa_body,
        mode=reproject,
    )


def _taa_consume(
    at,
    slots,
    fracs,
    cur_rgb,
    cur_pos,
    vel,
    misses,
    render,
    clear_color,
    upscale_ratio,
):
    """Everything in taa_jasmine downstream of the window accessor —
    shared verbatim by the static-shift and packed-gather branches of
    filters.cond_window_gather (one body, two transports)."""
    DEPTH, POS, VEL, HIST = slots
    frx, fry, bit_y, bit_x = fracs
    cur_r, cur_g, cur_b = cur_rgb
    cur_depth, cur_px, cur_py, cur_pz = cur_pos
    vel_x, vel_y = vel
    has_content, depth_miss, position_miss, boundary_miss = misses

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

    biases = [
        (0.0, 0.0),
        (1.5, 1.5),
        (-1.5, 1.5),
        (1.5, -1.5),
        (-1.5, -1.5),
    ]
    for bx, by in biases:
        # One 2x2-maxed depth channel per biased textureGather (the DEPTH
        # spec's reduce): any(pd > 0) == max(pd) > 0, and the OR of
        # per-corner `cur/pd < 0.95` == `cur/max(pd) < 0.95` (IEEE
        # division monotone in the denominator; max == 0 means every
        # corner was 0 == every ratio forced to 1).
        maxpd = dyn_at(DEPTH, gather_base(by), gather_base(bx))[0]
        has_content = has_content | (maxpd > 0.0)
        depth_miss = depth_miss | jnp.where(
            maxpd == 0.0,
            False,
            cur_depth / jnp.where(maxpd == 0.0, 1.0, maxpd) < 0.95,
        )
        ppx, ppy, ppz = dyn_at(POS, nearest_off(by), nearest_off(bx))
        dist2 = (
            (cur_px - ppx) ** 2 + (cur_py - ppy) ** 2 + (cur_pz - ppz) ** 2
        )
        position_miss = position_miss | (dist2 > 0.25)

    pvel_x, pvel_y = dyn_at(VEL, (0, 1), (0, 1))
    velocity_miss = (
        (vel_x - pvel_x) ** 2 + (vel_y - pvel_y) ** 2
    ) > 0.00005**2

    prev_r, prev_g, prev_b = _catmull_apply_planes(
        lambda i, j: at(HIST, i - 1, j - 1), frx, fry
    )

    # Disocclusion -> 3x3 YCoCg variance clipping (taa.wgsl:146-164).
    # YCoCg is a linear per-pixel transform, so ycocg(shift(rgb)) ==
    # shift(ycocg(rgb)): convert once, then the taps are static ±1-texel
    # edge shifts of the three 2D chroma planes — zero gathers.
    cy0, co0, cg0 = rgb_to_ycocg_planes(
        jnp.clip(cur_r, 0.0, 1.0),
        jnp.clip(cur_g, 0.0, 1.0),
        jnp.clip(cur_b, 0.0, 1.0),
    )
    center = (cy0, co0, cg0)
    offsets = [
        (1, -1), (1, 0), (1, 1),
        (0, -1), (0, 0), (0, 1),
        (-1, -1), (-1, 0), (-1, 1),
    ]
    m1 = [jnp.zeros_like(p) for p in center]
    m2 = [jnp.zeros_like(p) for p in center]
    for dy, dx in offsets:
        for c, p in enumerate(center):
            t = p if (dy == 0 and dx == 0) else edge_shift(p, dy, dx)
            m1[c] = m1[c] + t
            m2[c] = m2[c] + t * t
    mean = [a / 9.0 for a in m1]
    # safe_sqrt0: flat regions make the 3x3 variance EXACTLY 0, where
    # sqrt's inf derivative x the (zero) clip-path cotangent births NaN.
    var = [safe_sqrt0(b / 9.0 - m * m) for b, m in zip(m2, mean)]
    prev_y = rgb_to_ycocg_planes(prev_r, prev_g, prev_b)
    clipped = clip_aabb_planes(
        prev_y,
        [m - v for m, v in zip(mean, var)],
        [m + v for m, v in zip(mean, var)],
    )
    clip_r, clip_g, clip_b = ycocg_to_rgb_planes(*clipped)
    do_clip = boundary_miss | (position_miss & velocity_miss & depth_miss)
    prev_r = jnp.where(do_clip, clip_r, prev_r)
    prev_g = jnp.where(do_clip, clip_g, prev_g)
    prev_b = jnp.where(do_clip, clip_b, prev_b)

    blend = 0.1 / upscale_ratio
    out_r = prev_r + (cur_r - prev_r) * blend
    out_g = prev_g + (cur_g - prev_g) * blend
    out_b = prev_b + (cur_b - prev_b) * blend

    clear = jnp.broadcast_to(jnp.asarray(clear_color), (4,))
    out = jnp.stack(
        [
            jnp.where(has_content, p, clear[c])
            for c, p in enumerate((out_r, out_g, out_b))
        ]
        + [jnp.where(has_content, render[..., 3], clear[3])],
        axis=-1,
    )
    return out

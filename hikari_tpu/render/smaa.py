"""SMAA TU4x temporal upscaler (checkerboard 4x reconstruction).

jnp equivalent of src/shaders/smaa.wgsl: each low-res render pixel maps to
a 2x2 output quad; the current sample fills one diagonal slot (by frame
parity), the reprojected previous frame fills the other (with depth/
instance/velocity disocclusion + 2x2 YCoCg clipping + subpixel-velocity
differential remix), and ``smaa_tu4x_extrapolate`` fills the remaining two
slots by differential blending of 6 neighbors.

TPU formulation: the pass body works on 2D per-channel planes end to end
(a materialized rank-3 temp with a small minor channel dim lane-pads up
to 128x — the round-2 driver-bench OOM, BENCH_r02.json); the four quad
slots are computed as (h, w) planes and interleaved with static strided
writes — no scatter. All reprojected fetches ride ONE 100-channel window
gather (filters.pack_window_gather); every static-affine tap is a strided
slice (filters.quad_phase_sampler), zero gathers."""

from __future__ import annotations

import jax.numpy as jnp

from hikari_tpu.render.filters import (
    cond_window_gather,
    cross,
    interleave2x2,
    make_dyn_at,
    pack_window_gather,
    parity_shift,
    quad_phase_sampler,
)
from hikari_tpu.render.taa import (
    clip_aabb_planes,
    rgb_to_ycocg_planes,
    ycocg_to_rgb_planes,
)
from hikari_tpu.render.types import GBuffer
from hikari_tpu.utils import TAU, fract, safe_sqrt0


def _lum_planes(r, g, b):
    """Rec.709 luma of per-channel planes (matches utils.luminance)."""
    return 0.2126 * r + 0.7152 * g + 0.0722 * b


def _velocity_dilation_offsets(pos_tap):
    """The depth half of taa.nearest_velocity at the static-affine quad uv
    (taa.wgsl:54-73): 4 diagonal depth taps pick the farthest-depth
    direction; the dilation offset per axis is the sum of tied max-depth
    tap signs, in [-2, 2]. Returns (sy, sx) i32 planes."""
    # offs order matches taa.nearest_velocity: (ox, oy) signs
    signs = [(1.0, 1.0), (-1.0, 1.0), (1.0, -1.0), (-1.0, -1.0)]
    depths = [pos_tap(int(oy), int(ox)) for ox, oy in signs]
    depth = pos_tap(0, 0)
    max_depth = depths[0]
    for d in depths[1:]:
        max_depth = jnp.maximum(max_depth, d)
    sx = jnp.zeros_like(depth)
    sy = jnp.zeros_like(depth)
    for (xsgn, ysgn), d in zip(signs, depths):
        is_max = d == max_depth
        sx = sx + jnp.where(is_max, xsgn, 0.0)
        sy = sy + jnp.where(is_max, ysgn, 0.0)
    take = depth < max_depth
    sx = jnp.where(take, sx, 0.0).astype(jnp.int32)
    sy = jnp.where(take, sy, 0.0).astype(jnp.int32)
    return sy, sx


def _nearest_velocity_quad(pos_tap, vel_tap):
    """Dilated-velocity fetch via a 25-way select over strided taps
    (zero gathers). Kept for A/B (HIKARI_VELQ_SELECT=1) against the
    packed-row gather variant below."""
    sy, sx = _velocity_dilation_offsets(pos_tap)
    vel_x = vel_tap(0, 0, 0)
    vel_y = vel_tap(0, 0, 1)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            if dy == 0 and dx == 0:
                continue
            m = (sy == dy) & (sx == dx)
            vel_x = jnp.where(m, vel_tap(dy, dx, 0), vel_x)
            vel_y = jnp.where(m, vel_tap(dy, dx, 1), vel_y)
    return vel_x, vel_y


def _nearest_velocity_quad_gather(pos_tap, velocity_uv, prev_j):
    """Dilated-velocity fetch as ONE packed row gather: the 25-way
    select chain costs ~50 strided taps + selects (~0.7 ms/tap measured
    in-pipeline, tools/bench_smaa_iso.py); a single (h*w)-row gather of
    the 2-channel out-res velocity at the per-pixel dilated coordinate
    is one ~6 ms fetch. Bitwise-equal to _nearest_velocity_quad (same
    clamp + offsets; tests/test_gather_rework.py)."""
    from hikari_tpu.render.filters import gather_packed_rows, pack_rows

    sy, sx = _velocity_dilation_offsets(pos_tap)
    oh, ow = velocity_uv.shape[0], velocity_uv.shape[1]
    h, w = oh // 2, ow // 2
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    oy = jnp.clip(2 * ys + prev_j + sy, 0, oh - 1)
    ox = jnp.clip(2 * xs + prev_j + sx, 0, ow - 1)
    rows = gather_packed_rows(
        pack_rows([velocity_uv[..., 0], velocity_uv[..., 1]]), ow, oy, ox
    )
    return rows[..., 0], rows[..., 1]


def smaa_tu4x(
    render,  # (h, w, 4) tonemapped current at render res
    prev_upscaled,  # (2h, 2w, 4) previous output
    gbuffer: GBuffer,
    prev_gbuffer: GBuffer,
    frame_number,
    stop=None,  # intra-pass profiling stop point (tools/profile_prefix.py)
    reproject: str = "adaptive",
):
    h, w = render.shape[0], render.shape[1]
    oh, ow = 2 * h, 2 * w

    def _trunc(*vals):
        """Profiling truncation: reduce everything computed so far into a
        dummy output (sum-coupled, clipped so sentinels stay finite)."""
        import jax as _jax

        acc = sum(
            jnp.sum(jnp.clip(jnp.nan_to_num(v.astype(jnp.float32)), -1e6, 1e6))
            for t in vals
            for v in _jax.tree_util.tree_leaves(t)
            if hasattr(v, "dtype")
        )
        return jnp.zeros((oh, ow, 4)) + acc

    even = (frame_number & 1) == 0
    prev_j = jnp.where(even, 1, 0)

    cur_r, cur_g, cur_b = (render[..., c] for c in range(3))

    # Static-affine taps: every fetch at prev_out_uv + const lands on the
    # out-res texel (2y + j + c) — strided channel-plane slices via
    # quad_phase_sampler, zero gathers (only velocity-dependent
    # reprojection fetches below remain true gathers).
    import os as _os

    # Only the depth channel of position is ever tapped (the quad
    # depth compares + velocity dilation): phase-decompose the single
    # 2D plane, not all four position channels.
    pos_tap = quad_phase_sampler(gbuffer.position[..., 3], prev_j)
    inst_tap = quad_phase_sampler(gbuffer.instance.astype(jnp.float32), prev_j)
    if _os.environ.get("HIKARI_VELQ_SELECT"):
        vel_tap = quad_phase_sampler(gbuffer.velocity_uv, prev_j)
        vel_x, vel_y = _nearest_velocity_quad(pos_tap, vel_tap)
    else:
        vel_x, vel_y = _nearest_velocity_quad_gather(
            pos_tap, gbuffer.velocity_uv, prev_j
        )
    if stop == "velq":
        return _trunc(cur_r, cur_g, cur_b, vel_x, vel_y)

    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    pj = prev_j.astype(jnp.float32)
    prev_out_ux = (2.0 * xs.astype(jnp.float32) + pj + 0.5) / ow
    prev_out_uy = (2.0 * ys.astype(jnp.float32) + pj + 0.5) / oh
    prev_ux = prev_out_ux - vel_x
    prev_uy = prev_out_uy - vel_y
    boundary_miss = (jnp.abs(prev_ux - 0.5) > 0.5) | (
        jnp.abs(prev_uy - 0.5) > 0.5
    )

    cur_instance = inst_tap(0, 0)
    cur_depth = pos_tap(0, 0)

    # ---- ONE window gather for every reprojected fetch ----
    # The ±2.5-texel bias taps (prev depth textureGathers + prev instance
    # nearests), the prev-upscaled nearest, and the prev-velocity nearest
    # all index out-res planes at prev_reproj_uv + const: pack their
    # windows around the shared base floor(sp - 0.5) and gather once
    # (pack_window_gather) — 12 narrow gathers -> 1 wide one. Channels:
    # depth 64 + instance 16 + prev rgb 12 + velocity 8 = 100.
    # (2x + j + 0.5) - vel*size, NOT prev_ux*size: the uv/size roundtrip
    # loses bits exactly on the floor boundaries the base sits on, which
    # would keep the zero-velocity fast path (cond_window_gather) from
    # engaging (see taa.py).
    spx = (2.0 * xs.astype(jnp.float32) + pj + 0.5) - vel_x * ow
    spy = (2.0 * ys.astype(jnp.float32) + pj + 0.5) - vel_y * oh
    tpx = jnp.floor(spx - 0.5)
    tpy = jnp.floor(spy - 0.5)
    frx = spx - 0.5 - tpx
    fry = spy - 0.5 - tpy
    kx = jnp.clip(tpx.astype(jnp.int32), 0, ow - 1)
    ky = jnp.clip(tpy.astype(jnp.int32), 0, oh - 1)
    bit_x = frx >= 0.5
    bit_y = fry >= 0.5

    DPTH, INST, PREV, PVEL = 0, 1, 2, 3
    # DPTH channels are 2x2-MAXED prev-depth windows (reduce=(2, 2)): the
    # disocclusion test below ORs `cur/pd < 0.95` over each biased 2x2
    # textureGather, which is exactly `cur/max(pd) < 0.95` (IEEE division
    # is monotone in the denominator; pd==0 taps can never win the max
    # into a false miss since depths are >= 0). 25 packed channels
    # instead of the 64 per-texel ones (measured: the pack build is the
    # cost, ~28 ms/GB of table).
    # Tap lists are the USED offsets only, not the per-axis cross: the
    # biased gathers only ever request sign-pair combos (+2.5/-2.5 per
    # axis) or the unbiased (0, 0) — the cross's mixed rows like (0, 2)
    # are never fetched. DPTH 25 -> 17 channels, INST 16 -> 8.
    specs = [
        (
            prev_gbuffer.position[..., 3],
            [(0, 0)] + cross((2, 3, -3, -2), (2, 3, -3, -2)),
            None,
            (2, 2),
        ),
        (
            prev_gbuffer.instance.astype(jnp.float32),
            cross((0, 1), (0, 1)) + cross((3, -2), (3, -2)),
        ),
        (prev_upscaled, cross((0, 1), (0, 1)), (0, 1, 2)),
        (prev_gbuffer.velocity_uv, cross((0, 1), (0, 1)), (0, 1)),
    ]
    # Zero-velocity steady state: the reprojected base equals the
    # quad-phase map (2y + j, 2x + j), so every previous-frame tap is a
    # phase-decomposed strided slice (quad_phase_sampler) — the pack
    # build + 100-ch gather (+ backward scatter-adds) are skipped.
    # See filters.cond_window_gather.
    identity = jnp.all(ky == 2 * ys + prev_j) & jnp.all(kx == 2 * xs + prev_j)

    def _shift_at():
        samplers = {}

        def at(si, dy, dx):
            img = specs[si][0]
            chs = specs[si][2] if len(specs[si]) > 2 else None
            red = specs[si][3] if len(specs[si]) > 3 else None
            if si not in samplers:
                samplers[si] = quad_phase_sampler(img, prev_j, pad=6)
            tap = samplers[si]

            def one(c):
                if red is None:
                    return tap(dy, dx, c)
                # Max-reduced window channel (mirrors pack_window_gather's
                # reduce): max of per-texel-clamped taps == clamped
                # window max.
                ry, rx = red
                acc = None
                for ddy in range(ry):
                    for ddx in range(rx):
                        s = tap(dy + ddy, dx + ddx, c)
                        acc = s if acc is None else jnp.maximum(acc, s)
                return acc

            if img.ndim == 2:
                return [one(0)]
            chs = range(img.shape[-1]) if chs is None else chs
            return [one(c) for c in chs]

        return at

    def _smaa_body(at):
        return _consume(at)

    def _consume(at):
        dyn_at = make_dyn_at(at, bit_y, bit_x)

        prev_r, prev_g, prev_b = dyn_at(PREV, (0, 1), (0, 1))

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
            # One 2x2-maxed depth channel per biased textureGather (the
            # DPTH spec's reduce): OR of per-corner `cur/pd < 0.95` ==
            # `cur/max(pd) < 0.95` (division monotone in denominator;
            # max(pd)==0 means all corners were 0 == all ratios 1).
            maxpd = dyn_at(DPTH, gather_base(by), gather_base(bx))[0]
            miss_here = jnp.where(
                maxpd == 0.0,
                False,
                cur_depth / jnp.where(maxpd == 0.0, 1.0, maxpd) < 0.95,
            )
            depth_miss = depth_miss | miss_here
            prev_instance = dyn_at(INST, nearest_off(by), nearest_off(bx))[0]
            instance_miss = instance_miss | (
                miss_here & (jnp.abs(prev_instance - cur_instance) > 1.0)
            )

        pvel_x, pvel_y = dyn_at(PVEL, (0, 1), (0, 1))
        velocity_miss = (
            (vel_x - pvel_x) ** 2 + (vel_y - pvel_y) ** 2
        ) > 0.0001**2
        if stop == "gather":
            return _trunc(
                prev_r, prev_g, prev_b, depth_miss, instance_miss, velocity_miss
            )

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
        min_ds = jnp.full((h, w), 10.0)
        # quad[i] = (r, g, b) planes of 2x2 corner i at the winning bias
        quad = [None] * 4
        for bx, by in biases:
            cy, cx = _BSHIFT[by], _BSHIFT[bx]
            dds = None
            for dy in (0, 1):
                for dx in (0, 1):
                    d = cur_depth - pos_tap(cy + dy, cx + dx)
                    dds = d * d if dds is None else dds + d * d
            # safe_sqrt0: with a static scene the gathered prev depths can
            # equal cur_depth exactly -> dds == 0 (see utils.safe_sqrt0).
            dds = safe_sqrt0(dds)
            take = dds < min_ds
            for i, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
                corner_rgb = tuple(
                    parity_shift(
                        p,
                        even,
                        _RSHIFT1[by] + dy, _RSHIFT1[bx] + dx,
                        _RSHIFT0[by] + dy, _RSHIFT0[bx] + dx,
                    )
                    for p in (cur_r, cur_g, cur_b)
                )
                quad[i] = corner_rgb if quad[i] is None else tuple(
                    jnp.where(take, q, o) for q, o in zip(corner_rgb, quad[i])
                )
            min_ds = jnp.minimum(min_ds, dds)

        m1 = [jnp.zeros((h, w))] * 3
        m2 = [jnp.zeros((h, w))] * 3
        for corner_rgb in quad:
            t = rgb_to_ycocg_planes(*corner_rgb)
            m1 = [a + p for a, p in zip(m1, t)]
            m2 = [b + p * p for b, p in zip(m2, t)]
        mean = [a / 4.0 for a in m1]
        var = [
            safe_sqrt0(b / 4.0 - m * m) for b, m in zip(m2, mean)
        ]
        prev_y = rgb_to_ycocg_planes(prev_r, prev_g, prev_b)
        clipped = clip_aabb_planes(
            prev_y,
            [m - v for m, v in zip(mean, var)],
            [m + v for m, v in zip(mean, var)],
        )
        clip_r, clip_g, clip_b = ycocg_to_rgb_planes(*clipped)
        do_clip = boundary_miss | ((depth_miss | instance_miss) & velocity_miss)
        prev_r = jnp.where(do_clip, clip_r, prev_r)
        prev_g = jnp.where(do_clip, clip_g, prev_g)
        prev_b = jnp.where(do_clip, clip_b, prev_b)
        if stop == "clip":
            return _trunc(prev_r, prev_g, prev_b)

        # Subpixel-velocity differential remix (smaa.wgsl:186-195).
        subpix_x = fract(vel_x * (0.5 * ow))
        subpix_y = fract(vel_y * (0.5 * oh))
        blend = jnp.clip(
            -jnp.cos(jnp.maximum(subpix_x, subpix_y) * TAU), 0.0, 1.0
        )
        # Bilinear at prev_out_uv on the render texture: parity-static corners
        # (even j=1: base 0, fx 0.25; odd j=0: base -1, fx 0.75), per-tap
        # edge clamp — zero gathers.
        fxy = jnp.where(even, 0.25, 0.75)
        remix = []
        for p in (cur_r, cur_g, cur_b):
            c00 = parity_shift(p, even, 0, 0, -1, -1)
            c10 = parity_shift(p, even, 0, 1, -1, 0)
            c01 = parity_shift(p, even, 1, 0, 0, -1)
            c11 = parity_shift(p, even, 1, 1, 0, 0)
            remix.append(
                (c00 * (1 - fxy) + c10 * fxy) * (1 - fxy)
                + (c01 * (1 - fxy) + c11 * fxy) * fxy
            )
        prev_r = prev_r + (remix[0] - prev_r) * blend
        prev_g = prev_g + (remix[1] - prev_g) * blend
        prev_b = prev_b + (remix[2] - prev_b) * blend
        if stop == "remix":
            return _trunc(prev_r, prev_g, prev_b)

        ones = jnp.ones((h, w))
        cur_rgba = (cur_r, cur_g, cur_b, ones)
        prev_rgba = (prev_r, prev_g, prev_b, ones)

        # Quad planes: slot (j, j) gets current on even frames etc.
        q00 = tuple(jnp.where(even, c, p) for c, p in zip(cur_rgba, prev_rgba))
        q11 = tuple(jnp.where(even, p, c) for c, p in zip(cur_rgba, prev_rgba))

        # ------ extrapolate pass (smaa.wgsl:201-271) ------
        def shift(planes, dy, dx):
            return tuple(
                jnp.roll(jnp.roll(p, -dy, axis=0), -dx, axis=1) for p in planes
            )

        t_c = q00
        b_c = q11
        n_c = shift(q11, -1, 0)
        e_c = shift(q00, 0, 1)
        s_c = shift(q00, 1, 0)
        w_c = shift(q11, 0, -1)

        def lum_absdiff(a, b):
            return _lum_planes(
                jnp.abs(a[0] - b[0]), jnp.abs(a[1] - b[1]), jnp.abs(a[2] - b[2])
            )

        dh0 = lum_absdiff(w_c, b_c)
        dh1 = lum_absdiff(t_c, e_c)
        dv0 = lum_absdiff(t_c, s_c)
        dv1 = lum_absdiff(n_c, b_c)
        factor_x = jnp.maximum(dv0, 0.001) * jnp.maximum(dv1, 0.001)
        factor_y = jnp.maximum(dh0, 0.001) * jnp.maximum(dh1, 0.001)
        factor_z = 1.0 / (factor_x + factor_y)

        def diff_blend(t_, b_, l_, r_):
            return tuple(
                (0.5 * factor_z)
                * ((lp + rp) * factor_x + (tp + bp) * factor_y)
                for tp, bp, lp, rp in zip(t_, b_, l_, r_)
            )

        q10 = diff_blend(t_c, s_c, w_c, b_c)  # x slot: out[2y+1, 2x]
        q01 = diff_blend(n_c, b_c, t_c, e_c)  # y slot: out[2y, 2x+1]
        if stop == "extrap":
            return _trunc(q00, q01, q10, q11)

        out_planes = [
            interleave2x2(q00[c], q01[c], q10[c], q11[c]) for c in range(4)
        ]
        return jnp.stack(out_planes, axis=-1)

    # Measured-and-rejected (r5): a "phase_gather" transport that built
    # the window channels from quarter-res phase planes (quad-phase taps,
    # no out-res build, no gather) ran 203 ms vs 76.6 for the gather path
    # at bench shapes — the per-channel slice+parity-select construction
    # is the same slow op class that makes the shift accessor lose; the
    # out-res pack build + one row gather remains XLA's fastest shape.
    return cond_window_gather(
        identity,
        _shift_at,
        lambda: pack_window_gather(specs, ky, kx),
        _smaa_body,
        mode=reproject,
    )

"""Equivalence tests for the gather->strided-slice reworks: the rewritten
passes must match a naive gather-based formulation (the WGSL-literal tap
semantics of smaa.wgsl / taa.wgsl) on image interiors. Border columns may
differ by one texel: the rework clamps each tap from the UNCLAMPED base
(what WGSL's clamp-to-edge sampler does), while the naive jnp path clamps
the gather base first."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hikari_tpu.render.filters import (
    bilinear_sample,
    nearest_sample,
    texture_gather,
)
from hikari_tpu.render.taa import clip_towards_aabb_center, nearest_velocity
from hikari_tpu.render.types import GBuffer
from hikari_tpu.utils import TAU, fract, luminance, rgb_to_ycocg, uv_grid, ycocg_to_rgb


def _rand_gbuffer(rng, h, w, inst_count=4):
    pos = rng.uniform(0.5, 3.0, size=(h, w, 4)).astype(np.float32)
    return GBuffer(
        position=jnp.asarray(pos),
        normal=jnp.asarray(rng.normal(size=(h, w, 3)).astype(np.float32)),
        depth_gradient=jnp.asarray(rng.normal(size=(h, w, 2)).astype(np.float32)),
        instance=jnp.asarray(rng.integers(0, inst_count, size=(h, w)).astype(np.int32)),
        material=jnp.asarray(rng.integers(0, 4, size=(h, w)).astype(np.int32)),
        velocity_uv=jnp.asarray(
            (rng.uniform(-0.02, 0.02, size=(h, w, 4))).astype(np.float32)
        ),
    )


def _quad_uv(ys, xs, jitter, out_size):
    oh, ow = out_size
    x = 2 * xs + jitter
    y = 2 * ys + jitter
    return jnp.stack(
        [(x.astype(jnp.float32) + 0.5) / ow, (y.astype(jnp.float32) + 0.5) / oh],
        axis=-1,
    )


def _smaa_naive(render, prev_upscaled, gbuffer, prev_gbuffer, frame_number):
    """The pre-rework smaa_tu4x: literal per-tap gathers."""
    h, w = render.shape[0], render.shape[1]
    oh, ow = 2 * h, 2 * w
    out_texel = jnp.asarray([1.0 / ow, 1.0 / oh])
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")

    even = (frame_number & 1) == 0
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

    subpix = fract(velocity / (2.0 * out_texel))
    blend = jnp.clip(-jnp.cos(jnp.max(subpix, axis=-1) * TAU), 0.0, 1.0)
    remix = bilinear_sample(render, prev_out_uv)[..., :3]
    previous_color = previous_color + (remix - previous_color) * blend[..., None]

    cur_rgba = jnp.concatenate([current_color, jnp.ones((h, w, 1))], axis=-1)
    prev_rgba = jnp.concatenate([previous_color, jnp.ones((h, w, 1))], axis=-1)
    q00 = jnp.where(even, cur_rgba, prev_rgba)
    q11 = jnp.where(even, prev_rgba, cur_rgba)
    return q00, q11


def _taa_naive(render, previous_render, gbuffer, prev_gbuffer, clear_color,
               upscale_ratio):
    """The pre-rework taa_jasmine: literal per-tap gathers."""
    from hikari_tpu.render.taa import catmull_rom_5tap

    h, w = render.shape[0], render.shape[1]
    texel = jnp.asarray([1.0 / w, 1.0 / h])
    uv = uv_grid((h, w))

    current_color = render[..., :3]
    # old same-res nearest_velocity: static depth taps + one gather
    pos_depth = gbuffer.position[..., 3]

    def edge_shift_(img, dy, dx):
        from hikari_tpu.render.filters import edge_shift

        return edge_shift(img, dy, dx)

    offs = [(1, 1), (-1, 1), (1, -1), (-1, -1)]
    depths = jnp.stack(
        [edge_shift_(pos_depth, oy, ox) for ox, oy in offs], axis=-1
    )
    depth = pos_depth
    max_depth = jnp.max(depths, axis=-1)
    is_max = depths == max_depth[..., None]
    xsign = jnp.asarray([1.0, -1.0, 1.0, -1.0])
    ysign = jnp.asarray([1.0, 1.0, -1.0, -1.0])
    ox = (1.0 / w) * jnp.sum(jnp.where(is_max, xsign, 0.0), axis=-1)
    oy = (1.0 / h) * jnp.sum(jnp.where(is_max, ysign, 0.0), axis=-1)
    offset = jnp.where(
        (depth < max_depth)[..., None], jnp.stack([ox, oy], axis=-1), 0.0
    )
    velocity = nearest_sample(gbuffer.velocity_uv, uv + offset)[..., :2]

    previous_uv = uv - velocity
    boundary_miss = jnp.any(jnp.abs(previous_uv - 0.5) > 0.5, axis=-1)
    biases = [(0.0, 0.0), (1.5, 1.5), (-1.5, 1.5), (1.5, -1.5), (-1.5, -1.5)]
    cur_pd = gbuffer.position
    cur_depth = cur_pd[..., 3]
    has_content = cur_depth > 0.0
    depth_miss = cur_depth == 0.0
    position_miss = cur_depth == 0.0
    for bx, by in biases:
        b_uv = previous_uv + jnp.asarray([bx, by]) * texel
        prev_depths = texture_gather(prev_gbuffer.position, b_uv, 3)
        ratio = jnp.where(
            prev_depths == 0.0,
            1.0,
            cur_depth[..., None] / jnp.where(prev_depths == 0.0, 1.0, prev_depths),
        )
        has_content = has_content | jnp.any(prev_depths > 0.0, axis=-1)
        depth_miss = depth_miss | jnp.any(ratio < 0.95, axis=-1)
        prev_pos = nearest_sample(prev_gbuffer.position, b_uv)[..., :3]
        dist = jnp.linalg.norm(cur_pd[..., :3] - prev_pos, axis=-1)
        position_miss = position_miss | (dist > 0.5)

    prev_velocity = nearest_sample(prev_gbuffer.velocity_uv, previous_uv)[..., :2]
    velocity_miss = jnp.linalg.norm(velocity - prev_velocity, axis=-1) > 0.00005

    size = jnp.asarray([w, h], dtype=jnp.float32)
    sample_position = (uv - velocity) * size
    previous_color = catmull_rom_5tap(
        previous_render[..., :3], sample_position, (h, w)
    )

    from hikari_tpu.render.filters import edge_shift

    rgb = jnp.clip(render[..., :3], 0.0, 1.0)

    def s_ycocg(dx, dy):
        return rgb_to_ycocg(edge_shift(rgb, dy, dx))

    taps = [
        s_ycocg(-1, 1), s_ycocg(0, 1), s_ycocg(1, 1), s_ycocg(-1, 0),
        rgb_to_ycocg(jnp.clip(current_color, 0.0, 1.0)),
        s_ycocg(1, 0), s_ycocg(-1, -1), s_ycocg(0, -1), s_ycocg(1, -1),
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


def test_taa_matches_naive_interior(rng):
    """Dyadic dims: the mega-window-gather TAA must match the per-tap
    gather formulation away from borders (random velocity fields)."""
    from hikari_tpu.render.taa import taa_jasmine

    h, w = 64, 128
    render = jnp.asarray(rng.uniform(size=(h, w, 4)).astype(np.float32))
    prev = jnp.asarray(rng.uniform(size=(h, w, 4)).astype(np.float32))
    gb = _rand_gbuffer(rng, h, w)
    pgb = _rand_gbuffer(rng, h, w)
    clear = (0.1, 0.2, 0.3, 1.0)
    out_new = taa_jasmine(render, prev, gb, pgb, clear, 2.0)
    out_old = _taa_naive(render, prev, gb, pgb, clear, 2.0)
    sl = np.s_[5:-5, 5:-5]
    np.testing.assert_allclose(
        np.asarray(out_new)[sl], np.asarray(out_old)[sl], atol=1e-5
    )


@pytest.mark.parametrize("frame", [0, 1])
def test_smaa_quad_matches_naive_interior(rng, frame):
    """Power-of-two dims: the naive path's uv->pixel roundtrip is exact
    (dyadic rationals), so away from image borders the rework must agree
    bitwise. At non-dyadic sizes the naive path lands fp-noisily on exact
    texel boundaries (e.g. the by=-2.5 gather offsets are exact integers)
    and floor() falls either way — the rework computes the exact answer."""
    from hikari_tpu.render.smaa import smaa_tu4x

    h, w = 32, 64
    render = jnp.asarray(rng.uniform(size=(h, w, 4)).astype(np.float32))
    prev_up = jnp.asarray(rng.uniform(size=(2 * h, 2 * w, 4)).astype(np.float32))
    gb = _rand_gbuffer(rng, 2 * h, 2 * w)
    pgb = _rand_gbuffer(rng, 2 * h, 2 * w)
    fn = jnp.int32(frame)

    out = smaa_tu4x(render, prev_up, gb, pgb, fn)
    q00_new = out[0::2, 0::2]
    q11_new = out[1::2, 1::2]
    q00_ref, q11_ref = _smaa_naive(render, prev_up, gb, pgb, fn)

    # interior only: border taps clamp differently (see module docstring)
    sl = np.s_[5:-5, 5:-5]
    np.testing.assert_allclose(
        np.asarray(q00_new)[sl], np.asarray(q00_ref)[sl], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(q11_new)[sl], np.asarray(q11_ref)[sl], atol=1e-5
    )


@pytest.mark.parametrize("frame", [0, 1])
def test_smaa_static_scene_full_equivalence(rng, frame):
    """With zero velocity everywhere the reprojection is the identity and
    even border pixels must agree (interior base indices never clamp
    differently when the sample position is exactly on the texel grid)."""
    from hikari_tpu.render.smaa import smaa_tu4x

    h, w = 32, 16
    render = jnp.asarray(rng.uniform(size=(h, w, 4)).astype(np.float32))
    prev_up = jnp.asarray(rng.uniform(size=(2 * h, 2 * w, 4)).astype(np.float32))
    gb = _rand_gbuffer(rng, 2 * h, 2 * w)
    gb = GBuffer(
        position=gb.position,
        normal=gb.normal,
        depth_gradient=gb.depth_gradient,
        instance=gb.instance,
        material=gb.material,
        velocity_uv=jnp.zeros((2 * h, 2 * w, 4)),
    )
    pgb = gb
    fn = jnp.int32(frame)
    out = smaa_tu4x(render, prev_up, gb, pgb, fn)
    q00_ref, q11_ref = _smaa_naive(render, prev_up, gb, pgb, fn)
    sl = np.s_[1:-1, 1:-1]
    np.testing.assert_allclose(
        np.asarray(out[0::2, 0::2])[sl], np.asarray(q00_ref)[sl], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out[1::2, 1::2])[sl], np.asarray(q11_ref)[sl], atol=1e-5
    )


# ---------------------------------------------------------------------------
# Adaptive reprojection (filters.cond_window_gather): the static-shift
# branch must match the packed-gather branch whenever the integer base is
# the identity map — including sub-texel velocities (base still identity,
# fractions nonzero). Tolerance 1e-5, not bitwise: XLA fuses the shift
# branch into FMA chains while the gather branch materializes packed
# rows, so the same math rounds differently (measured max diff ~1e-6).
# ---------------------------------------------------------------------------


def _zero_velocity(gb, subpixel=0.0):
    v = jnp.zeros_like(gb.velocity_uv)
    if subpixel:
        v = v.at[..., 0].set(subpixel).at[..., 1].set(-subpixel)
    return GBuffer(
        position=gb.position,
        normal=gb.normal,
        depth_gradient=gb.depth_gradient,
        instance=gb.instance,
        material=gb.material,
        velocity_uv=v,
    )


@pytest.mark.parametrize("subpix", [0.0, 0.1])
def test_taa_adaptive_branches_equal(rng, monkeypatch, subpix):
    from hikari_tpu.render.taa import taa_jasmine

    h, w = 32, 64
    render = jnp.asarray(rng.uniform(size=(h, w, 4)).astype(np.float32))
    prev = jnp.asarray(rng.uniform(size=(h, w, 4)).astype(np.float32))
    gb = _zero_velocity(_rand_gbuffer(rng, h, w), subpixel=subpix / w)
    pgb = _rand_gbuffer(rng, h, w)
    clear = (0.1, 0.2, 0.3, 1.0)

    adaptive = np.asarray(taa_jasmine(render, prev, gb, pgb, clear, 2.0))
    monkeypatch.setenv("HIKARI_FORCE_WINDOW_GATHER", "1")
    forced = np.asarray(taa_jasmine(render, prev, gb, pgb, clear, 2.0))
    np.testing.assert_allclose(adaptive, forced, atol=1e-5)


@pytest.mark.parametrize("frame", [0, 1])
def test_smaa_adaptive_branches_equal(rng, monkeypatch, frame):
    from hikari_tpu.render.smaa import smaa_tu4x

    h, w = 16, 32
    render = jnp.asarray(rng.uniform(size=(h, w, 4)).astype(np.float32))
    prev_up = jnp.asarray(rng.uniform(size=(2 * h, 2 * w, 4)).astype(np.float32))
    gb = _zero_velocity(_rand_gbuffer(rng, 2 * h, 2 * w))
    pgb = _rand_gbuffer(rng, 2 * h, 2 * w)
    fn = jnp.int32(frame)

    adaptive = np.asarray(smaa_tu4x(render, prev_up, gb, pgb, fn))
    monkeypatch.setenv("HIKARI_FORCE_WINDOW_GATHER", "1")
    forced = np.asarray(smaa_tu4x(render, prev_up, gb, pgb, fn))
    # The YCoCg AABB clip selects on a hard ma_unit > 1.0 threshold;
    # branch-level fp reassociation noise (~1e-7) legitimately flips the
    # select at isolated near-threshold pixels, so assert agreement
    # within 5e-5 on >=99.5% of elements (measured: <=11/8192 flip).
    d = np.abs(adaptive - forced)
    assert np.mean(d > 5e-5) < 0.005, (np.mean(d > 5e-5), d.max())


def test_taa_adaptive_takes_gather_on_motion(rng):
    """A >1-texel velocity field must leave results identical to the
    forced-gather path (the identity predicate goes False)."""
    from hikari_tpu.render.taa import taa_jasmine

    h, w = 32, 64
    render = jnp.asarray(rng.uniform(size=(h, w, 4)).astype(np.float32))
    prev = jnp.asarray(rng.uniform(size=(h, w, 4)).astype(np.float32))
    gb = _rand_gbuffer(rng, h, w)  # random ±0.02 uv velocity ≈ ±1-2 texels
    pgb = _rand_gbuffer(rng, h, w)
    clear = (0.0, 0.0, 0.0, 0.0)
    adaptive = np.asarray(taa_jasmine(render, prev, gb, pgb, clear, 2.0))
    import os

    os.environ["HIKARI_FORCE_WINDOW_GATHER"] = "1"
    try:
        forced = np.asarray(taa_jasmine(render, prev, gb, pgb, clear, 2.0))
    finally:
        del os.environ["HIKARI_FORCE_WINDOW_GATHER"]
    # allclose, not bitwise: the adaptive path runs the same gather math
    # inside lax.cond, which XLA fuses (and rounds) slightly differently.
    np.testing.assert_allclose(adaptive, forced, atol=1e-5)


def test_reservoir_reproject_branches_equal(rng, monkeypatch):
    from hikari_tpu.render.light import (
        load_previous_reservoir,
        scatter_invalidate,
    )
    from hikari_tpu.render.restir import Reservoir

    h, w = 24, 40
    grid = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            rng.uniform(size=a.shape).astype(np.float32)
        ).astype(a.dtype)
        if a.dtype != jnp.int32
        else jnp.asarray(rng.integers(0, 5, size=a.shape).astype(np.int32)),
        Reservoir.zeros((h, w)),
    )
    uv = uv_grid((h, w))  # identity reprojection
    mask = jnp.asarray(rng.uniform(size=(h, w)) < 0.3)

    a1 = load_previous_reservoir(grid, uv, (h, w))
    s1 = scatter_invalidate(grid, uv, mask, (h, w))
    monkeypatch.setenv("HIKARI_FORCE_WINDOW_GATHER", "1")
    a2 = load_previous_reservoir(grid, uv, (h, w))
    s2 = scatter_invalidate(grid, uv, mask, (h, w))
    for x1, x2 in zip(jax.tree_util.tree_leaves(a1), jax.tree_util.tree_leaves(a2)):
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    for x1, x2 in zip(jax.tree_util.tree_leaves(s1), jax.tree_util.tree_leaves(s2)):
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


def test_pipeline_reproject_setting_equivalence():
    """settings.reproject ("adaptive" | "shift" | "gather") must produce
    the SAME image on a static scene: the host-level static hint
    ("shift") is only a legal specialization because the zero-velocity
    frame makes all three transports bitwise-identical (config.py
    RenderSettings.reproject; the bench relies on this)."""
    from hikari_tpu.config import RenderSettings, Taa, Upscale
    from hikari_tpu.io.scenes import cornell_config
    from hikari_tpu.render import initial_state, render_frame_jit
    from hikari_tpu.scene import build_scene_buffers

    scene, cam, _ = cornell_config(size=32)
    outs = {}
    for mode in ("adaptive", "shift", "gather"):
        s = RenderSettings(
            width=32, height=32, upscale=Upscale.smaa_tu4x(2.0),
            taa=Taa.JASMINE, denoise=True, indirect_bounces=1,
            reproject=mode,
        )
        b = build_scene_buffers(scene)
        st = initial_state(s)
        out = None
        for _ in range(3):
            out, st = render_frame_jit(b, cam, st, s)
        outs[mode] = np.asarray(out.image)
    np.testing.assert_allclose(outs["adaptive"], outs["shift"], atol=1e-5)
    np.testing.assert_allclose(outs["adaptive"], outs["gather"], atol=1e-5)

"""The path-traced lighting passes: direct (sun), emissive, indirect —
with ReSTIR temporal reuse and sample validation.

jnp re-expression of the reference compute kernels ``direct_lit`` (both
the sun variant with RENDER_EMISSIVE and the EMISSIVE_LIT variant) and
``indirect_lit_ambient`` (src/shaders/light.wgsl:1044-1498), dispatched by
``LightNode::run`` (src/light.rs:655-698). GPU divergent branches become
masked dense math; the uniform validation-frame branch becomes
``lax.cond`` (executes one side at runtime, like the GPU's uniform
branch); reservoir buffers are pytree grids in ``FrameState``.
"""

from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp

from hikari_tpu.diff import clip_gradient
from hikari_tpu.config import (
    DIRECT_VALIDATION_FRAME_SAMPLE_THRESHOLD,
    F32_EPSILON,
    GOLDEN_RATIO,
    MAX_VARIANCE,
    RAY_BIAS,
    RenderSettings,
)
from hikari_tpu.render.brdf import (
    calculate_view,
    compute_emissive_radiance,
    retrieve_surface,
    shading,
)
from hikari_tpu.render.camera import Camera
from hikari_tpu.render.restir import (
    Reservoir,
    Sample,
    check_previous_reservoir,
    clamp_reservoir,
    finalize_w,
    reservoir_variance,
    set_reservoir,
    temporal_restir,
)
from hikari_tpu.render.sampling import (
    NO_EMISSIVE,
    empty_hit_info,
    input_radiance,
    sample_cosine_hemisphere,
    select_light_candidate,
)
from hikari_tpu.render.types import GBuffer
from hikari_tpu.scene.buffers import SceneBuffers
from hikari_tpu.trace.api import hit_info, occlude_hit_info, trace_rays
from hikari_tpu.utils import (
    dot3,
    fract,
    gather_pixels,
    luminance,
    normal_basis,
    safe_normalize,
)


# ---------------------------------------------------------------------------
# G-buffer fetch at render resolution (reference jittered_deferred_* helpers,
# light.wgsl:1007-1017)
# ---------------------------------------------------------------------------


def jittered_deferred_uv(uv, frame_number, deferred_size, upscale_ratio, amount=0.25):
    h, w = deferred_size
    texel = jnp.asarray([1.0 / w, 1.0 / h])
    sign = jnp.where((frame_number & 1) == 0, amount, -amount)
    return uv + sign * texel * (upscale_ratio - 1.0)


def uv_to_coords(uv, size_hw):
    h, w = size_hw
    x = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    return y, x


def _deferred_phase(frame_number, ratio_int: int, amount: float):
    """Integer pixel offset of the jittered deferred map: for integer
    upscale ratio R, the per-render-pixel nearest deferred coordinate is
    the affine map  dy = R*y + c  with
    c = floor(R/2 + sign*amount*(R-1)), sign alternating by frame parity
    (same derivation as jittered_deferred_uv + uv_to_coords)."""
    sign = jnp.where((frame_number & 1) == 0, amount, -amount)
    c = jnp.floor(ratio_int / 2.0 + sign * (ratio_int - 1.0)).astype(jnp.int32)
    return jnp.clip(c, 0, ratio_int - 1)


def strided_deferred_plane(a, c, ratio_int: int, render_size):
    """Sample a full-res plane at the affine deferred map (dy = R*y + c):
    one dynamic_slice + a strided view — pure bandwidth. On TPU this
    replaces a per-pixel 2D gather, the slowest primitive on the chip
    (gathers in the deferred fetches were a measured ~1 s of a 6 s 1080p
    frame across the light passes)."""
    rh, rw = render_size
    R = ratio_int
    size = (R * (rh - 1) + 1, R * (rw - 1) + 1) + a.shape[2:]
    start = (c, c) + (0,) * (a.ndim - 2)
    window = jax.lax.dynamic_slice(a, start, size)
    return window[::R, ::R]


def fetch_gbuffer_deferred(
    gb: GBuffer, frame_number, settings, amount: float = 0.25
) -> GBuffer:
    """Nearest full-res G-buffer sample at every render pixel's jittered
    deferred uv (light.wgsl:1007-1017). Integer upscale ratios take the
    strided-slice path; fractional ratios fall back to true gathers."""
    ratio = settings.upscale_ratio
    render_size = settings.render_size
    if float(ratio).is_integer():
        Ri = int(ratio)
        c = _deferred_phase(frame_number, Ri, amount)
        f = lambda a: strided_deferred_plane(a, c, Ri, render_size)
        return GBuffer(
            position=clip_gradient(f(gb.position), 1e4, "gb_fetch"),
            normal=clip_gradient(f(gb.normal), 1e4, "gb_fetch"),
            depth_gradient=clip_gradient(f(gb.depth_gradient), 1e4, "gb_fetch"),
            instance=f(gb.instance),
            material=f(gb.material),
            velocity_uv=clip_gradient(f(gb.velocity_uv), 1e4, "gb_fetch"),
        )
    rh, rw = render_size
    ys, xs = render_coords(render_size)
    uv = jnp.stack(
        [(xs.astype(jnp.float32) + 0.5) / rw, (ys.astype(jnp.float32) + 0.5) / rh],
        axis=-1,
    )
    duv = jittered_deferred_uv(
        uv, frame_number, settings.output_size, ratio, amount
    )
    dy, dx = uv_to_coords(duv, settings.output_size)
    return fetch_gbuffer(gb, dy, dx)


def fetch_gbuffer(gb: GBuffer, y, x):
    # clip_gradient: bound + NaN-scrub cotangents flowing back into the
    # G-buffer (and through it into vertex positions) from the lighting
    # estimator chains — see diff.clip_gradient.
    return GBuffer(
        position=clip_gradient(gather_pixels(gb.position, y, x), 1e4, "gb_gather"),
        normal=clip_gradient(gather_pixels(gb.normal, y, x), 1e4, "gb_gather"),
        depth_gradient=clip_gradient(
            gather_pixels(gb.depth_gradient, y, x), 1e4, "gb_gather"
        ),
        instance=gather_pixels(gb.instance, y, x),
        material=gather_pixels(gb.material, y, x),
        velocity_uv=clip_gradient(gather_pixels(gb.velocity_uv, y, x), 1e4, "gb_gather"),
    )


def gather_reservoir(r: Reservoir, y, x) -> Reservoir:
    """Reproject a reservoir grid: all ~20 field channels share the index,
    so pack them into one row gather (gathers cost per output row, nearly
    width-independent — tools/bench_gather.py) instead of one gather per
    pytree leaf."""
    leaves, treedef = jax.tree_util.tree_flatten(r)
    if any(leaf.dtype.itemsize != 4 for leaf in leaves):
        return jax.tree_util.tree_map(lambda a: gather_pixels(a, y, x), r)
    # 32-bit non-float leaves (visible_instance i32) ride the same packed
    # row gather via a bit-preserving f32 reinterpret — gathers only move
    # rows, so the bits survive. The old any-non-f32 fallback cost ~10
    # per-leaf gathers (~50 ms/channel at 518k rows on v5e) instead of
    # one ~18 ms packed gather (tools/bench_smaa_prims.py --more).
    # NOTE: bitcast_convert_type has NO gradient rule — this path relies
    # on the detached-reuse invariant (reservoir reprojection is under
    # stop_gradient; see render/spatial.py gradient-policy notes). A
    # future non-detached caller would hit a hard AD error here, which is
    # the desired failure mode (loud, not silently biased).
    dtypes = [leaf.dtype for leaf in leaves]
    as_f32 = [
        leaf
        if leaf.dtype == jnp.float32
        else jax.lax.bitcast_convert_type(leaf, jnp.float32)
        for leaf in leaves
    ]
    expanded = [
        leaf[..., None] if leaf.ndim == y.ndim else leaf for leaf in as_f32
    ]
    widths = [e.shape[-1] for e in expanded]
    rows = gather_pixels(jnp.concatenate(expanded, axis=-1), y, x)
    # Named so pass-level remat saves the reprojected rows instead of
    # re-gathering in the backward sweep (see filters.gather_packed_rows).
    from jax.ad_checkpoint import checkpoint_name

    rows = checkpoint_name(rows, "packed_rows")
    out, off = [], 0
    for leaf, wdt, dt in zip(leaves, widths, dtypes):
        part = rows[..., off : off + wdt]
        off += wdt
        part = part[..., 0] if leaf.ndim == y.ndim else part
        if dt != jnp.float32:
            part = jax.lax.bitcast_convert_type(part, dt)
        out.append(part)
    return jax.tree_util.tree_unflatten(treedef, out)


def _reproject_identity(y, x, render_size):
    """True iff the integer reprojection map is the identity grid — the
    zero-velocity steady state (static camera), where every reprojected
    fetch/scatter collapses to elementwise ops. One fused reduce."""
    ys, xs = render_coords(render_size)
    return jnp.all(y == ys) & jnp.all(x == xs)


def load_previous_reservoir(
    grid: Reservoir, prev_uv, render_size, reproject: str = "adaptive"
) -> Reservoir:
    """Reference ``load_previous_reservoir`` (light.wgsl:181-190): empty
    outside [0,1]^2, nearest gather inside. When the reprojection is the
    identity map (zero velocity — static camera steady state) the gather
    (~18 ms per 25-ch reservoir grid at render res on v5e) and its
    backward scatter-add are skipped entirely. ``reproject``: "shift"/
    "gather" pick statically (the pipeline's frame-level cond decides
    once per frame — see filters.cond_window_gather); "adaptive" keeps a
    local lax.cond for standalone callers."""
    from hikari_tpu.render.filters import reproject_mode

    in_bounds = jnp.all(jnp.abs(prev_uv - 0.5) < 0.5, axis=-1)
    y, x = uv_to_coords(prev_uv, render_size)
    mode = reproject_mode(reproject)
    if mode == "shift":
        gathered = grid
    elif mode == "gather":
        gathered = gather_reservoir(grid, y, x)
    else:
        gathered = jax.lax.cond(
            _reproject_identity(y, x, render_size),
            lambda g: g,
            lambda g: gather_reservoir(g, y, x),
            grid,
        )
    empty = Reservoir.zeros(in_bounds.shape)
    return gathered.select(in_bounds, empty)


def scatter_invalidate(
    grid: Reservoir, prev_uv, mask, render_size, reproject: str = "adaptive"
) -> Reservoir:
    """Zero the reservoir at reprojected coords where ``mask`` — the
    reference's store_previous_spatial_reservoir of a reset reservoir
    (light.wgsl:1092-1095, :1199-1202). Collisions all write zeros."""
    from hikari_tpu.render.filters import reproject_mode

    in_bounds = jnp.all(jnp.abs(prev_uv - 0.5) <= 0.5, axis=-1)
    m = mask & in_bounds
    y, x = uv_to_coords(prev_uv, render_size)

    def _identity(g):
        # Identity map: each pixel written exactly once — the scatter-min
        # (~7 ms per 518k rows on v5e) is an elementwise select.
        return Reservoir.zeros(render_size).select(m, g)

    def _scatter(g):
        keep = jnp.ones(render_size)
        keep = keep.at[y.reshape(-1), x.reshape(-1)].min(
            jnp.where(m, 0.0, 1.0).reshape(-1)
        )
        invalidated = keep < 0.5
        return Reservoir.zeros(render_size).select(invalidated, g)

    mode = reproject_mode(reproject)
    if mode == "shift":
        return _identity(grid)
    if mode == "gather":
        return _scatter(grid)
    return jax.lax.cond(
        _reproject_identity(y, x, render_size), _identity, _scatter, grid
    )


def render_coords(render_size):
    rh, rw = render_size
    ys, xs = jnp.meshgrid(
        jnp.arange(rh, dtype=jnp.int32), jnp.arange(rw, dtype=jnp.int32), indexing="ij"
    )
    return ys, xs


def channel_random(noise_bank, frame_number, render_size):
    """Blue-noise 4D random + golden-ratio temporal scrambling
    (light.wgsl:1075-1079). Full-grid fetch takes the periodic tiled path
    (render/noise.noise_plane) — zero gathers."""
    from hikari_tpu.render.noise import noise_plane

    r = noise_plane(noise_bank, frame_number, render_size)
    return fract(r + frame_number.astype(jnp.float32) * GOLDEN_RATIO)


# ---------------------------------------------------------------------------
# full_screen_albedo (light.wgsl:1019-1042)
# ---------------------------------------------------------------------------


def full_screen_albedo(scene: SceneBuffers, camera: Camera, gb: GBuffer):
    """Env-BRDF albedo for demodulation + overlay fallback."""
    from hikari_tpu.render.brdf import env_brdf

    has = gb.depth >= F32_EPSILON
    surface = retrieve_surface(scene, gb.material, gb.velocity_uv[..., 2:4])
    view = calculate_view(camera.position, gb.position[..., :3])
    albedo = env_brdf(view, gb.normal, surface)
    return jnp.where(has[..., None], albedo, 0.0)


# ---------------------------------------------------------------------------
# direct_lit (sun + emissive variants)
# ---------------------------------------------------------------------------


def direct_lit_pass(
    scene: SceneBuffers,
    camera: Camera,
    gbuffer: GBuffer,
    temporal: Reservoir,
    de_spatial_prev: Reservoir,
    noise_bank,
    frame_number,
    settings: RenderSettings,
    emissive_lit: bool,
    render_emissive: bool,
    reproject: str = "adaptive",
):
    """One temporal lighting channel (reference ``direct_lit``,
    light.wgsl:1044-1261). ``emissive_lit`` selects the EMISSIVE_LIT
    shader-def variant; ``render_emissive`` adds surface self-emission to
    the output (RENDER_EMISSIVE).

    Returns (radiance (rh,rw,3), variance (rh,rw), new temporal reservoir,
    updated shared spatial-previous reservoir, background mask)."""
    render_size = settings.render_size
    deferred_size = settings.output_size
    ratio = settings.upscale_ratio
    rh, rw = render_size

    # Intra-channel profiling stop points (tools/profile_prefix.py):
    # settings.stop_after = "<chan>:<stage>" truncates this channel right
    # after <stage>, reducing everything computed so far into the outputs
    # (sum-coupled, nothing DCE'd) so consecutive-prefix deltas attribute
    # cost INSIDE the channel. stages: fetch, reproject, candidate, trace,
    # restir.
    _chan = "emissive" if emissive_lit else "direct"
    _stop = settings.stop_after or ""

    def _stopped(stage):
        return _stop == f"{_chan}:{stage}"

    def _trunc(*trees):
        # Non-finite sentinels (inf max_distance on sun candidates) are
        # zeroed so the coupling scalar stays finite.
        def _safe(v):
            vf = v.astype(jnp.float32)
            vf = jnp.where(jnp.isfinite(vf), vf, 0.0)
            return jnp.sum(jnp.clip(vf, -1e6, 1e6))

        acc = sum(
            _safe(v)
            for t in trees
            for v in jax.tree_util.tree_leaves(t)
            if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating)
        )
        out3 = jnp.zeros((rh, rw, 3)) + acc
        var = jnp.zeros((rh, rw)) + acc
        bgd = jnp.zeros((rh, rw), dtype=bool)
        return out3, var, temporal, de_spatial_prev, bgd, temporal

    ys, xs = render_coords(render_size)
    uv = jnp.stack(
        [(xs.astype(jnp.float32) + 0.5) / rw, (ys.astype(jnp.float32) + 0.5) / rh],
        axis=-1,
    )
    duv = jittered_deferred_uv(uv, frame_number, deferred_size, ratio)
    g = fetch_gbuffer_deferred(gbuffer, frame_number, settings)

    depth = g.position[..., 3]
    background = depth < F32_EPSILON
    position = g.position[..., :3]
    normal = g.normal

    rand = channel_random(noise_bank, frame_number, render_size)
    if _stopped("fetch"):
        return _trunc(g, rand, duv)
    s = Sample(
        radiance=jnp.zeros((rh, rw, 4)),
        random=rand,
        visible_position=jnp.concatenate([position, depth[..., None]], axis=-1),
        visible_normal=normal,
        visible_instance=g.instance,
        sample_position=jnp.zeros((rh, rw, 4)),
        sample_normal=jnp.zeros((rh, rw, 3)),
    )

    # Temporal reprojection + geometric validation.
    previous_uv = duv - g.velocity_uv[..., :2]
    r = load_previous_reservoir(temporal, previous_uv, render_size, reproject)
    r, reproj_ok = check_previous_reservoir(r, s)
    de_spatial_prev = scatter_invalidate(
        de_spatial_prev, previous_uv, ~reproj_ok, render_size, reproject
    )
    if _stopped("reproject"):
        return _trunc(g, rand, r, de_spatial_prev)
    if _stopped("candidate") or _stopped("trace"):
        # Profile the sampling machinery outside the validation lax.cond.
        candidate, info = select_light_candidate(
            scene, s.random, s.visible_position[..., :3], s.visible_normal,
            g.instance, settings.solar_angle, sample_emissive=emissive_lit,
            trace_method=settings.tracer,
        )
        if _stopped("candidate"):
            return _trunc(g, r, candidate, info)
        hit = trace_rays(
            scene, position + normal * RAY_BIAS, candidate.direction,
            max_distance=candidate.max_distance,
            early_distance=candidate.min_distance,
            exclude_instance=candidate.emissive_instance,
            method=settings.tracer,
            bruteforce_max_tris=settings.bruteforce_max_tris,
            max_steps=settings.max_traversal_steps,
        )
        return _trunc(g, r, candidate, info, hit)

    validate_interval = (
        settings.emissive_validate_interval
        if emissive_lit
        else settings.direct_validate_interval
    )
    is_validation_frame = (frame_number % validate_interval) == 0

    trace_kw = dict(
        method=settings.tracer,
        bruteforce_max_tris=settings.bruteforce_max_tris,
        max_steps=settings.max_traversal_steps,
    )

    def shadow_trace(ray_origin, ray_dir, candidate, trace_condition, info):
        """Trace the shadow ray + classify radiance (masked)."""
        hit = trace_rays(
            scene,
            ray_origin,
            ray_dir,
            max_distance=candidate.max_distance,
            early_distance=candidate.min_distance,
            exclude_instance=candidate.emissive_instance,
            **trace_kw,
        )
        info2 = occlude_hit_info(ray_origin, ray_dir, hit, info)
        if emissive_lit:
            rad = input_radiance(
                scene, ray_dir, info2, False, candidate.emissive_instance, False,
                settings.solar_angle,
            )
        else:
            rad = input_radiance(
                scene, ray_dir, info2,
                True, jnp.full(trace_condition.shape, NO_EMISSIVE, jnp.int32), False,
                settings.solar_angle,
            )
        rad = jnp.where(trace_condition[..., None], rad, 0.0)
        return rad, info2

    import os as _os_probe

    _detach_candidate = bool(
        _os_probe.environ.get("HIKARI_PROBE_DETACH_CANDIDATE")
    )

    def sampling_branch(r_in, take_mask):
        """New-candidate sampling + temporal ReSTIR (light.wgsl:1108-1153).
        ``take_mask``: pixels whose reservoir actually takes the update."""
        candidate, info = select_light_candidate(
            scene,
            s.random,
            s.visible_position[..., :3],
            s.visible_normal,
            g.instance,
            settings.solar_angle,
            sample_emissive=emissive_lit,
            trace_method=settings.tracer,
        )
        if _detach_candidate:  # measurement probe only — changes gradients
            candidate, info = jax.lax.stop_gradient((candidate, info))
        ray_origin = position + normal * RAY_BIAS
        ray_dir = candidate.direction
        cond_ = (dot3(ray_dir, normal) > 0.0) & (candidate.p > 0.0)
        if emissive_lit:
            cond_ = cond_ & (candidate.emissive_instance != NO_EMISSIVE)
        rad, info2 = shadow_trace(ray_origin, ray_dir, candidate, cond_, info)

        s2 = replace(
            s,
            radiance=rad,
            sample_position=info2.position,
            sample_normal=info2.normal,
        )
        # stable_div: exact 1/pdf backward without the 1/pdf^2 transient
        # overflow (diff.stable_div), replacing the old cotangent clip.
        from hikari_tpu.diff import stable_div

        w_new = jnp.where(
            candidate.p > 0.0,
            stable_div(
                luminance(s2.radiance[..., :3]),
                jnp.maximum(candidate.p, 1e-12),
            ),
            0.0,
        )
        return temporal_restir(
            r_in, s2, w_new, settings.max_temporal_reuse_count, mask=take_mask
        )

    def validation_branch(r_in, sp_prev):
        """Re-trace the reservoir's retained sample and reset on luminance
        mismatch (light.wgsl:1156-1214)."""
        low_count = r_in.count < DIRECT_VALIDATION_FRAME_SAMPLE_THRESHOLD
        r1 = sampling_branch(r_in, low_count)

        candidate, info = select_light_candidate(
            scene,
            r1.s.random,
            r1.s.visible_position[..., :3],
            r1.s.visible_normal,
            g.instance,
            settings.solar_angle,
            sample_emissive=emissive_lit,
            trace_method=settings.tracer,
        )
        ray_origin = s.visible_position[..., :3] + s.visible_normal * RAY_BIAS
        ray_dir = safe_normalize(
            r1.s.sample_position[..., :3] - s.visible_position[..., :3]
        )
        cond_ = (dot3(candidate.direction, r1.s.visible_normal) > 0.0) & (
            candidate.p > 0.0
        )
        if emissive_lit:
            cond_ = cond_ & (candidate.emissive_instance != NO_EMISSIVE)
        validate_rad, info2 = shadow_trace(ray_origin, ray_dir, candidate, cond_, info)

        # High-count pixels adopt the validation ray as this frame's sample.
        high = ~low_count
        s_val = replace(
            s,
            random=r1.s.random,
            radiance=validate_rad,
            sample_position=info2.position,
            sample_normal=info2.normal,
        )

        lum_ratio = luminance(validate_rad[..., :3]) / jnp.maximum(
            luminance(r1.s.radiance[..., :3]), 0.0001
        )
        lum_miss = (lum_ratio > 1.25) | (lum_ratio < 0.8)

        sp_prev2 = scatter_invalidate(
            sp_prev, previous_uv, lum_miss, render_size, reproject
        )

        s_new = s_val.select(high, replace(s, random=r1.s.random))
        from hikari_tpu.diff import stable_div

        w_new = jnp.where(
            candidate.p > 0.0,
            stable_div(
                luminance(s_new.radiance[..., :3]),
                jnp.maximum(candidate.p, 1e-12),
            ),
            0.0,
        )
        r_reset = set_reservoir(s_new, w_new)
        r2 = r_reset.select(lum_miss, r1)
        return r2, sp_prev2

    import os as _os

    if _os.environ.get("HIKARI_DEBUG_BOTH_BRANCHES"):
        # Debug path: execute both branches and mask-select, so
        # jax_debug_nans can pinpoint primitives that lax.cond hides.
        r_v, sp_v = validation_branch(r, de_spatial_prev)
        r_s = sampling_branch(r, jnp.ones((rh, rw), dtype=bool))
        vmask = jnp.broadcast_to(is_validation_frame, (rh, rw))
        r_sampled = r_v.select(vmask, r_s)
        sp_after = jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                jnp.reshape(is_validation_frame, (1,) * a.ndim), a, b
            ),
            sp_v,
            de_spatial_prev,
        )
    else:
        val_fn = validation_branch
        samp_fn = sampling_branch
        if settings.channel_remat:
            # Estimator-chain remat (config.py channel_remat): each
            # branch recomputes its candidate->stable_div->temporal_restir
            # chain in the backward sweep from the branch inputs + the
            # named trace hits, instead of lax.cond materializing the
            # residual UNION of both branches every frame. jax.checkpoint
            # lifts closed-over tracers (s, g, scene) into the jaxpr and
            # differentiates them correctly.
            _pol = jax.checkpoint_policies.save_only_these_names(
                "trace_hits", "packed_rows"
            )
            val_fn = jax.checkpoint(validation_branch, policy=_pol)
            samp_fn = jax.checkpoint(sampling_branch, policy=_pol)
        r_sampled, sp_after = jax.lax.cond(
            is_validation_frame,
            lambda rr, sp: val_fn(rr, sp),
            lambda rr, sp: (samp_fn(rr, jnp.ones((rh, rw), dtype=bool)), sp),
            r,
            de_spatial_prev,
        )
    r = r_sampled
    if _stopped("restir"):
        return _trunc(g, r, sp_after)

    # Finalize W, refresh visible surface, lifetime++ (light.wgsl:1216-1227).
    r = finalize_w(r, luminance(r.s.radiance[..., :3]))
    r = replace(
        r,
        s=replace(
            r.s, visible_position=s.visible_position, visible_normal=s.visible_normal
        ),
        lifetime=r.lifetime + 1.0,
    )
    variance = reservoir_variance(r, MAX_VARIANCE)

    # Background pixels reset everything (light.wgsl:1058-1069).
    empty = set_reservoir(Sample.zeros((rh, rw)), jnp.zeros((rh, rw)))
    r = empty.select(background, r)
    variance = jnp.where(background, 0.0, variance)

    # Shade (light.wgsl:1233-1259).
    surface = retrieve_surface(scene, g.material, g.velocity_uv[..., 2:4])
    view = calculate_view(camera.position, position)
    out_radiance = shading(
        view,
        r.s.visible_normal,
        safe_normalize(r.s.sample_position[..., :3] - r.s.visible_position[..., :3]),
        surface,
        r.s.radiance,
        scene.ambient_color,
    )
    out = out_radiance * r.w[..., None]
    if render_emissive:
        out = out + compute_emissive_radiance(surface.emissive)
    out = jnp.where(background[..., None], 0.0, out)

    new_temporal = r if settings.temporal_reuse else temporal
    return out, variance, new_temporal, sp_after, background, r


# ---------------------------------------------------------------------------
# indirect_lit_ambient (light.wgsl:1263-1498)
# ---------------------------------------------------------------------------


def indirect_lit_pass(
    scene: SceneBuffers,
    camera: Camera,
    gbuffer: GBuffer,
    temporal: Reservoir,
    spatial_prev: Reservoir,
    noise_bank,
    frame_number,
    settings: RenderSettings,
    reproject: str = "adaptive",
):
    """Indirect diffuse channel with 1..N cosine-hemisphere bounces and NEE
    at each bounce (reference ``indirect_lit_ambient``)."""
    render_size = settings.render_size
    deferred_size = settings.output_size
    ratio = settings.upscale_ratio
    rh, rw = render_size

    ys, xs = render_coords(render_size)
    uv = jnp.stack(
        [(xs.astype(jnp.float32) + 0.5) / rw, (ys.astype(jnp.float32) + 0.5) / rh],
        axis=-1,
    )
    duv = jittered_deferred_uv(uv, frame_number, deferred_size, ratio)
    g = fetch_gbuffer_deferred(gbuffer, frame_number, settings)

    depth = g.position[..., 3]
    background = depth < F32_EPSILON
    position = g.position[..., :3]
    normal = safe_normalize(jnp.where(background[..., None], 1.0, g.normal))

    rand = channel_random(noise_bank, frame_number, render_size)
    s = Sample(
        radiance=jnp.zeros((rh, rw, 4)),
        random=rand,
        visible_position=jnp.concatenate([position, depth[..., None]], axis=-1),
        visible_normal=g.normal,
        visible_instance=g.instance,
        sample_position=jnp.zeros((rh, rw, 4)),
        sample_normal=jnp.zeros((rh, rw, 3)),
    )

    # Intra-channel profiling stops (tools/profile_prefix.py), mirroring
    # direct_lit_pass: indirect:fetch / :bounce / :nee / :restir.
    _stop = settings.stop_after or ""

    def _stopped(stage):
        return _stop == f"indirect:{stage}"

    def _trunc(*trees):
        def _safe(v):
            vf = v.astype(jnp.float32)
            vf = jnp.where(jnp.isfinite(vf), vf, 0.0)
            return jnp.sum(jnp.clip(vf, -1e6, 1e6))

        acc = sum(
            _safe(v)
            for t in trees
            for v in jax.tree_util.tree_leaves(t)
            if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating)
        )
        out3 = jnp.zeros((rh, rw, 3)) + acc
        var = jnp.zeros((rh, rw)) + acc
        bgd = jnp.zeros((rh, rw), dtype=bool)
        return out3, var, temporal, spatial_prev, bgd, temporal

    if _stopped("fetch"):
        return _trunc(g, rand)

    trace_kw = dict(
        method=settings.tracer,
        bruteforce_max_tris=settings.bruteforce_max_tris,
        max_steps=settings.max_traversal_steps,
    )

    bounces = max(settings.indirect_bounces, 1)
    accum = jnp.zeros((rh, rw, 4))
    color_transport = jnp.ones((rh, rw, 3))
    bounce_pos = position
    bounce_normal = normal
    bounce_rand = rand
    alive = ~background
    first_pdf = jnp.zeros((rh, rw))
    first_sample_position = jnp.zeros((rh, rw, 4))
    first_sample_normal = jnp.zeros((rh, rw, 3))

    for n in range(bounces):
        local, pdf = sample_cosine_hemisphere(bounce_rand[..., 0:2])
        basis = normal_basis(bounce_normal)
        ray_dir = jnp.einsum("...ij,...j->...i", basis, local)
        ray_origin = bounce_pos + bounce_normal * RAY_BIAS
        hit = trace_rays(scene, ray_origin, ray_dir, **trace_kw)
        info = hit_info(scene, ray_origin, ray_dir, hit)
        if _stopped("bounce"):
            return _trunc(g, hit, info)

        if n == 0:
            first_pdf = pdf
            first_sample_position = info.position
            first_sample_normal = info.normal

        hit_ok = (hit.prim >= 0) & alive

        # NEE at the bounce point (light.wgsl:1338-1379).
        surface_b = retrieve_surface(scene, info.material, info.uv)
        surface_b = surface_b.replace_roughness(jnp.ones((rh, rw)))
        candidate, cinfo = select_light_candidate(
            scene,
            bounce_rand,
            info.position[..., :3],
            info.normal,
            hit.inst,
            settings.solar_angle,
            sample_emissive=scene.num_emissives > 0,
            trace_method=settings.tracer,
        )
        # Secondary-vertex NEE geometry is detached: its pdf/position chain
        # couples 1/d^2 x 1/cos x 1/det terms whose float32 backward
        # overflows for grazing configurations; gradients keep flowing
        # through the (dominant) primary-surface shading and radiometry.
        candidate, cinfo = jax.lax.stop_gradient((candidate, cinfo))
        sample_directional = candidate.emissive_instance == NO_EMISSIVE
        nee_cond = (dot3(candidate.direction, info.normal) > 0.0) & (
            candidate.p > 0.0
        ) & hit_ok

        nee_origin = info.position[..., :3] + info.normal * RAY_BIAS
        nee_hit = trace_rays(
            scene,
            nee_origin,
            candidate.direction,
            max_distance=candidate.max_distance,
            early_distance=candidate.min_distance,
            exclude_instance=candidate.emissive_instance,
            **trace_kw,
        )
        cinfo2 = occlude_hit_info(nee_origin, candidate.direction, nee_hit, cinfo)
        if _stopped("nee"):
            return _trunc(g, hit, info, candidate, cinfo2)
        in_rad = input_radiance(
            scene,
            candidate.direction,
            cinfo2,
            sample_directional,
            candidate.emissive_instance,
            False,
            settings.solar_angle,
        )
        bounce_view = safe_normalize(bounce_pos - info.position[..., :3])
        out_rad = shading(
            bounce_view,
            info.normal,
            candidate.direction,
            surface_b,
            in_rad,
            scene.ambient_color,
        )
        from hikari_tpu.diff import stable_div

        out_rad = stable_div(
            out_rad, jnp.maximum(candidate.p[..., None], 1e-12)
        )
        if n > 0:
            out_rad = jnp.where(
                (pdf < 0.01)[..., None],
                0.0,
                stable_div(out_rad, jnp.maximum(pdf[..., None], 1e-6))
            )
        # Firefly clamp (light.wgsl:1372-1376).
        out_lum = luminance(out_rad)
        scale = jnp.where(
            out_lum > settings.max_indirect_luminance,
            settings.max_indirect_luminance / jnp.maximum(out_lum, 1e-8),
            1.0,
        )
        out_rad = out_rad * scale[..., None]
        contrib_rgb = jnp.where(nee_cond[..., None], color_transport * out_rad, 0.0)
        contrib_a = jnp.where(nee_cond, 1.0, 0.0)
        accum = accum + jnp.concatenate(
            [contrib_rgb, contrib_a[..., None]], axis=-1
        )

        # Miss -> ambient via color transport, alpha += 0
        # (light.wgsl:1388-1393).
        miss_now = (hit.prim < 0) & alive
        amb = input_radiance(
            scene,
            ray_dir,
            info,
            False,
            jnp.full((rh, rw), NO_EMISSIVE, jnp.int32),
            True,
            settings.solar_angle,
        )[..., :3]
        amb_rgb = jnp.where(miss_now[..., None], color_transport * amb, 0.0)
        accum = accum + jnp.concatenate(
            [amb_rgb, jnp.zeros((rh, rw, 1))], axis=-1
        )

        # Throughput update + next bounce state (light.wgsl:1381-1387).
        from hikari_tpu.render.brdf import env_brdf

        transport = env_brdf(bounce_view, info.normal, surface_b)
        color_transport = jnp.where(
            hit_ok[..., None], color_transport * transport, color_transport
        )
        alive = hit_ok & jnp.any(color_transport > 0.01, axis=-1)
        bounce_rand = fract(
            bounce_rand + frame_number.astype(jnp.float32) * GOLDEN_RATIO
        )
        bounce_pos = info.position[..., :3]
        bounce_normal = info.normal

    s = replace(
        s,
        radiance=accum,
        sample_position=first_sample_position,
        sample_normal=first_sample_normal,
    )

    # Temporal ReSTIR (light.wgsl:1452-1471) — target pdf is the luminance
    # of the *shaded* radiance at the primary surface.
    previous_uv = duv - g.velocity_uv[..., :2]
    r = load_previous_reservoir(temporal, previous_uv, render_size, reproject)
    r, reproj_ok = check_previous_reservoir(r, s)
    spatial_prev = scatter_invalidate(
        spatial_prev, previous_uv, ~reproj_ok, render_size, reproject
    )

    surface = retrieve_surface(scene, g.material, g.velocity_uv[..., 2:4])
    view = calculate_view(camera.position, position)
    sample_shaded = shading(
        view,
        s.visible_normal,
        safe_normalize(s.sample_position[..., :3] - s.visible_position[..., :3]),
        surface,
        s.radiance,
        scene.ambient_color,
    )
    from hikari_tpu.diff import stable_div

    w_new = jnp.where(
        first_pdf > 0.0,
        stable_div(luminance(sample_shaded), jnp.maximum(first_pdf, 1e-12)),
        0.0,
    )
    r = temporal_restir(r, s, w_new, settings.max_temporal_reuse_count)
    if _stopped("restir"):
        return _trunc(g, r, spatial_prev)

    out_radiance = shading(
        view,
        r.s.visible_normal,
        safe_normalize(r.s.sample_position[..., :3] - r.s.visible_position[..., :3]),
        surface,
        r.s.radiance,
        scene.ambient_color,
    )
    r = finalize_w(r, luminance(out_radiance))
    r = replace(
        r,
        s=replace(
            r.s, visible_position=s.visible_position, visible_normal=s.visible_normal
        ),
        lifetime=r.lifetime + 1.0,
    )
    variance = reservoir_variance(r, MAX_VARIANCE)

    empty = Reservoir.zeros((rh, rw))
    r = empty.select(background, r)
    variance = jnp.where(background, 0.0, variance)
    out = jnp.where(
        background[..., None], 0.0, out_radiance * r.w[..., None]
    )

    new_temporal = r if settings.temporal_reuse else temporal
    return out, variance, new_temporal, spatial_prev, background, r

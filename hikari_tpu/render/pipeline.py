"""The frame pipeline: one pure jitted function per frame.

Replaces the reference's render graph
PREPASS -> LIGHT -> POST_PROCESS -> OVERLAY (src/lib.rs:332-365) and the
node encoders (PrepassNode src/prepass.rs:769, LightNode src/light.rs:590,
PostProcessNode src/post_process.rs:1140, OverlayNode src/overlay.rs:342)
with explicit function composition over pytrees:

    outputs, state' = render_frame(scene, camera, state, settings)

``settings`` is a static argument — each distinct value compiles its own
XLA executable, exactly like the reference's specialized pipeline cache.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from hikari_tpu.config import RenderSettings, Taa, UpscaleMode
from hikari_tpu.render.camera import Camera
from hikari_tpu.render.denoise import denoise_channel
from hikari_tpu.render.filters import nearest_sample
from hikari_tpu.render.gbuffer import render_gbuffer
from hikari_tpu.render.light import (
    direct_lit_pass,
    full_screen_albedo,
    indirect_lit_pass,
    jittered_deferred_uv,
    render_coords,
)
from hikari_tpu.render.noise import blue_noise_bank
from hikari_tpu.render.smaa import smaa_tu4x
from hikari_tpu.render.spatial import spatial_reuse_pass
from hikari_tpu.render.taa import taa_jasmine
from hikari_tpu.render.tonemap import tone_mapping
from hikari_tpu.render.types import FrameState, GBuffer, RenderOutputs
from hikari_tpu.scene.buffers import SceneBuffers


def _albedo_at_render_res(albedo, gbuffer, settings, frame_number):
    """Nearest-sample the full-res albedo at each render pixel's jittered
    deferred uv (denoise.wgsl:148-150). Integer ratios take the strided
    slice (render/light.py strided_deferred_plane) instead of a gather."""
    from hikari_tpu.render.light import _deferred_phase, strided_deferred_plane

    ratio = settings.upscale_ratio
    if float(ratio).is_integer():
        c = _deferred_phase(frame_number, int(ratio), 0.5)
        return strided_deferred_plane(albedo, c, int(ratio), settings.render_size)
    rh, rw = settings.render_size
    ys, xs = render_coords(settings.render_size)
    uv = jnp.stack(
        [(xs.astype(jnp.float32) + 0.5) / rw, (ys.astype(jnp.float32) + 0.5) / rh],
        axis=-1,
    )
    duv = jittered_deferred_uv(
        uv, frame_number, settings.output_size, settings.upscale_ratio, amount=0.5
    )
    return nearest_sample(albedo, duv)


def render_frame(
    scene: SceneBuffers,
    camera: Camera,
    state: FrameState,
    settings: RenderSettings,
    noise_bank=None,
    denoise_fn=None,
):
    """Render one frame. Returns (RenderOutputs, FrameState).

    ``denoise_fn``: optional replacement channel denoiser with the
    signature of render/denoise.denoise_channel — used by the sharded
    pipeline to swap in the manual-halo-exchange denoiser
    (parallel/halo.denoise_channel_sharded)."""
    if noise_bank is None:
        noise_bank = jnp.asarray(blue_noise_bank())
    frame_number = state.frame_number
    state_in = state

    def _truncate(*trees):
        """settings.stop_after support (tools/profile_prefix.py): reduce
        everything computed so far into a tiny dummy output (nothing is
        DCE'd) and carry the input state forward unchanged."""
        leaves = [
            jnp.sum(v.astype(jnp.float32))
            for t in trees
            for v in jax.tree_util.tree_leaves(t)
            if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating)
        ]
        img = jnp.full((4, 4, 4), sum(leaves))
        out = RenderOutputs(
            image=img, albedo=img, direct=img, emissive=img,
            indirect=img, tonemapped=img, stats=None,
        )
        st = FrameState(
            **{
                **{
                    f: getattr(state_in, f)
                    for f in state_in.__dataclass_fields__
                },
                "frame_number": frame_number + 1,
            }
        )
        return out, st

    # Pass-level rematerialization: under jax.grad each pass recomputes
    # its forward in the backward sweep instead of saving every
    # intermediate (HBM residuals at 1080p otherwise exceed chip memory).
    # Hit records are tagged (trace/api.py) and stay saved so the backward
    # sweep never replays the ray search itself.
    _policy = jax.checkpoint_policies.save_only_these_names(
        "trace_hits", "packed_rows"
    )

    def ckpt(fn, name="pass"):
        fn2 = jax.checkpoint(fn, policy=_policy) if settings.remat else fn

        def wrapped(*args):
            from hikari_tpu.diff import clip_gradient

            # named_scope labels each pass in HLO/profiles — the analogue
            # of the reference's info_span! tracing (src/prepass.rs:789).
            with jax.named_scope(name):
                out = fn2(*args)
            # Gradient firewall at pass boundaries: scrub NaN and cap
            # cotangents flowing between passes (MC estimator weights
            # produce float32-overflowing local derivatives).
            return jax.tree_util.tree_map(
                lambda x: clip_gradient(x, 1e4, name)
                if jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                out,
            )

        return wrapped

    # Unpack the f16-stored reservoir state to f32 compute precision
    # (render/restir.py compress/decompress; reference PackedReservoir).
    if settings.reservoir_f16:
        from hikari_tpu.render.restir import decompress_reservoir

        state = FrameState(
            **{
                **{f: getattr(state, f) for f in state.__dataclass_fields__},
                **{
                    k: decompress_reservoir(getattr(state, k))
                    for k in (
                        "direct_temporal",
                        "emissive_temporal",
                        "indirect_temporal",
                        "de_spatial",
                        "indirect_spatial",
                    )
                },
            }
        )

    # ---- PREPASS (G-buffer by primary rays) ----
    gbuffer = ckpt(
        lambda sc: render_gbuffer(sc, camera, frame_number, settings),
        "prepass",
    )(scene)

    if settings.stop_after == "gbuffer" or (
        settings.stop_after or ""
    ).startswith("gbuffer:"):
        return _truncate(gbuffer)

    # ---- ONE frame-level reprojection dispatch ----
    # When the G-buffer velocity field is exactly zero (static camera +
    # static scene at steady state — the realtime common case, and
    # bitwise reachable since gbuffer.py snaps static instance transforms
    # to the exact identity), EVERY reprojected fetch in the frame is the
    # identity map: reservoir reprojection/invalidation, the TAA window
    # and the SMAA quad-phase window all collapse to static shifts. One
    # lax.cond here picks between two statically specialized frame
    # remainders ("shift" vs "gather"); per-pass conds measured ~11 ms
    # each in lost fusion (~10 conds/frame), while the bodies themselves
    # cost ~0.15 ms under a bare cond — tools/bench_cond.py,
    # docs/ROOFLINE.md round 4.
    from hikari_tpu.render.filters import reproject_mode as _rmode

    _req = _rmode(settings.reproject)
    if _req != "adaptive":
        return _frame_rest(
            _req, scene, camera, state, settings, noise_bank, denoise_fn,
            gbuffer, ckpt, _truncate,
        )
    static_frame = jnp.all(gbuffer.velocity_uv[..., :2] == 0.0)
    return jax.lax.cond(
        static_frame,
        lambda _: _frame_rest(
            "shift", scene, camera, state, settings, noise_bank, denoise_fn,
            gbuffer, ckpt, _truncate,
        ),
        lambda _: _frame_rest(
            "gather", scene, camera, state, settings, noise_bank, denoise_fn,
            gbuffer, ckpt, _truncate,
        ),
        0,
    )


def _frame_rest(
    reproject, scene, camera, state, settings, noise_bank, denoise_fn,
    gbuffer, ckpt, _truncate,
):
    """Everything after the G-buffer, with the reprojection transport
    chosen STATICALLY ("shift" | "gather") — the two branches of
    render_frame's single frame-level lax.cond (or the host-level static
    hint, config.py RenderSettings.reproject)."""
    frame_number = state.frame_number

    # Per-pass transport A/B (tools/ab_bench.py): at zero velocity BOTH
    # transports are exact, so the fastest one can be chosen per pass.
    # HIKARI_REPROJECT_{LIGHT,SMAA,TAA} override the frame-level choice
    # for measurement; the shipped per-pass policy is set from the
    # measured matrix (see the reproject commit trail).
    import os as _os

    def _rp(name):
        return _os.environ.get(f"HIKARI_REPROJECT_{name.upper()}", reproject)

    rp_light, rp_smaa, rp_taa = _rp("light"), _rp("smaa"), _rp("taa")
    if rp_smaa == "shift" and "HIKARI_REPROJECT_SMAA" not in _os.environ:
        # The "shift" static hint picks each pass's measured-FASTEST exact
        # transport, not uniformly the shift one: at zero velocity the two
        # transports are bitwise-identical per pass, and the r5 ab_bench
        # matrix (1080p cornell fwd+grad, driver chip) splits them —
        #   gather everywhere 560.6 | light=shift 516.3 | taa=shift 494.4
        #   | smaa=shift 691.5 (!) | light+taa=shift 464.0.
        # SMAA's quad-phase shift taps lose ~130 ms to its packed
        # identity-gather; light reservoirs + TAA win on shift. So the
        # hint maps to light/taa=shift + smaa=gather.
        rp_smaa = "gather"

    # ---- LIGHT ----
    albedo = ckpt(
        lambda sc: full_screen_albedo(sc, camera, gbuffer), "albedo"
    )(scene)

    if settings.stop_after == "albedo":
        return _truncate(gbuffer, albedo)

    de_spatial = state.de_spatial
    direct_out, direct_var, direct_temporal, de_spatial, bg, _ = ckpt(
        lambda sc, temporal, sp: direct_lit_pass(
            sc,
            camera,
            gbuffer,
            temporal,
            sp,
            noise_bank,
            frame_number,
            settings,
            emissive_lit=False,
            render_emissive=True,
            reproject=rp_light,
        ),
        "direct_lit",
    )(scene, state.direct_temporal, de_spatial)

    if settings.stop_after == "direct" or (
        settings.stop_after or ""
    ).startswith("direct:"):
        return _truncate(gbuffer, albedo, direct_out, direct_var, de_spatial)

    if settings.emissive_lit and scene.num_emissives > 0:
        em_out, em_var, em_temporal, de_spatial, _, _ = ckpt(
            lambda sc, temporal, sp: direct_lit_pass(
                sc,
                camera,
                gbuffer,
                temporal,
                sp,
                noise_bank,
                frame_number,
                settings,
                emissive_lit=True,
                render_emissive=False,
            ),
            "emissive_lit",
        )(scene, state.emissive_temporal, de_spatial)
        # "emissive:*" = stop after the emissive temporal pass (the
        # intra-pass stop is consumed inside direct_lit_pass), BEFORE
        # spatial reuse; plain "emissive" stops after spatial (below).
        # Same buffer set as the later truncation so profile deltas
        # subtract cleanly.
        if (settings.stop_after or "").startswith("emissive:"):
            return _truncate(
                gbuffer, albedo, direct_out, em_out, em_var, de_spatial
            )
        if settings.emissive_spatial_reuse:
            em_out, em_var, de_spatial = ckpt(
                lambda sc, temporal, sp, var: spatial_reuse_pass(
                    sc,
                    camera,
                    gbuffer,
                    temporal,
                    sp,
                    var,
                    frame_number,
                    settings,
                    emissive_lit=True,
                    reproject=rp_light,
                ),
                "emissive_spatial",
            )(scene, em_temporal, de_spatial, em_var)
    else:
        rh, rw = settings.render_size
        em_out = jnp.zeros((rh, rw, 3))
        em_var = jnp.zeros((rh, rw))
        em_temporal = state.emissive_temporal

    if settings.stop_after == "emissive":
        return _truncate(
            gbuffer, albedo, direct_out, em_out, em_var, de_spatial
        )

    indirect_spatial = state.indirect_spatial
    if settings.indirect_bounces > 0:
        (
            ind_out,
            ind_var,
            ind_temporal,
            indirect_spatial,
            _,
            _,
        ) = ckpt(
            lambda sc, temporal, sp: indirect_lit_pass(
                sc,
                camera,
                gbuffer,
                temporal,
                sp,
                noise_bank,
                frame_number,
                settings,
                reproject=rp_light,
            ),
            "indirect_lit",
        )(scene, state.indirect_temporal, indirect_spatial)
        if (settings.stop_after or "").startswith("indirect:"):
            # Intra-channel profiling stop: skip spatial reuse so the
            # prefix delta attributes to the channel interior only.
            return _truncate(gbuffer, albedo, direct_out, em_out, ind_out)
        if settings.indirect_spatial_reuse:
            ind_out, ind_var, indirect_spatial = ckpt(
                lambda sc, temporal, sp, var: spatial_reuse_pass(
                    sc,
                    camera,
                    gbuffer,
                    temporal,
                    sp,
                    var,
                    frame_number,
                    settings,
                    emissive_lit=False,
                    reproject=rp_light,
                ),
                "indirect_spatial",
            )(scene, ind_temporal, indirect_spatial, ind_var)
    else:
        rh, rw = settings.render_size
        ind_out = jnp.zeros((rh, rw, 3))
        ind_var = jnp.zeros((rh, rw))
        ind_temporal = state.indirect_temporal

    if settings.stop_after == "indirect" or (
        settings.stop_after or ""
    ).startswith("indirect:"):
        return _truncate(
            gbuffer, albedo, direct_out, em_out, ind_out, ind_var,
            indirect_spatial,
        )

    # ---- POST PROCESS ----
    if settings.denoise and denoise_fn is not None:
        # Custom channel denoiser (e.g. the shard_map manual-halo path):
        # plain loop, no vmap (shard_map under vmap is not supported).
        albedo_rr = _albedo_at_render_res(albedo, gbuffer, settings, frame_number)
        dn = ckpt(
            lambda rad, var: denoise_fn(
                rad, var, albedo_rr, gbuffer, frame_number, settings
            ),
            "denoise",
        )
        direct_d = dn(direct_out, direct_var)
        em_d = dn(em_out, em_var)
        ind_d = dn(ind_out, ind_var)
    elif settings.denoise:
        albedo_rr = _albedo_at_render_res(albedo, gbuffer, settings, frame_number)
        # vmap the 3 lighting channels through one denoiser graph (the
        # reference dispatches the same pipeline 3x, post_process.rs:1190).
        denoise3 = jax.vmap(
            lambda rad, var: denoise_channel(
                rad, var, albedo_rr, gbuffer, frame_number, settings
            )
        )
        stacked = ckpt(denoise3, "denoise")(
            jnp.stack([direct_out, em_out, ind_out]),
            jnp.stack([direct_var, em_var, ind_var]),
        )
        direct_d, em_d, ind_d = stacked[0], stacked[1], stacked[2]
    else:
        direct_d, em_d, ind_d = direct_out, em_out, ind_out

    if settings.stop_after == "denoise":
        return _truncate(gbuffer, albedo, direct_d, em_d, ind_d)

    fg = (~bg).astype(jnp.float32)[..., None]

    def with_alpha(rgb):
        return jnp.concatenate([rgb, fg], axis=-1)

    # Post-chain gradient firewalls: without them, non-finite/overflowing
    # cotangents born in the SMAA/TAA backward (e.g. the extrapolate
    # blend's 1/(fx+fy) weights) flow unfiltered down to the denoise pass
    # boundary and get COUNTED (and clipped) there, mis-attributing the
    # engagement (round-3 "denoise 4.8%" — tools/clip_engagement.py).
    from hikari_tpu.diff import clip_gradient as _cg

    tonemapped = tone_mapping(
        with_alpha(direct_d),
        with_alpha(em_d) * fg,
        with_alpha(ind_d) * fg,
        settings.clear_color,
    )
    tonemapped = _cg(tonemapped, 1e4, "tonemap")

    if settings.stop_after == "tonemap":
        return _truncate(gbuffer, albedo, tonemapped)

    current = tonemapped
    prev_upscaled = state.prev_upscaled
    _stop = settings.stop_after or ""
    if settings.upscale.mode == UpscaleMode.SMAA_TU4X:
        current = smaa_tu4x(
            current, state.prev_upscaled, gbuffer, state.prev_gbuffer,
            frame_number,
            stop=_stop.split(":", 1)[1] if _stop.startswith("smaa:") else None,
            reproject=rp_smaa,
        )
        current = _cg(current, 1e4, "smaa")
        prev_upscaled = current

    if settings.stop_after == "smaa" or _stop.startswith("smaa:"):
        return _truncate(gbuffer, albedo, current)

    prev_taa = state.prev_taa
    if settings.taa == Taa.JASMINE:
        current = taa_jasmine(
            current,
            state.prev_taa,
            gbuffer,
            state.prev_gbuffer,
            settings.clear_color,
            settings.upscale_ratio,
            reproject=rp_taa,
        )
        current = _cg(current, 1e4, "taa")
        prev_taa = current

    if settings.stop_after == "taa":
        return _truncate(gbuffer, albedo, current)

    if settings.upscale.mode == UpscaleMode.FSR1:
        from hikari_tpu.render.fsr import fsr_upscale

        current = fsr_upscale(
            current, settings.output_size, settings.upscale.sharpness
        )

    # ---- OVERLAY (NaN -> albedo fallback, src/shaders/overlay.wgsl:42;
    # HDR inverse-Reinhard :27-46) + chained Bloom (src/lib.rs:332-365) ----
    image = current
    if settings.hdr:
        from hikari_tpu.render.tonemap import inverse_reinhard_luminance

        image = jnp.concatenate(
            [inverse_reinhard_luminance(image[..., :3]), image[..., 3:4]],
            axis=-1,
        )
    if settings.bloom:
        from hikari_tpu.render.bloom import bloom as bloom_pass

        image = bloom_pass(
            image, settings.bloom_threshold, settings.bloom_intensity
        )
    if settings.fxaa:
        from hikari_tpu.render.fxaa import fxaa as fxaa_pass

        image = fxaa_pass(image)
    nan_mask = jnp.any(jnp.isnan(image), axis=-1, keepdims=True)
    albedo_out = albedo
    if image.shape[:2] != albedo.shape[:2]:
        from hikari_tpu.utils import uv_grid

        albedo_out = nearest_sample(albedo, uv_grid(image.shape[:2]))
    image = jnp.where(
        nan_mask,
        jnp.concatenate([albedo_out, jnp.ones_like(albedo_out[..., :1])], axis=-1),
        image,
    )

    if settings.reservoir_f16:
        from hikari_tpu.render.restir import compress_reservoir

        direct_temporal = compress_reservoir(direct_temporal)
        em_temporal = compress_reservoir(em_temporal)
        ind_temporal = compress_reservoir(ind_temporal)
        de_spatial = compress_reservoir(de_spatial)
        indirect_spatial = compress_reservoir(indirect_spatial)

    new_state = FrameState(
        frame_number=frame_number + 1,
        prev_gbuffer=gbuffer,
        direct_temporal=direct_temporal,
        emissive_temporal=em_temporal,
        indirect_temporal=ind_temporal,
        de_spatial=de_spatial,
        indirect_spatial=indirect_spatial,
        prev_tonemapped=tonemapped,
        prev_taa=prev_taa,
        prev_upscaled=prev_upscaled,
    )
    stats = None
    if settings.collect_stats:
        from hikari_tpu.utils import luminance as _lum

        stats = {
            "background_fraction": jnp.mean(bg.astype(jnp.float32)),
            "nonfinite_pixels": jnp.sum(nan_mask.astype(jnp.int32)),
            "mean_luminance_direct": jnp.mean(_lum(direct_d)),
            "mean_luminance_emissive": jnp.mean(_lum(em_d)),
            "mean_luminance_indirect": jnp.mean(_lum(ind_d)),
            "mean_temporal_count": jnp.mean(direct_temporal.count),
            "mean_reservoir_lifetime": jnp.mean(direct_temporal.lifetime),
        }

    outputs = RenderOutputs(
        image=image,
        albedo=albedo,
        direct=direct_d,
        emissive=em_d,
        indirect=ind_d,
        tonemapped=tonemapped,
        stats=stats,
    )
    return outputs, new_state


@partial(jax.jit, static_argnames=("settings",))
def render_frame_jit(scene, camera, state, settings):
    return render_frame(scene, camera, state, settings)


def initial_state(settings: RenderSettings) -> FrameState:
    """Allocate the cross-frame state with the correct per-pass shapes."""
    h, w = settings.output_size
    rh, rw = settings.render_size
    taa_hw = (
        (2 * rh, 2 * rw)
        if settings.upscale.mode == UpscaleMode.SMAA_TU4X
        else (rh, rw)
    )
    from hikari_tpu.render.restir import Reservoir, compress_reservoir

    def res():
        r = Reservoir.zeros((rh, rw))
        return compress_reservoir(r) if settings.reservoir_f16 else r

    return FrameState(
        frame_number=jnp.zeros((), dtype=jnp.int32),
        prev_gbuffer=GBuffer.zeros((h, w)),
        direct_temporal=res(),
        emissive_temporal=res(),
        indirect_temporal=res(),
        de_spatial=res(),
        indirect_spatial=res(),
        prev_tonemapped=jnp.zeros((rh, rw, 4)),
        prev_taa=jnp.zeros(taa_hw + (4,)),
        prev_upscaled=jnp.zeros((2 * rh, 2 * rw, 4)),
    )

"""ReSTIR spatial reuse.

jnp equivalent of the reference ``spatial_reuse`` kernel
(src/shaders/light.wgsl:1500-1684): merge the pixel's fresh temporal
reservoir into the (reprojected) running spatial reservoir, then take up to
16 (emissive: 8) neighbor taps on a per-frame-rotated Fibonacci spiral,
rejecting by depth ratio, normal agreement, backface, and screen-space
depth-ray-march occlusion, merging survivors with the GRIS reconnection
Jacobian.

The reference's 8x8 workgroup shared-memory tile
(src/shaders/light.wgsl:1500-1524) is an optimization of the same
gathers. The TPU-fast default here is the roll-based variant path
(``rolled_taps``): K globally-rotated spiral copies make every neighbor
fetch a static shift. A Pallas VMEM-tile analogue was evaluated and
REJECTED on round-4 measurements (tools/bench_pallas_prims.py,
docs/ROOFLINE.md §1): per-pixel-rotated taps need in-kernel 2D gathers,
but Mosaic's tpu.dynamic_gather is limited to single-vreg gather dims
(≤128 lanes — the 20 px spiral radius forces ≤88-wide tiles with a
41-row delta-loop per tap), and measured ~10 Gelem/s marginal with a
~1.7 ms/call floor; a 16-tap × ~25-channel tile kernel prices well above
the whole measured ~30 ms roll-path pass (profile_prefix round 4). The
roll path stays."""

from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp

from hikari_tpu.config import (
    GOLDEN_RATIO,
    MAX_VARIANCE,
    SPATIAL_REUSE_COUNT_DIRECT,
    SPATIAL_REUSE_COUNT_EMISSIVE,
    SPATIAL_REUSE_RANGE_DIRECT,
    SPATIAL_REUSE_RANGE_EMISSIVE,
    SPATIAL_REUSE_TAPS,
    SPATIAL_VARIANCE_SAMPLE_THRESHOLD,
    F32_EPSILON,
    RenderSettings,
)
from hikari_tpu.render.brdf import calculate_view, retrieve_surface, shading
from hikari_tpu.render.camera import Camera
from hikari_tpu.render.light import (
    fetch_gbuffer_deferred,
    gather_reservoir,
    jittered_deferred_uv,
    load_previous_reservoir,
    render_coords,
    uv_to_coords,
)
from hikari_tpu.render.restir import (
    Reservoir,
    clamp_reservoir,
    compute_jacobian,
    merge_reservoir,
    reservoir_variance,
)
from hikari_tpu.render.types import GBuffer
from hikari_tpu.scene.buffers import SceneBuffers
from hikari_tpu.utils import TAU, dot3, fract, luminance, random_float, safe_normalize


def _spatial_unroll() -> bool:
    """Python-unroll the rolled-tap loop with constant indices instead of
    lax.fori_loop. The body is unchanged and only the loop index becomes
    a compile-time constant, so the op sequence is identical; XLA's
    fusion/FMA-formation choices differ between the two graphs, measured
    at maxdiff 5.3e-06 over a 6-frame 64px CPU pipeline (not bitwise —
    same class as any fusion-boundary change). Default: on for TPU
    (bench-level A/B, tools/ab_bench.py, driver chip, 1080p cornell
    fwd+grad: fori_loop 463.4 vs unroll 450.7 ms/frame), off elsewhere —
    the unrolled graph compiles minutes-slower on the CPU backend, which
    would tax the test suite and the multichip dryrun for no win there.
    HIKARI_SPATIAL_UNROLL=0/1 overrides (trace-time env read; A/B cells
    run in subprocesses)."""
    import os

    v = os.environ.get("HIKARI_SPATIAL_UNROLL")
    if v not in (None, ""):
        return bool(int(v))
    return jax.default_backend() == "tpu"


def spatial_reuse_pass(
    scene: SceneBuffers,
    camera: Camera,
    gbuffer: GBuffer,
    temporal: Reservoir,  # this channel's freshly written temporal grid
    spatial_prev: Reservoir,  # previous-frame spatial grid (reprojectable)
    variance_in,  # (rh, rw) variance from the temporal pass
    frame_number,
    settings: RenderSettings,
    emissive_lit: bool,
    reproject: str = "adaptive",
):
    """Returns (radiance (rh,rw,3), variance, new spatial reservoir grid)."""
    render_size = settings.render_size
    deferred_size = settings.output_size
    ratio = settings.upscale_ratio
    rh, rw = render_size

    reuse_count = (
        SPATIAL_REUSE_COUNT_EMISSIVE if emissive_lit else SPATIAL_REUSE_COUNT_DIRECT
    )
    reuse_range = (
        SPATIAL_REUSE_RANGE_EMISSIVE if emissive_lit else SPATIAL_REUSE_RANGE_DIRECT
    )

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

    # Gradient/memory policy: the reuse loop operates on DETACHED reservoir
    # data — reservoir selection and resampling weights are discrete
    # estimator machinery (like the trace search), and differentiating the
    # 16-tap fori_loop stacks ~(taps x H x W x C) residuals that exceed
    # chip memory at 1080p. Material/light gradients still flow through
    # the final differentiable shade below; the temporal channels carry
    # the radiance-chain gradients. With
    # ``settings.spatial_radiance_grads`` the RADIANCE leaves stay
    # attached (the merge is linear in radiance given detached weights),
    # so spatially-reused emissive/indirect light also carries parameter
    # gradients — selection stays detached either way.
    def detach(r):
        det = jax.lax.stop_gradient(r)
        if not settings.spatial_radiance_grads:
            return det
        from dataclasses import replace as _rep

        return _rep(det, s=_rep(det.s, radiance=r.s.radiance))

    temporal = detach(temporal)
    spatial_prev = detach(spatial_prev)

    r = temporal  # load_reservoir(coords), light.wgsl:1520
    q0 = r
    s = q0.s

    use_spatial_variance = r.count <= SPATIAL_VARIANCE_SAMPLE_THRESHOLD

    previous_uv = duv - g.velocity_uv[..., :2]

    max_lifetime = jnp.where(
        settings.max_reservoir_lifetime <= 1.0,
        jnp.inf,
        settings.max_reservoir_lifetime,
    )
    use_prev = r.lifetime <= max_lifetime
    r_prev = load_previous_reservoir(
        spatial_prev, previous_uv, render_size, reproject
    )
    r = r_prev.select(use_prev, r)

    surface = retrieve_surface(scene, g.material, g.velocity_uv[..., 2:4])
    view = calculate_view(camera.position, position)

    def target_p(sample, direction):
        if emissive_lit:
            p = luminance(sample.radiance[..., :3])
        else:
            shaded = shading(
                view,
                s.visible_normal,
                direction,
                surface,
                sample.radiance,
                scene.ambient_color,
            )
            p = luminance(shaded)
        # Resampling target weights are estimator machinery — detached so
        # the fori_loop carry stays gradient-free (see policy note above).
        return jax.lax.stop_gradient(p)

    self_dir = safe_normalize(s.sample_position[..., :3] - s.visible_position[..., :3])
    r = merge_reservoir(r, q0, target_p(q0.s, self_dir))
    r = replace(
        r,
        s=replace(
            r.s, visible_position=s.visible_position, visible_normal=s.visible_normal
        ),
    )

    rot = fract(
        jnp.sum(s.random, axis=-1)
        + random_float(frame_number.astype(jnp.uint32))
    )

    coords_f = jnp.stack([xs.astype(jnp.float32), ys.astype(jnp.float32)], axis=-1)

    def eval_tap(r, q, sample_depth, in_bounds, occluded):
        """Rejection + GRIS-Jacobian merge of one neighbor candidate —
        shared by both tap-sampling paths (light.wgsl:1576-1642)."""
        depth_ratio = depth / jnp.where(sample_depth == 0.0, 1e-8, sample_depth)
        ok = in_bounds & (depth_ratio >= 0.9) & (depth_ratio <= 1.1)
        ok = ok & (q.count >= F32_EPSILON)
        ok = ok & (dot3(s.visible_normal, q.s.visible_normal) >= 0.866)
        sample_direction = safe_normalize(
            q.s.sample_position[..., :3] - s.visible_position[..., :3]
        )
        ok = ok & (dot3(sample_direction, s.visible_normal) >= 0.0)
        ok = ok & ~occluded
        jac = jnp.where(
            q.s.sample_position[..., 3] > 0.5, compute_jacobian(q.s, s), 1.0
        )
        p = target_p(q.s, sample_direction) / jac
        return merge_reservoir(r, q, p, mask=ok)

    def tap_body(i, r):
        # Fibonacci spiral with per-pixel random rotation (light.wgsl:1566-1572)
        fi = i.astype(jnp.float32)
        angle = TAU * fract(fi * GOLDEN_RATIO + rot)
        radius = jnp.sqrt(fi / reuse_count) * reuse_range
        offset = radius[..., None] * jnp.stack(
            [jnp.cos(angle), jnp.sin(angle)], axis=-1
        )

        sample_coords = (offset + coords_f).astype(jnp.int32)
        sample_uv = (sample_coords.astype(jnp.float32) + 0.5) / jnp.asarray(
            [rw, rh], dtype=jnp.float32
        )
        in_bounds = jnp.all((sample_uv >= 0.0) & (sample_uv <= 1.0), axis=-1)

        sx = jnp.clip(sample_coords[..., 0], 0, rw - 1)
        sy = jnp.clip(sample_coords[..., 1], 0, rh - 1)
        s_duv = jittered_deferred_uv(
            (sample_coords.astype(jnp.float32) + 0.5)
            / jnp.asarray([rw, rh], dtype=jnp.float32),
            frame_number,
            deferred_size,
            ratio,
        )
        sdy, sdx = uv_to_coords(s_duv, deferred_size)
        sample_depth = gbuffer.position[sdy, sdx, 3]
        q = gather_reservoir(temporal, sy, sx)

        # Screen-space depth ray-march occlusion (light.wgsl:1608-1628).
        tap_interval = jnp.maximum(1.0, radius / (SPATIAL_REUSE_TAPS + 1))
        tap_count = (radius / tap_interval).astype(jnp.int32)
        occluded = jnp.zeros((rh, rw), dtype=bool)
        offset_dir = offset / jnp.maximum(radius, 1e-8)
        for j in range(1, SPATIAL_REUSE_TAPS + 2):
            tap_on = j <= tap_count
            tap_dist = j * tap_interval
            tap_uv = uv + tap_dist * offset_dir / jnp.asarray(
                [rw, rh], dtype=jnp.float32
            )
            t_duv = jittered_deferred_uv(tap_uv, frame_number, deferred_size, ratio)
            tdy, tdx = uv_to_coords(t_duv, deferred_size)
            tap_depth = gbuffer.position[tdy, tdx, 3]
            ref_depth = depth + (sample_depth - depth) * (
                j / (tap_count.astype(jnp.float32) + 1.0)
            )
            occluded = occluded | (tap_on & (tap_depth > ref_depth + 1e-5))

        return eval_tap(r, q, sample_depth, in_bounds, occluded)

    def rolled_taps(r):
        """Roll-based tap sampling — the TPU-fast path. Per-pixel 2D
        gathers are the slowest primitive on TPU (measured: this pass's
        gathers alone were 2.2 s of a 6 s 1080p frame). With tap offsets
        uniform per VARIANT (K globally-rotated copies of the spiral,
        each pixel randomly assigned one per frame), every neighbor
        fetch becomes a jnp.roll — pure shifted bandwidth like the
        denoiser — plus one K-way select. RIS stays unbiased under any
        candidate-sampling pattern (W = w_sum/(count*lum) normalizes
        pattern-free; light.wgsl:1566 chooses per-pixel rotation only to
        decorrelate, not for correctness); K trades tap diversity
        against bandwidth. Depth fetches reuse the precomputed
        render-res `depth` plane (identical values to the per-sample
        deferred G-buffer fetch in the gather path)."""
        K = settings.spatial_tap_variants
        variant = jnp.minimum((rot * K).astype(jnp.int32), K - 1)
        frame_phase = random_float(frame_number.astype(jnp.uint32))

        def roll2(a, oy, ox):
            return jnp.roll(a, shift=(-oy, -ox), axis=(0, 1))

        def roll_tap_body(i, r):
            fi = i.astype(jnp.float32)
            radius = jnp.sqrt(fi / reuse_count) * reuse_range  # scalar
            tap_interval = jnp.maximum(1.0, radius / (SPATIAL_REUSE_TAPS + 1))
            tap_count = (radius / tap_interval).astype(jnp.int32)

            q_k, sd_k, inb_k, occ_k = [], [], [], []
            for k in range(K):
                ang = TAU * fract(fi * GOLDEN_RATIO + (k + frame_phase) / K)
                ox = radius * jnp.cos(ang)
                oy = radius * jnp.sin(ang)
                oxi = jnp.floor(ox).astype(jnp.int32)
                oyi = jnp.floor(oy).astype(jnp.int32)
                q_k.append(
                    jax.tree_util.tree_map(
                        lambda a, _oy=oyi, _ox=oxi: roll2(a, _oy, _ox),
                        temporal,
                    )
                )
                sd_k.append(roll2(depth, oyi, oxi))
                inb_k.append(
                    (xs + oxi >= 0)
                    & (xs + oxi < rw)
                    & (ys + oyi >= 0)
                    & (ys + oyi < rh)
                )
                occ = jnp.zeros((rh, rw), dtype=bool)
                for j in range(1, SPATIAL_REUSE_TAPS + 2):
                    tap_on = j <= tap_count
                    f = tap_interval * j / jnp.maximum(radius, 1e-8)
                    tdxi = jnp.floor(ox * f).astype(jnp.int32)
                    tdyi = jnp.floor(oy * f).astype(jnp.int32)
                    tap_depth = roll2(depth, tdyi, tdxi)
                    ref_depth = depth + (sd_k[-1] - depth) * (
                        j / (tap_count.astype(jnp.float32) + 1.0)
                    )
                    occ = occ | (tap_on & (tap_depth > ref_depth + 1e-5))
                occ_k.append(occ)

            # Per-pixel K-way select (tap index rotates the assignment so
            # consecutive taps decorrelate even within one variant class).
            v = (variant + i) % K

            def pick(*xs_):
                out = xs_[0]
                for k in range(1, K):
                    m = v == k
                    mm = m.reshape(m.shape + (1,) * (xs_[k].ndim - m.ndim))
                    out = jnp.where(mm, xs_[k], out)
                return out

            q = jax.tree_util.tree_map(pick, *q_k)
            sample_depth = pick(*sd_k)
            in_bounds = pick(*inb_k)
            occluded = pick(*occ_k)
            return eval_tap(r, q, sample_depth, in_bounds, occluded)

        if _spatial_unroll():
            # Python unroll with CONSTANT jnp loop indices: bitwise-identical
            # math (the body is unchanged; fi/radius/tap_count const-fold),
            # but the K roll+select chains of every tap become independent
            # subgraphs XLA can hoist/interleave, and the ~25-plane reservoir
            # carry stops round-tripping HBM per fori_loop iteration.
            # Measured A/B (tools/ab_bench.py): see commit trail.
            out = r
            for i in range(1, reuse_count + 1):
                out = roll_tap_body(jnp.asarray(i, jnp.int32), out)
            return out
        return jax.lax.fori_loop(1, reuse_count + 1, roll_tap_body, r)

    if settings.spatial_taps == "rolls":
        r = rolled_taps(r)
    else:
        # fori_loop keeps the compiled graph O(1) in tap count (vs 16x unroll).
        r = jax.lax.fori_loop(1, reuse_count + 1, tap_body, r)

    r = clamp_reservoir(r, settings.max_spatial_reuse_count)

    out_dir = safe_normalize(r.s.sample_position[..., :3] - s.visible_position[..., :3])
    out_radiance = shading(
        view, s.visible_normal, out_dir, surface, r.s.radiance, scene.ambient_color
    )
    if emissive_lit:
        total_lum = r.count * luminance(r.s.radiance[..., :3])
    else:
        total_lum = r.count * luminance(out_radiance)
    w = jnp.where(total_lum > 0.0, r.w_sum / jnp.where(total_lum == 0.0, 1.0, total_lum), 0.0)
    r = replace(r, w=w, lifetime=r.lifetime + 1.0)

    variance = jnp.where(
        use_spatial_variance, reservoir_variance(r, MAX_VARIANCE), variance_in
    )

    # Background: keep the temporal (empty) reservoir, zero output
    # (light.wgsl:1526-1530).
    r = temporal.select(background, r)
    out = jnp.where(background[..., None], 0.0, out_radiance * r.w[..., None])
    variance = jnp.where(background, 0.0, variance)
    return out, variance, r

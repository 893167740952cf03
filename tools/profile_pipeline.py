"""Pipeline pass-cost profile via settings ablations (tools/):
scan-folded, fetch-synced timing (the only honest method on the tunnel —
see tools/verify_bench.py) of the forward frame and fwd+grad step under
a sequence of pass toggles. The difference between consecutive rows
isolates each pass's cost. Every ablation is its own executable; the
persistent compile cache makes re-runs cheap.

Usage: python tools/profile_pipeline.py [--config cornell] [--size 0]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="cornell")
    ap.add_argument("--size", type=int, default=0)
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--grad", action="store_true",
                    help="also profile fwd+grad for each ablation")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.expanduser("~/.cache/hikari_tpu_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp

    from hikari_tpu.config import Taa, Upscale
    from hikari_tpu.io.scenes import CONFIGS
    from hikari_tpu.parallel.sharding import DIFF_LEAVES, render_loss
    from hikari_tpu.render import initial_state
    from hikari_tpu.render.pipeline import render_frame
    from hikari_tpu.scene import build_scene_buffers

    if args.size:
        width = height = args.size
    elif args.config == "cornell":
        width, height = 1920, 1080
    else:
        width, height = 512, 512
    scene, camera, base = CONFIGS[args.config]()
    base = base.replace(
        width=width, height=height, upscale=Upscale.smaa_tu4x(2.0),
        taa=Taa.JASMINE, denoise=True, indirect_bounces=1,
    )
    buffers = build_scene_buffers(scene)
    N = args.frames

    def split(sc):
        return {k: getattr(sc, k) for k in DIFF_LEAVES}

    def merge(sc, params):
        return type(sc)(**{
            **{f: getattr(sc, f) for f in sc.__dataclass_fields__}, **params,
        })

    def time_settings(settings, with_grad):
        state = initial_state(settings)
        target = jnp.zeros(settings.output_size + (3,))

        @jax.jit
        def run_n(sc, cam, st0, tgt):
            p0 = split(sc)

            def frame(carry, _):
                st, acc = carry
                if with_grad:
                    def loss_fn(p):
                        return render_loss(
                            merge(sc, p), cam, st, tgt, settings
                        )

                    (loss, (out, new_st)), grads = jax.value_and_grad(
                        loss_fn, has_aux=True
                    )(p0)
                    gsum = sum(jnp.sum(jnp.abs(g)) for g in grads.values())
                    return (new_st, acc + loss + 1e-12 * gsum), None
                out, new_st = render_frame(sc, cam, st, settings)
                return (new_st, acc + jnp.mean(out.image)), None

            (st_f, acc), _ = jax.lax.scan(
                frame, (st0, jnp.float32(0.0)), None, length=N
            )
            return acc

        t0 = time.perf_counter()
        acc = run_n(buffers, camera, state, target)
        _ = float(acc)
        compile_dt = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            acc = run_n(buffers, camera, state, target)
            _ = float(acc)
            best = min(best, time.perf_counter() - t0)
        return best / N, compile_dt

    ablations = [
        ("full", base),
        ("no-denoise", base.replace(denoise=False)),
        ("no-spatial", base.replace(
            indirect_spatial_reuse=False, emissive_spatial_reuse=False)),
        ("no-taa", base.replace(taa=Taa.NONE)),
        ("no-temporal", base.replace(temporal_reuse=False)),
        ("bounces-0", base.replace(indirect_bounces=0)),
        ("no-upscale(full-res-internal)", base.replace(
            upscale=Upscale.none())),
        ("bare(min everything)", base.replace(
            denoise=False, taa=Taa.NONE, temporal_reuse=False,
            indirect_spatial_reuse=False, emissive_spatial_reuse=False,
            indirect_bounces=0)),
    ]
    print(f"# {args.config} {width}x{height}, frames={N}", file=sys.stderr)
    for name, s in ablations:
        dt, cdt = time_settings(s, with_grad=False)
        row = f"fwd  {name:32s} {dt*1e3:9.1f} ms/frame (compile+first {cdt:.1f}s)"
        print(row, file=sys.stderr)
        if args.grad:
            dtg, cdtg = time_settings(s, with_grad=True)
            print(f"grad {name:32s} {dtg*1e3:9.1f} ms/frame "
                  f"(compile+first {cdtg:.1f}s)", file=sys.stderr)


def _entry():
    import argparse as _a
    ap = _a.ArgumentParser()
    ap.add_argument("--config", default="cornell")
    ap.add_argument("--size", type=int, default=0)
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--grad", action="store_true")
    ap.add_argument("--passes", action="store_true")
    args = ap.parse_args()
    if args.passes:
        passes_mode(args)
    else:
        main()




def passes_mode(args):
    """--passes: time each pass in isolation (scan-folded + fetch)."""
    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.expanduser("~/.cache/hikari_tpu_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import time

    from hikari_tpu.config import Taa, Upscale
    from hikari_tpu.io.scenes import CONFIGS
    from hikari_tpu.render import initial_state
    from hikari_tpu.render.denoise import denoise_channel
    from hikari_tpu.render.gbuffer import render_gbuffer
    from hikari_tpu.render.light import (
        direct_lit_pass,
        full_screen_albedo,
        indirect_lit_pass,
    )
    from hikari_tpu.render.noise import blue_noise_bank
    from hikari_tpu.render.pipeline import _albedo_at_render_res
    from hikari_tpu.render.smaa import smaa_tu4x
    from hikari_tpu.render.spatial import spatial_reuse_pass
    from hikari_tpu.render.taa import taa_jasmine
    from hikari_tpu.render.tonemap import tone_mapping
    from hikari_tpu.scene import build_scene_buffers

    if args.size:
        width = height = args.size
    elif args.config == "cornell":
        width, height = 1920, 1080
    else:
        width, height = 512, 512
    scene, camera, base = CONFIGS[args.config]()
    s = base.replace(
        width=width, height=height, upscale=Upscale.smaa_tu4x(2.0),
        taa=Taa.JASMINE, denoise=True, indirect_bounces=1,
    )
    buffers = build_scene_buffers(scene)
    state = initial_state(s)
    noise = jnp.asarray(blue_noise_bank())
    rh, rw = s.render_size
    N = args.frames

    def timed(name, fn, *xs):
        @jax.jit
        def run(*xs):
            def step(acc, k):
                out = fn(*xs)
                leaves = [
                    jnp.sum(v) for v in jax.tree_util.tree_leaves(out)
                    if hasattr(v, "dtype")
                    and jnp.issubdtype(v.dtype, jnp.floating)
                ]
                return acc + sum(leaves) * (1.0 + 1e-12 * k), None

            acc, _ = jax.lax.scan(
                step, jnp.float32(0.0), jnp.arange(N, dtype=jnp.float32)
            )
            return acc.reshape(1)

        t0 = time.perf_counter()
        _ = float(run(*xs)[0])
        cdt = time.perf_counter() - t0
        best = 1e30
        for _ in range(2):
            t0 = time.perf_counter()
            _ = float(run(*xs)[0])
            best = min(best, (time.perf_counter() - t0) / N)
        print(f"{name:20s} {best*1e3:9.1f} ms  (compile+first {cdt:.0f}s)",
              file=sys.stderr)
        return best

    fno = state.frame_number
    gb = jax.jit(
        lambda sc: render_gbuffer(sc, camera, fno, s)
    )(buffers)
    albedo = jax.jit(lambda sc: full_screen_albedo(sc, camera, gb))(buffers)
    alb_rr = jax.jit(
        lambda a: _albedo_at_render_res(a, gb, s, fno)
    )(albedo)

    timed("gbuffer", lambda sc: render_gbuffer(sc, camera, fno, s), buffers)
    timed("albedo", lambda sc: full_screen_albedo(sc, camera, gb), buffers)
    timed(
        "direct_lit",
        lambda sc, t, sp: direct_lit_pass(
            sc, camera, gb, t, sp, noise, fno, s,
            emissive_lit=False, render_emissive=True,
        ),
        buffers, state.direct_temporal, state.de_spatial,
    )
    if buffers.num_emissives > 0:
        timed(
            "emissive_lit",
            lambda sc, t, sp: direct_lit_pass(
                sc, camera, gb, t, sp, noise, fno, s,
                emissive_lit=True, render_emissive=False,
            ),
            buffers, state.emissive_temporal, state.de_spatial,
        )
        timed(
            "emissive_spatial",
            lambda sc, t, sp, v: spatial_reuse_pass(
                sc, camera, gb, t, sp, v, fno, s, emissive_lit=True,
            ),
            buffers, state.emissive_temporal, state.de_spatial,
            jnp.zeros((rh, rw)),
        )
    timed(
        "indirect_lit",
        lambda sc, t, sp: indirect_lit_pass(
            sc, camera, gb, t, sp, noise, fno, s,
        ),
        buffers, state.indirect_temporal, state.indirect_spatial,
    )
    timed(
        "indirect_spatial",
        lambda sc, t, sp, v: spatial_reuse_pass(
            sc, camera, gb, t, sp, v, fno, s, emissive_lit=False,
        ),
        buffers, state.indirect_temporal, state.indirect_spatial,
        jnp.zeros((rh, rw)),
    )
    rad = jnp.abs(jnp.ones((rh, rw, 3)) * 0.3)
    timed(
        "denoise_x1",
        lambda r, v, a: denoise_channel(r, v, a, gb, fno, s),
        rad, jnp.zeros((rh, rw)), alb_rr,
    )
    timed(
        "tonemap",
        lambda a, b, c: tone_mapping(a, b, c, s.clear_color),
        jnp.zeros((rh, rw, 4)), jnp.zeros((rh, rw, 4)), jnp.zeros((rh, rw, 4)),
    )
    cur = jnp.zeros((rh, rw, 4))
    timed(
        "smaa_tu4x",
        lambda c, p, g: smaa_tu4x(c, p, g, g, fno),
        cur, state.prev_upscaled, gb,
    )
    oh, ow = s.output_size
    timed(
        "taa",
        lambda c, p, g: taa_jasmine(c, p, g, g, s.clear_color, s.upscale_ratio),
        jnp.zeros((oh, ow, 4)), state.prev_taa, gb,
    )


if __name__ == "__main__":
    _entry()

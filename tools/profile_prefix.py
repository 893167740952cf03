"""Honest per-stage cost attribution INSIDE the real pipeline: time the
pipeline truncated after each stage (settings.stop_after) with the
scan+fetch harness, state threading and frame-counter dependence intact —
unlike isolated-pass timing, XLA cannot hoist a stage out of the scan
(every stage depends on the iterating frame_number), so consecutive-
prefix deltas are real stage costs including pass glue.

Usage: python tools/profile_prefix.py [--config cornell] [--frames 4]
       [--grad] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = [
    "gbuffer", "albedo", "direct", "emissive", "indirect",
    "denoise", "tonemap", "smaa", "taa", None,
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="cornell")
    ap.add_argument("--size", type=int, default=0)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--grad", action="store_true")
    ap.add_argument("--no-remat", action="store_true",
                    help="profile the bench's no-remat config")
    ap.add_argument(
        "--reproject", default="adaptive",
        choices=("adaptive", "shift", "gather"),
        help="settings.reproject specialization (match the bench config "
        "when attributing its frame)",
    )
    ap.add_argument("--channel-remat", action="store_true",
                    help="settings.channel_remat (estimator-chain remat)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--stages", default="",
        help="comma-separated subset of stop_after points to time, in "
        "order (use FULL for the untruncated pipeline); also accepts "
        "intra-channel points like direct:candidate (see render/light.py "
        "_channel_stop). Default: the full coarse list.",
    )
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
    from hikari_tpu.parallel.sharding import DIFF_LEAVES
    from hikari_tpu.render import initial_state, render_frame
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
    if args.no_remat:
        base = base.replace(remat=False)
    base = base.replace(
        reproject=args.reproject, channel_remat=args.channel_remat
    )
    buffers = build_scene_buffers(scene)
    N = args.frames

    def split(sc):
        return {k: getattr(sc, k) for k in DIFF_LEAVES}

    def merge(sc, params):
        return type(sc)(**{
            **{f: getattr(sc, f) for f in sc.__dataclass_fields__}, **params,
        })

    def time_prefix(settings):
        state = initial_state(settings)

        @jax.jit
        def run_n(sc, st0):
            p0 = split(sc)

            def frame(carry, _):
                st, acc = carry
                if args.grad:
                    def loss_fn(p):
                        out, new_st = render_frame(
                            merge(sc, p), camera, st, settings
                        )
                        return jnp.mean(out.image), new_st

                    (loss, new_st), grads = jax.value_and_grad(
                        loss_fn, has_aux=True
                    )(p0)
                    gsum = sum(jnp.sum(jnp.abs(g)) for g in grads.values())
                    return (new_st, acc + loss + 1e-12 * gsum), None
                out, new_st = render_frame(sc, camera, st, settings)
                return (new_st, acc + jnp.mean(out.image)), None

            (st_f, acc), _ = jax.lax.scan(
                frame, (st0, jnp.float32(0.0)), None, length=N
            )
            return acc

        t0 = time.perf_counter()
        _ = float(run_n(buffers, state))
        cdt = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _ = float(run_n(buffers, state))
            best = min(best, time.perf_counter() - t0)
        return best / N, cdt

    stages = STAGES
    if args.stages:
        stages = [
            None if s == "FULL" else s for s in args.stages.split(",")
        ]
    mode = "grad" if args.grad else "fwd"
    print(f"# {args.config} {width}x{height}, frames={N}, {mode}",
          file=sys.stderr)
    prev = 0.0
    for stage in stages:
        dt, cdt = time_prefix(base.replace(stop_after=stage))
        name = stage or "FULL"
        print(
            f"{mode} after {name:10s} {dt * 1e3:9.1f} ms/frame  "
            f"(+{(dt - prev) * 1e3:8.1f})  (compile+first {cdt:.0f}s)",
            file=sys.stderr,
        )
        prev = dt


if __name__ == "__main__":
    main()

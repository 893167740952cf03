"""Per-pass timing by ablation differencing.

VERDICT round-1 weak #6 asked for a per-pass breakdown behind the headline
number. XLA fuses the whole frame into one executable, so "time inside
pass X" isn't directly observable; instead each pass is toggled off and
the full-frame delta attributed to it (the reference's per-node GPU
timestamps would measure the same thing modulo fusion overlap).

Usage:
  python tools/profile_passes.py [--size 1080p|512] [--frames 24] [--cpu]

Prints a table of ms/frame per ablation + the attributed per-pass cost.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def time_config(settings, buffers, camera, frames):
    import jax

    from hikari_tpu.render import initial_state, render_frame_jit

    state = initial_state(settings)
    out, state = render_frame_jit(buffers, camera, state, settings)
    jax.block_until_ready(out.image)  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(frames):
            out, state = render_frame_jit(buffers, camera, state, settings)
        jax.block_until_ready(out.image)
        best = min(best, (time.perf_counter() - t0) / frames)
    return best * 1e3  # ms/frame


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1080p")
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.expanduser("~/.cache/hikari_tpu_jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from hikari_tpu.config import Taa, Upscale
    from hikari_tpu.io.scenes import cornell_config
    from hikari_tpu.scene import build_scene_buffers

    if args.size == "1080p":
        w, h = 1920, 1080
    else:
        w = h = int(args.size)
    scene, camera, settings = cornell_config()
    full = settings.replace(
        width=w, height=h, upscale=Upscale.smaa_tu4x(2.0), taa=Taa.JASMINE,
        denoise=True, indirect_bounces=1,
    )
    buffers = build_scene_buffers(scene)

    ablations = [
        ("full frame", full),
        ("- denoise", full.replace(denoise=False)),
        ("- TAA", full.replace(taa=Taa.NONE)),
        ("- SMAA TU4x", full.replace(upscale=Upscale.none())),
        ("- indirect", full.replace(indirect_bounces=0)),
        ("- emissive", full.replace(emissive_lit=False)),
        ("- temporal reuse", full.replace(temporal_reuse=False)),
        ("- spatial reuse", full.replace(indirect_spatial_reuse=False)),
        ("- reservoir f16", full.replace(reservoir_f16=False)),
    ]

    print(f"device={jax.devices()[0].platform} {w}x{h} frames={args.frames}")
    results = {}
    for name, cfg in ablations:
        ms = time_config(cfg, buffers, camera, args.frames)
        results[name] = ms
        print(f"{name:<20} {ms:8.3f} ms/frame", flush=True)

    base = results["full frame"]
    print("\nattributed pass cost (full - ablated):")
    for name, ms in results.items():
        if name == "full frame":
            continue
        print(f"{name[2:]:<20} {base - ms:8.3f} ms")
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()

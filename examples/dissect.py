"""Render the per-pass dissection set for a scene config — the analogue of
the reference's QA artifacts in assets/screenshots/dissection/
(direct-temporal, emissive-spatial, indirect-denoised, tone-mapping,
render; SURVEY.md §4: the author validated each stage against expected
images). The reference's dissection scene asset isn't shipped, so these
are OUR per-stage goldens for eyeballing and regression triage.

Usage:
  python examples/dissect.py cornell --frames 32 --size 256 --cpu --out-dir /tmp/dissect
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", choices=["cornell", "minimal", "simple", "scene", "city"])
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--out-dir", default="/tmp/dissect")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.expanduser("~/.cache/hikari_tpu_jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import numpy as np

    from hikari_tpu.io.image import write_png
    from hikari_tpu.io.scenes import CONFIGS
    from hikari_tpu.render import initial_state, render_frame_jit
    from hikari_tpu.scene import build_scene_buffers

    if args.config == "cornell":
        scene, cam, settings = CONFIGS[args.config](args.size)
    else:
        scene, cam, settings = CONFIGS[args.config](args.size, args.size)
    buffers = build_scene_buffers(scene)
    state = initial_state(settings)

    out = None
    for _ in range(args.frames):
        out, state = render_frame_jit(buffers, cam, state, settings)
    jax.block_until_ready(out.image)

    os.makedirs(args.out_dir, exist_ok=True)

    def dump(name, img, scale=1.0):
        img = np.asarray(img)[..., :3] * scale
        path = os.path.join(args.out_dir, f"{args.config}-{name}.png")
        write_png(path, img)
        print(f"wrote {path}")

    # Mirrors the reference dissection set's stages:
    dump("albedo", out.albedo)                    # full_screen_albedo
    dump("direct", out.direct)                    # direct-temporal/denoised
    dump("emissive", out.emissive, scale=4.0)     # emissive-spatial (boosted)
    dump("indirect", out.indirect, scale=2.0)     # indirect-denoised (boosted)
    dump("tone-mapping", out.tonemapped)          # tone_mapping output
    dump("render", out.image)                     # final (post TAA/upscale)

    gb = state.prev_gbuffer
    depth = np.asarray(gb.position[..., 3])
    dump("depth", np.repeat(depth[..., None], 3, axis=-1) * 2.0)
    normal = np.asarray(gb.normal) * 0.5 + 0.5
    dump("normal", normal)


if __name__ == "__main__":
    main()

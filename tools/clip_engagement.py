"""Measure how often the clip_gradient firewall actually binds (round-2
VERDICT item 9): runs one fwd+grad train step per config with
HIKARI_COUNT_CLIP=1 and prints per-site engagement (cotangents that were
NaN or |g| > limit, out of cotangents seen). Low rates are the evidence
behind the "<1% relative bias" claim for the pass-boundary firewall;
rates are also recorded in README.md's gradient-policy section.

Usage: python tools/clip_engagement.py [--config cornell scene] [--size 256]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["HIKARI_COUNT_CLIP"] = "1"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", nargs="*", default=["cornell", "scene"])
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from hikari_tpu.config import Taa, Upscale
    from hikari_tpu.diff import clip_engagement_report, reset_clip_engagement
    from hikari_tpu.io.scenes import CONFIGS
    from hikari_tpu.parallel import make_train_step
    from hikari_tpu.render import initial_state
    from hikari_tpu.scene import build_scene_buffers

    for name in args.config:
        scene, camera, settings = CONFIGS[name]()
        settings = settings.replace(
            width=args.size, height=args.size,
            upscale=Upscale.smaa_tu4x(2.0), taa=Taa.JASMINE,
            denoise=True, indirect_bounces=1,
        )
        buffers = build_scene_buffers(scene)
        state = initial_state(settings)
        target = jnp.zeros(settings.output_size + (3,))
        step = make_train_step(settings)
        reset_clip_engagement()
        # A couple of frames so temporal reuse paths carry real state.
        for _ in range(3):
            loss, grads, out, state = step(buffers, camera, state, target)
        jax.block_until_ready(loss)
        print(f"\n# {name} {args.size}x{args.size}, 3 fwd+grad steps")
        rep = clip_engagement_report()
        total_e = total_t = 0
        for site, (e, t, rate) in rep.items():
            print(f"  {site:20s} engaged {e:>12,} / {t:>15,}  ({rate:.3e})")
            total_e += e
            total_t += t
        if total_t:
            print(f"  {'TOTAL':20s} engaged {total_e:>12,} / {total_t:>15,}"
                  f"  ({total_e / total_t:.3e})")


if __name__ == "__main__":
    main()

"""Render any benchmark scene config to a PNG — the headless counterpart
of the reference's example binaries (examples/{cornell,minimal,simple,
scene,city}.rs, which are its de-facto acceptance tests, SURVEY.md §3.5).

Usage:
  python examples/render.py cornell --frames 32 --size 256 --out cornell.png
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", choices=["cornell", "minimal", "simple", "scene", "city"])
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument(
        "--stream", action="store_true",
        help="city.rs-style model streaming: start with most instances "
        "inactive and activate a batch per frame via the device-side "
        "visibility mask (scene/update.py update_activity) — no recompile",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from hikari_tpu.io.scenes import CONFIGS
    from hikari_tpu.io.image import write_png
    from hikari_tpu.render import initial_state, render_frame_jit
    from hikari_tpu.scene import build_scene_buffers

    if args.config == "cornell":
        scene, cam, settings = CONFIGS[args.config](args.size)
    else:
        scene, cam, settings = CONFIGS[args.config](args.size, args.size)
    buffers = build_scene_buffers(scene)
    state = initial_state(settings)

    stream_plan = None
    if args.stream:
        # Stream instances in over time like examples/city.rs:23: keep the
        # first instance (ground), activate the rest in per-frame batches.
        import numpy as np

        from hikari_tpu.scene import update_activity

        I = buffers.num_instances
        active = np.zeros(I, dtype=bool)
        active[0] = True
        buffers = update_activity(buffers, active)
        batch = max(1, (I - 1) // max(args.frames - 1, 1) + 1)
        stream_plan = (active, batch, update_activity)

    t0 = time.time()
    out = None
    for i in range(args.frames):
        if stream_plan is not None:
            active, batch, update_activity = stream_plan
            nxt = active.copy()
            lo = 1 + i * batch
            nxt[lo : lo + batch] = True
            if not np.array_equal(nxt, active):
                buffers = update_activity(buffers, nxt)
                stream_plan = (nxt, batch, update_activity)
        out, state = render_frame_jit(buffers, cam, state, settings)
    jax.block_until_ready(out.image)
    dt = time.time() - t0
    print(f"{args.frames} frames in {dt:.2f}s ({args.frames / dt:.1f} fps)")

    path = args.out or f"{args.config}_{args.size}.png"
    import numpy as np

    img = np.asarray(out.image)[..., :3]
    write_png(path, img)
    print(f"wrote {path}  range=[{img.min():.4f},{img.max():.4f}]")


if __name__ == "__main__":
    main()

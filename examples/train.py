"""Inverse rendering demo: recover a wall's base color from a target image
by gradient descent through the full renderer — the differentiable-
rendering capability the reference lacks entirely (BASELINE.json north
star: "pixel gradients w.r.t. material, light, and vertex parameters").

Usage:
  python examples/train.py --steps 40 --size 48 --cpu
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--size", type=int, default=48)
    ap.add_argument("--lr", type=float, default=0.5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from hikari_tpu.config import RenderSettings, Taa, Upscale
    from hikari_tpu.diff import replace_scene_field
    from hikari_tpu.io.scenes import cornell_config
    from hikari_tpu.render import initial_state, render_frame
    from hikari_tpu.scene import build_scene_buffers

    scene, cam, _ = cornell_config(size=args.size)
    settings = RenderSettings(
        width=args.size, height=args.size, upscale=Upscale.none(),
        taa=Taa.NONE, denoise=True, indirect_bounces=1,
        indirect_spatial_reuse=False,
    )
    buffers = build_scene_buffers(scene)
    state = initial_state(settings)

    # Ground truth: the real left-wall color (red). Start from grey.
    true_colors = buffers.mat_base_color
    target, _ = render_frame(buffers, cam, state, settings)
    target_img = jax.lax.stop_gradient(target.image[..., :3])

    init_colors = true_colors.at[3, :3].set(jnp.array([0.5, 0.5, 0.5]))

    @jax.jit
    def step(colors):
        def loss_fn(c):
            b = replace_scene_field(buffers, mat_base_color=c)
            out, _ = render_frame(b, cam, state, settings)
            return jnp.mean((out.image[..., :3] - target_img) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(colors)
        # Optimize only the unknown material (index 3 = left wall).
        mask = jnp.zeros_like(colors).at[3, :3].set(1.0)
        return loss, jnp.clip(colors - args.lr * g * mask, 0.0, 1.0)

    colors = init_colors
    for i in range(args.steps):
        loss, colors = step(colors)
        if i % 5 == 0 or i == args.steps - 1:
            est = np.asarray(colors)[3, :3]
            print(
                f"step {i:3d}  loss {float(loss):.6f}  "
                f"estimate {est.round(3)}  true {np.asarray(true_colors)[3, :3].round(3)}"
            )

    err = float(np.abs(np.asarray(colors)[3, :3] - np.asarray(true_colors)[3, :3]).max())
    print(f"final max-abs error: {err:.4f}")
    return err


if __name__ == "__main__":
    main()

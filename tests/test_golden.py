"""Golden-image regression (SURVEY.md §4 tier 2): the Cornell render is
deterministic (fixed blue-noise bank + frame counter), so a committed
golden catches any silent change in the light transport.

Two goldens (round-2 VERDICT item 6):
  * golden_cornell_64.npy        — frame 6, bare pipeline (no TAA/upscale):
    anchors the light transport itself.
  * golden_cornell_steady_96.npy — frame 18 of the FULL pipeline (SMAA
    TU4x + TAA + denoise + temporal/spatial ReSTIR reuse at steady state):
    anchors the reuse/reprojection paths, which a converged mean can hide.

Regenerate with: python tests/test_golden.py regen
"""

import os
import sys

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_cornell_64.npy")
GOLDEN_STEADY = os.path.join(
    os.path.dirname(__file__), "golden_cornell_steady_96.npy"
)
FRAMES = 6
FRAMES_STEADY = 18


def _render():
    from hikari_tpu.config import RenderSettings, Taa, Upscale
    from hikari_tpu.io.scenes import cornell_config
    from hikari_tpu.render import initial_state, render_frame_jit
    from hikari_tpu.scene import build_scene_buffers

    scene, cam, _ = cornell_config(size=64)
    settings = RenderSettings(
        width=64, height=64, upscale=Upscale.none(), taa=Taa.NONE, denoise=True
    )
    buffers = build_scene_buffers(scene)
    state = initial_state(settings)
    out = None
    for _ in range(FRAMES):
        out, state = render_frame_jit(buffers, cam, state, settings)
    return np.asarray(out.image)[..., :3]


def _render_steady():
    """Full default pipeline at temporal steady state: SMAA TU4x ratio 2 +
    TAA Jasmine + denoise + 1 indirect bounce, 18 frames so temporal and
    spatial reservoirs are warmed (the reference's steady state is
    50-sample temporal reservoirs, src/lib.rs:440)."""
    from hikari_tpu.config import RenderSettings, Taa, Upscale
    from hikari_tpu.io.scenes import cornell_config
    from hikari_tpu.render import initial_state, render_frame_jit
    from hikari_tpu.scene import build_scene_buffers

    scene, cam, _ = cornell_config(size=96)
    settings = RenderSettings(
        width=96,
        height=96,
        upscale=Upscale.smaa_tu4x(2.0),
        taa=Taa.JASMINE,
        denoise=True,
        indirect_bounces=1,
    )
    buffers = build_scene_buffers(scene)
    state = initial_state(settings)
    out = None
    for _ in range(FRAMES_STEADY):
        out, state = render_frame_jit(buffers, cam, state, settings)
    return np.asarray(out.image)[..., :3]


def _check(render_fn, golden_path):
    import pytest

    if not os.path.exists(golden_path):
        pytest.skip("golden not generated yet")
    img = render_fn()
    ref = np.load(golden_path)
    from hikari_tpu.io.image import image_psnr

    psnr = image_psnr(np.clip(img, 0, 1), np.clip(ref, 0, 1))
    # Deterministic pipeline: near-identical on the same backend; loose
    # threshold tolerates cross-backend float reassociation.
    assert psnr > 40.0, psnr


def test_cornell_golden():
    _check(_render, GOLDEN)


def test_cornell_steady_state_golden():
    _check(_render_steady, GOLDEN_STEADY)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        import jax

        jax.config.update("jax_platforms", "cpu")
        np.save(GOLDEN, _render())
        print(f"wrote {GOLDEN}")
        np.save(GOLDEN_STEADY, _render_steady())
        print(f"wrote {GOLDEN_STEADY}")

"""Golden-image regression (SURVEY.md §4 tier 2): the Cornell render is
deterministic (fixed blue-noise bank + frame counter), so a committed
golden catches any silent change in the light transport. Regenerate with:
    python tests/test_golden.py regen
"""

import os
import sys

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_cornell_64.npy")
FRAMES = 6


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


def test_cornell_golden():
    import pytest

    if not os.path.exists(GOLDEN):
        pytest.skip("golden not generated yet")
    img = _render()
    ref = np.load(GOLDEN)
    from hikari_tpu.io.image import image_psnr

    psnr = image_psnr(np.clip(img, 0, 1), np.clip(ref, 0, 1))
    # Deterministic pipeline: near-identical on the same backend; loose
    # threshold tolerates cross-backend float reassociation.
    assert psnr > 40.0, psnr


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        import jax

        jax.config.update("jax_platforms", "cpu")
        np.save(GOLDEN, _render())
        print(f"wrote {GOLDEN}")

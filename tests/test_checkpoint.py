"""Checkpoint/resume: a restored FrameState must continue the exact same
frame sequence (SURVEY.md §5 — new capability; the reference has none)."""

import os

import numpy as np

from hikari_tpu.config import RenderSettings, Taa, Upscale
from hikari_tpu.io.checkpoint import load_state, save_state
from hikari_tpu.io.scenes import cornell_config
from hikari_tpu.render import initial_state, render_frame_jit
from hikari_tpu.scene import build_scene_buffers


def test_checkpoint_roundtrip(tmp_path, cornell_buffers):
    _, cam, _ = cornell_config(size=32)
    settings = RenderSettings(
        width=32, height=32, upscale=Upscale.none(), denoise=False, taa=Taa.NONE
    )
    state = initial_state(settings)
    for _ in range(2):
        out, state = render_frame_jit(cornell_buffers, cam, state, settings)

    path = str(tmp_path / "state")
    save_state(path, state)
    restored = load_state(path, state)

    out_a, state_a = render_frame_jit(cornell_buffers, cam, state, settings)
    out_b, state_b = render_frame_jit(cornell_buffers, cam, restored, settings)
    np.testing.assert_array_equal(np.asarray(out_a.image), np.asarray(out_b.image))
    assert int(state_a.frame_number) == int(state_b.frame_number)

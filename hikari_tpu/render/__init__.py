"""Render layer: the per-frame pipeline (reference L1/L3-L6 —
prepass, light, post-process, overlay; see SURVEY.md §1)."""

from hikari_tpu.render.camera import Camera
from hikari_tpu.render.pipeline import (
    initial_state,
    render_frame,
    render_frame_jit,
)
from hikari_tpu.render.types import FrameState, GBuffer, RenderOutputs

__all__ = [
    "Camera",
    "initial_state",
    "render_frame",
    "render_frame_jit",
    "FrameState",
    "GBuffer",
    "RenderOutputs",
]

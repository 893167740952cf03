"""Tracing / profiling utilities.

The reference exposes only two optional tracing spans behind a cargo
feature (``info_span!("main_prepass")`` src/prepass.rs:789-790,
``"main_overlay"`` src/overlay.rs:360-361) and leaves GPU timing to
external tools (SURVEY.md §5). The TPU-native equivalents:

* ``pass_scope(name)`` — ``jax.named_scope`` so every render pass is
  labeled in HLO and shows up in XLA profiles / xprof traces;
* ``trace_to(dir)`` — context manager around ``jax.profiler`` capturing a
  TensorBoard-loadable trace of real device execution;
* ``frame_timer`` — lightweight host-side wall-clock timing with
  blocking, for quick perf numbers without a full profile.
"""

from __future__ import annotations

import contextlib
import time

import jax


def pass_scope(name: str):
    """Label a render pass in the HLO/profile (use as context manager)."""
    return jax.named_scope(name)


@contextlib.contextmanager
def trace_to(log_dir: str):
    """Capture a device profile into ``log_dir`` (TensorBoard format)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class FrameTimer:
    """Blocking wall-clock timer for jitted steps."""

    def __init__(self):
        self.samples: list[float] = []

    @contextlib.contextmanager
    def time(self, result_to_block_on=None):
        t0 = time.perf_counter()
        yield
        if result_to_block_on is not None:
            jax.block_until_ready(result_to_block_on)
        self.samples.append(time.perf_counter() - t0)

    @property
    def mean(self) -> float:
        return sum(self.samples) / max(len(self.samples), 1)

    @property
    def last(self) -> float:
        return self.samples[-1] if self.samples else 0.0

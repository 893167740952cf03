"""Checkpoint / resume for renderer state.

The reference has NO checkpointing: its only cross-frame state lives in
GPU buffers (reservoirs src/light.rs:342-363, previous G-buffers
src/prepass.rs:309-318, ping-pong textures src/post_process.rs:733 —
SURVEY.md §5). Here that state is the explicit ``FrameState`` pytree, so
checkpoint/resume is a straight orbax (or numpy-fallback) save/restore —
enabling fault-tolerant long renders and restartable optimization loops.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from hikari_tpu.render.types import FrameState


def save_state(path: str, state: FrameState) -> None:
    """Save a FrameState. Uses orbax when available, else npz."""
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), state, force=True)
        ckptr.wait_until_finished()
        return
    except Exception:
        pass
    leaves, treedef = jax.tree_util.tree_flatten(state)
    np.savez(
        path if path.endswith(".npz") else path + ".npz",
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load_state(path: str, like: FrameState) -> FrameState:
    """Restore a FrameState with the same structure as ``like``."""
    try:
        import orbax.checkpoint as ocp

        if os.path.isdir(path):
            ckptr = ocp.StandardCheckpointer()
            return ckptr.restore(os.path.abspath(path), like)
    except Exception:
        pass
    npz_path = path if path.endswith(".npz") else path + ".npz"
    data = np.load(npz_path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    restored = [
        jax.numpy.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))
    ]
    return jax.tree_util.tree_unflatten(treedef, restored)

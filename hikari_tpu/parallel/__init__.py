"""Parallel layer: device meshes, sharded render/train steps
(SURVEY.md §2.4 — new in the TPU framework; reference is single-GPU)."""

from hikari_tpu.parallel.sharding import (
    DIFF_LEAVES,
    make_mesh,
    make_mesh_2d,
    shard_state_2d,
    make_sharded_render,
    make_train_step,
    render_loss,
    replicate,
    shard_state,
)

__all__ = [
    "DIFF_LEAVES",
    "make_mesh",
    "make_mesh_2d",
    "shard_state_2d",
    "make_sharded_render",
    "make_train_step",
    "render_loss",
    "replicate",
    "shard_state",
]

"""Trace layer: ray-scene intersection backends (reference
src/shaders/light.wgsl tracing section — see SURVEY.md §2.2)."""

from hikari_tpu.trace.api import (
    Hit,
    HitInfo,
    hit_info,
    occlude_hit_info,
    refine_hit,
    shard_tracing,
    trace_rays,
)
from hikari_tpu.trace.intersect import (
    inside_aabb,
    intersects_aabb,
    intersects_triangle,
)

__all__ = [
    "Hit",
    "HitInfo",
    "hit_info",
    "occlude_hit_info",
    "refine_hit",
    "shard_tracing",
    "trace_rays",
    "inside_aabb",
    "intersects_aabb",
    "intersects_triangle",
]

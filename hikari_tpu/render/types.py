"""Frame-persistent state pytrees.

In the reference, cross-frame state lives in GPU resources: double-buffered
G-buffers (src/prepass.rs:309-318), the 10-buffer reservoir cache
(src/light.rs:342-363), ping-pong post-process textures
(src/post_process.rs:621-747), and the frame counter (src/view.rs:77).
Here it is all one explicit ``FrameState`` pytree threaded through the
jitted ``render_frame`` step — checkpointable with orbax, shardable with
shard_map (SURVEY.md §5 checkpoint/resume)."""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp

from hikari_tpu.render.restir import Reservoir


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GBuffer:
    """The prepass MRTs (reference formats src/prepass.rs:43-47, fragment
    outputs src/shaders/prepass.wgsl:84-100), at full output resolution."""

    position: jax.Array  # (h, w, 4) world xyz + reversed-Z depth
    normal: jax.Array  # (h, w, 3)
    depth_gradient: jax.Array  # (h, w, 2) d(depth)/dx, d(depth)/dy
    instance: jax.Array  # (h, w) i32 (-1 background)
    material: jax.Array  # (h, w) i32
    velocity_uv: jax.Array  # (h, w, 4) screen velocity xy + surface uv

    @staticmethod
    def zeros(shape_hw) -> "GBuffer":
        h, w = shape_hw
        return GBuffer(
            position=jnp.zeros((h, w, 4)),
            normal=jnp.zeros((h, w, 3)),
            depth_gradient=jnp.zeros((h, w, 2)),
            instance=jnp.full((h, w), -1, dtype=jnp.int32),
            material=jnp.full((h, w), -1, dtype=jnp.int32),
            velocity_uv=jnp.zeros((h, w, 4)),
        )

    @property
    def depth(self) -> jax.Array:
        return self.position[..., 3]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class FrameState:
    """Everything carried frame to frame. Reservoir slots mirror the
    reference's buffer pairing [(0,4),(2,4),(6,8)] (src/light.rs:376,
    :518-546): per-channel temporal reservoirs, one spatial reservoir
    shared by direct+emissive, one for indirect."""

    frame_number: jax.Array  # () i32
    prev_gbuffer: GBuffer  # full-res, previous frame
    direct_temporal: Reservoir  # render-res grids
    emissive_temporal: Reservoir
    indirect_temporal: Reservoir
    de_spatial: Reservoir  # shared direct/emissive spatial (bufs 4/5)
    indirect_spatial: Reservoir  # bufs 8/9
    prev_tonemapped: jax.Array  # (rh, rw, 4) tone-mapped output (TAA input)
    prev_taa: jax.Array  # (rh, rw, 4) TAA history ("previous_render")
    prev_upscaled: jax.Array  # (h, w, 4) SMAA TU4x history

    @staticmethod
    def initial(settings) -> "FrameState":
        from hikari_tpu.render.pipeline import initial_state

        return initial_state(settings)

    def replace(self, **kw) -> "FrameState":
        return replace(self, **kw)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class RenderOutputs:
    """Per-frame pass outputs for inspection/golden tests — the analogue of
    the reference's dissection screenshots (assets/screenshots/dissection)."""

    image: jax.Array  # (h, w, 4) final output
    albedo: jax.Array  # (h, w, 3)
    direct: jax.Array  # (rh, rw, 3) per-channel radiance (post spatial)
    emissive: jax.Array
    indirect: jax.Array
    tonemapped: jax.Array  # (rh, rw, 4)
    # Frame health counters (render/pipeline.py frame_stats) — the
    # metrics/observability layer the reference lacked (SURVEY.md §5):
    # dict of scalar jnp values, e.g. background fraction, mean temporal
    # reservoir age, per-channel mean luminance, non-finite pixel count.
    stats: dict = None

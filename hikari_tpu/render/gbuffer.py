"""G-buffer generation by jittered primary rays.

The reference rasterizes the scene into 5 MRTs with a specialized raster
pipeline (src/prepass.rs, src/shaders/prepass.wgsl). A TPU has no
rasterizer, so we trace one primary ray per output pixel — producing the
identical G-buffer contents (SURVEY.md §2.2 prepass row): world position +
reversed-Z depth, world normal, depth gradients, instance/material ids,
screen-space velocity (current minus reprojected previous clip position)
and surface uv. Jitter reproduces prepass.wgsl:30-38's Halton sequence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hikari_tpu.config import RenderSettings, Taa, UpscaleMode
from hikari_tpu.render.camera import Camera
from hikari_tpu.render.types import GBuffer
from hikari_tpu.scene.buffers import SceneBuffers
from hikari_tpu.trace.api import hit_info, trace_rays
from hikari_tpu.utils import HALTON_JITTER, clip_to_uv


def frame_jitter(frame_number, smaa_tu4x: bool):
    """Reference ``frame_jitter`` (prepass.wgsl:30-38): Halton(2,3) point
    indexed by frame & 15 (halved under SMAA TU4x)."""
    table = jnp.asarray(HALTON_JITTER)  # (16, 2)
    index = jnp.where(smaa_tu4x, frame_number >> 1, frame_number) & 15
    return table[index]


def render_gbuffer(
    scene: SceneBuffers,
    camera: Camera,
    frame_number,
    settings: RenderSettings,
) -> GBuffer:
    size = settings.output_size
    h, w = size

    smaa = settings.upscale.mode == UpscaleMode.SMAA_TU4X
    taa_on = settings.taa == Taa.JASMINE
    if taa_on or smaa:
        fj = frame_jitter(frame_number, smaa)
        # Clip-space jitter +(j.x, -j.y)*w (prepass.wgsl:69) shifts geometry
        # by +j pixels in x / +j in uv-y; the ray-traced equivalent samples
        # the scene at pixel center - j.
        jitter = -fj
    else:
        jitter = None

    origin, direction = camera.pixel_rays(size, jitter)
    # Bound primary hits at DISTANCE_MAX (the reference's miss convention,
    # light.wgsl POSITION/DISTANCE_MAX): near-parallel grazing hits on huge
    # geometry otherwise return t ~ 1e38, overflowing the clip-space
    # velocity math into NaN.
    from hikari_tpu.config import DISTANCE_MAX

    hit = trace_rays(
        scene,
        origin,
        direction,
        max_distance=jnp.float32(DISTANCE_MAX),
        method=settings.tracer,
        bruteforce_max_tris=settings.bruteforce_max_tris,
        max_steps=settings.max_traversal_steps,
    )

    # Intra-pass profiling stops (tools/profile_prefix.py):
    # stop_after = "gbuffer:trace" / "gbuffer:hitinfo" truncate here.
    def _trunc(*trees):
        acc = sum(
            jnp.sum(jnp.clip(jnp.nan_to_num(v.astype(jnp.float32)), -1e6, 1e6))
            for t in trees
            for v in jax.tree_util.tree_leaves(t)
            if hasattr(v, "dtype")
        )
        z3 = jnp.zeros((h, w, 3)) + acc
        z2 = jnp.zeros((h, w)) + acc
        return GBuffer(
            position=jnp.concatenate([z3, z2[..., None]], axis=-1),
            normal=z3,
            depth_gradient=jnp.stack([z2, z2], axis=-1),
            instance=jnp.zeros((h, w), jnp.int32),
            material=jnp.zeros((h, w), jnp.int32),
            velocity_uv=jnp.concatenate([z3, z2[..., None]], axis=-1),
        )

    if settings.stop_after == "gbuffer:trace":
        return _trunc(hit)
    info = hit_info(scene, origin, direction, hit)
    if settings.stop_after == "gbuffer:hitinfo":
        return _trunc(hit, info)

    miss = hit.prim < 0
    world_pos = info.position[..., :3]
    depth = jnp.where(miss, 0.0, camera.depth_of(world_pos))
    position = jnp.concatenate([world_pos, depth[..., None]], axis=-1)

    # Motion vectors: previous world position via the instance's previous
    # model matrix (reference prepass.wgsl:55-58 + velocity :96).
    # prev_from_cur = prev_model @ inv(model) composed per instance (tiny),
    # then the 12 affine components fetched with ONE row gather — 12
    # separate per-plane gathers cost ~6 ms each at 2M rows on v5e
    # (~72 ms of the 129 ms prepass; gathers price per output row,
    # tools/bench_gather.py). The (R, 12) gather output lane-pads 12->128
    # (~1 GB transient at 1080p) but stays well inside the 14 GiB gate
    # budget (tools/tpu_gate.py) and dies at the next reshape.
    safe_inst = jnp.maximum(hit.inst, 0)
    prev_from_cur = jnp.einsum(
        "iab,ibc->iac", scene.inst_prev_model, scene.inst_inv_model
    )  # (I, 4, 4) affine
    # Snap static instances to the EXACT identity: prev_model @ inv(model)
    # carries ~1e-7 fp dust from the numerical inverse, which makes
    # velocity ~1e-7 instead of 0 — enough to flip floor() at the exact
    # integer reprojection boundaries and keep the zero-velocity fast
    # paths (filters.cond_window_gather, light._reproject_identity) from
    # ever engaging. Bounded change: only matrices within 1e-6 of I snap.
    eye = jnp.eye(4, dtype=prev_from_cur.dtype)
    is_static = jnp.all(
        jnp.abs(prev_from_cur - eye) < 1e-6, axis=(-2, -1), keepdims=True
    )
    prev_from_cur = jnp.where(is_static, eye, prev_from_cur)
    m = prev_from_cur.reshape(prev_from_cur.shape[0], 16)
    from hikari_tpu.utils import mxu_table_gather

    rows12 = mxu_table_gather(m[:, :12], safe_inst)  # (h, w, 12)

    def comp(k):
        return rows12[..., k]  # (h, w)

    x, y, z = world_pos[..., 0], world_pos[..., 1], world_pos[..., 2]
    prev_world = jnp.stack(
        [
            comp(0) * x + comp(1) * y + comp(2) * z + comp(3),
            comp(4) * x + comp(5) * y + comp(6) * z + comp(7),
            comp(8) * x + comp(9) * y + comp(10) * z + comp(11),
            jnp.ones_like(x),
        ],
        axis=-1,
    )
    wp_h = jnp.concatenate([world_pos, jnp.ones_like(depth)[..., None]], axis=-1)

    view_proj = camera.view_proj(size)
    prev_view_proj = camera.view_proj(size, previous=True)
    clip_cur = wp_h @ view_proj.T
    clip_prev = prev_world @ prev_view_proj.T
    velocity = clip_to_uv(clip_cur) - clip_to_uv(clip_prev)
    velocity = jnp.where(miss[..., None], 0.0, velocity)
    # Scrub any residual non-finite (e.g. previous position behind the
    # camera, w ~ 0) — the reference leaves unrasterized texels cleared.
    velocity = jnp.where(jnp.isfinite(velocity), velocity, 0.0)
    velocity_uv = jnp.concatenate([velocity, info.uv], axis=-1)

    # Depth gradients: screen-space forward differences standing in for the
    # rasterizer's dpdx/dpdy (prepass.wgsl:89).
    ddx = jnp.diff(depth, axis=1, append=depth[:, -1:])
    ddy = jnp.diff(depth, axis=0, append=depth[-1:, :])
    depth_gradient = jnp.stack([ddx, ddy], axis=-1)

    return GBuffer(
        position=position,
        normal=jnp.where(miss[..., None], 0.0, info.normal),
        depth_gradient=depth_gradient,
        instance=jnp.where(miss, -1, hit.inst).astype(jnp.int32),
        material=jnp.where(miss, -1, info.material).astype(jnp.int32),
        velocity_uv=velocity_uv,
    )

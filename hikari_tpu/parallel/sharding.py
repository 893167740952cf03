"""Distributed execution: pixel-tile data parallelism over a device mesh.

The reference is a single-process, single-GPU renderer whose only
parallelism is the 8x8-workgroup pixel dispatch (SURVEY.md §2.4). The
TPU-native framework adds the renderer's "DP" as a first-class axis:

* the pixel grid — G-buffer, reservoirs, channel outputs, and every
  post-process image — shards by rows across the ``tiles`` mesh axis;
* scene buffers (BVH, triangles, materials) replicate per device;
* under ``jax.grad``, replicated-parameter gradients all-reduce over ICI
  automatically (GSPMD inserts the psums the reference would have needed
  NCCL for).

Row sharding + XLA GSPMD means cross-tile reads (spatial-reuse spiral
taps, à-trous stencil rolls, reprojection gathers) lower to XLA
collective-permute/all-gather halos; a hand-tiled shard_map variant with
explicit ppermute halos is the planned optimization (SURVEY.md §2.4
item 1)."""

from __future__ import annotations

import contextlib
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hikari_tpu.config import RenderSettings
from hikari_tpu.render.pipeline import initial_state, render_frame
from hikari_tpu.render.types import FrameState


def make_mesh(devices=None, axis: str = "tiles") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def make_mesh_2d(shape, devices=None, axes=("ty", "tx")) -> Mesh:
    """2D tile mesh: image rows shard over ``ty`` and columns over ``tx``
    (square screen tiles keep both the spatial-reuse spiral and the
    à-trous halos compact in both dimensions)."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices[: shape[0] * shape[1]]).reshape(shape), axes)


def shard_state_2d(state: FrameState, mesh: Mesh, axes=("ty", "tx")) -> FrameState:
    """Place image-shaped leaves tile-sharded over (rows, cols)."""
    ty, tx = mesh.devices.shape

    def place(x):
        if (
            x.ndim >= 2
            and x.shape[0] % ty == 0
            and x.shape[1] % tx == 0
        ):
            spec = P(axes[0], axes[1], *([None] * (x.ndim - 2)))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, state)


def _image_spec(mesh: Mesh, ndim: int, axis: str = "tiles"):
    """Shard dim 0 (image rows); replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def shard_state(state: FrameState, mesh: Mesh, axis: str = "tiles") -> FrameState:
    """Place every image-shaped leaf row-sharded; scalars replicated."""

    def place(x):
        if x.ndim >= 2 and x.shape[0] % mesh.devices.size == 0:
            return jax.device_put(x, _image_spec(mesh, x.ndim, axis))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, state)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )


def _xla_tracer(settings: RenderSettings) -> RenderSettings:
    """Restrict auto tracer dispatch to GSPMD-partitionable backends:
    pallas_call has no partitioning rule, so inside a sharded step the
    partitioner would replicate its operands (full-res rays on every
    device). trace/api.py's "auto_xla" keeps the same crossovers but
    picks the pure-XLA tiled walk above the dense threshold.

    Only the fallback for sharded callers WITHOUT a mesh in hand: when
    the mesh is known, ``trace.shard_tracing`` wraps the Pallas backends
    in shard_map instead, keeping "auto" on the fused tile-walk."""
    if settings.tracer != "auto":
        return settings
    import dataclasses

    return dataclasses.replace(settings, tracer="auto_xla")


def make_sharded_render(
    settings: RenderSettings,
    mesh: Mesh,
    axis: str = "tiles",
    manual_halo_denoise: bool = False,
):
    """jit-compiled SPMD render step: state/outputs row-sharded, scene and
    camera replicated. Sharding propagates from the input placements; a
    constraint on the final image keeps XLA from gratuitously replicating.

    ``manual_halo_denoise``: swap the GSPMD-resharded denoiser for the
    shard_map manual-halo version (parallel/halo.py) — one ppermute of
    exactly ``step`` halo rows per field per à-trous level instead of
    compiler-chosen collectives around every roll. Numerically identical
    (tests/test_halo.py).

    Pallas tracer backends run inside shard_map over the mesh
    (trace.shard_tracing), so ``tracer="auto"`` keeps the fused Pallas
    tile-walk on sharded large scenes."""
    from hikari_tpu.trace.api import shard_tracing

    denoise_fn = None
    if manual_halo_denoise:
        from hikari_tpu.parallel.halo import denoise_channel_sharded

        denoise_fn = partial(
            denoise_channel_sharded, mesh=mesh, axis_name=axis
        )

    @jax.jit
    def step(scene, camera, state):
        with shard_tracing(mesh, axis):
            out, new_state = render_frame(
                scene, camera, state, settings, denoise_fn=denoise_fn
            )
        constrained = jax.lax.with_sharding_constraint(
            out.image, _image_spec(mesh, out.image.ndim, axis)
        )
        return type(out)(
            **{
                **{f: getattr(out, f) for f in out.__dataclass_fields__},
                "image": constrained,
            }
        ), new_state

    return step


def render_loss(scene, camera, state, target, settings: RenderSettings):
    """Pixel L2 loss against a target image — the canonical inverse-
    rendering objective (BASELINE.json: pixel gradients w.r.t. material,
    light, and vertex parameters)."""
    out, new_state = render_frame(scene, camera, state, settings)
    diff = out.image[..., :3] - target
    return jnp.mean(diff * diff), (out, new_state)


DIFF_LEAVES = (
    "mat_base_color",
    "mat_emissive",
    "mat_perceptual_roughness",
    "mat_metallic",
    "mat_reflectance",
    "sun_color",
    "ambient_color",
    "tri_world",
)


def make_train_step(
    settings: RenderSettings,
    sharded: bool = False,
    mesh: Mesh | None = None,
    axis="tiles",
):
    """Full training step: forward render + backward through shading/
    denoise/tonemap, returning gradients w.r.t. the differentiable scene
    leaves (materials, lights, world-space vertices at fixed hit
    topology). Under a sharded mesh, GSPMD all-reduces these replicated-
    parameter gradients over ICI. Pass the ``mesh`` there so the Pallas
    tracer backends run inside shard_map (rays sharded over ``axis``);
    ``sharded=True`` without a mesh falls back to restricting tracer
    auto-dispatch to GSPMD-partitionable backends."""
    shard_ctx = None
    if mesh is not None:
        from hikari_tpu.trace.api import shard_tracing

        shard_ctx = partial(shard_tracing, mesh, axis)
    elif sharded:
        settings = _xla_tracer(settings)

    def split(scene):
        params = {k: getattr(scene, k) for k in DIFF_LEAVES}
        return params

    def merge(scene, params):
        return type(scene)(
            **{
                **{f: getattr(scene, f) for f in scene.__dataclass_fields__},
                **params,
            }
        )

    @jax.jit
    def train_step(scene, camera, state, target):
        params = split(scene)

        def loss_fn(p):
            return render_loss(merge(scene, p), camera, state, target, settings)

        with shard_ctx() if shard_ctx is not None else contextlib.nullcontext():
            (loss, (out, new_state)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
        return loss, grads, out, new_state

    return train_step

"""Multi-host execution: process mesh, host-local data, scaling.

The reference is single-process/single-GPU (SURVEY.md §2.4); the
BASELINE north star demands pod-slice scaling (>=90% linear rays/s to
4 hosts). This module adds the multi-host half of the renderer's "DP":

  * ``initialize``     — ``jax.distributed`` process group (TPU pods use
    automatic cluster detection; CPU dryruns pass explicit coordinator),
  * ``host_mesh``      — a ("hosts", "chips") mesh: axis 0 spans
    processes (DCN), axis 1 the process-local devices (ICI). Pixel rows
    shard over BOTH axes — P(("hosts","chips"), ...) — so spatial-stencil
    halos between adjacent rows mostly stay intra-host on ICI and only
    one boundary per host crosses DCN,
  * ``host_local_state`` / ``host_local_image`` — each process allocates
    or loads ONLY its own rows (``jax.make_array_from_process_local_data``);
    no process ever materializes the full-resolution global arrays,
  * ``make_multihost_train_step`` — the standard train step jitted over
    the global mesh; GSPMD all-reduces the replicated scene-parameter
    gradients (psum over ICI within hosts, DCN across).

Scene buffers are replicated per host, loaded host-locally (every process
runs the same host compile — the analogue of the reference uploading its
scene to the one GPU, src/mesh_material/mod.rs:488-675).

Measured by ``bench_scaling.py`` (repo root): rays/s at 1 process and N
processes with scaling efficiency. On this single-machine environment the
processes are CPU dryruns — the harness, sharding layout, and collective
paths are exactly what a v5e pod slice runs, with DCN played by local
sockets (gloo).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hikari_tpu.config import RenderSettings
from hikari_tpu.render.pipeline import initial_state
from hikari_tpu.render.types import FrameState

HOST_AXES = ("hosts", "chips")


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    cpu_devices_per_process: int | None = None,
) -> None:
    """Initialize the process group. On a real TPU pod slice call with no
    arguments (cluster auto-detection). For CPU dryruns pass explicit
    coordinator/process info and a per-process virtual device count."""
    if cpu_devices_per_process is not None:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", int(cpu_devices_per_process))
        # Cross-process CPU collectives (the DCN stand-in).
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_mesh(axes: tuple[str, str] = HOST_AXES) -> Mesh:
    """Global ("hosts", "chips") mesh over all processes' devices."""
    n_proc = jax.process_count()
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    per_host = len(devices) // n_proc
    grid = np.array(devices).reshape(n_proc, per_host)
    return Mesh(grid, axes)


def row_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Rows sharded over the flattened (hosts, chips) axes."""
    return NamedSharding(mesh, P(mesh.axis_names, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _shardable(x, mesh: Mesh) -> bool:
    return hasattr(x, "ndim") and x.ndim >= 2 and x.shape[0] % mesh.size == 0


def host_local_image(mesh: Mesh, full_shape, fill_fn) -> jax.Array:
    """Build a row-sharded global array from per-process local rows —
    host-local data loading: ``fill_fn(row_lo, row_hi) -> (local_rows, ...)``
    is called ONLY for this process's slice of the image."""
    sharding = NamedSharding(mesh, P(mesh.axis_names, *([None] * (len(full_shape) - 1))))
    rows = full_shape[0]
    n_proc = jax.process_count()
    per_proc = rows // n_proc
    lo = jax.process_index() * per_proc
    local = np.asarray(fill_fn(lo, lo + per_proc))
    assert local.shape[0] == per_proc, (local.shape, per_proc)
    return jax.make_array_from_process_local_data(sharding, local)


def host_local_state(settings: RenderSettings, mesh: Mesh) -> FrameState:
    """Allocate the cross-frame state with every image-shaped leaf
    row-sharded over (hosts, chips), building each leaf from process-local
    rows only (no host ever holds a full-resolution array)."""
    template = jax.eval_shape(lambda: initial_state(settings))

    def alloc(leaf):
        if _shardable(leaf, mesh):
            sharding = row_sharding(mesh, leaf.ndim)
            n_proc = jax.process_count()
            local_shape = (leaf.shape[0] // n_proc,) + tuple(leaf.shape[1:])
            local = np.zeros(local_shape, dtype=leaf.dtype)
            return jax.make_array_from_process_local_data(sharding, local)
        return jax.device_put(
            jnp.zeros(leaf.shape, dtype=leaf.dtype), replicated(mesh)
        )

    return jax.tree_util.tree_map(alloc, template)


def replicate_host_local(tree, mesh: Mesh):
    """Replicate host-compiled scene/camera pytrees onto every device.
    Each process passes its *own* copy (identical by construction — the
    same deterministic scene compile runs per host)."""

    def place(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            replicated(mesh), x
        )

    return jax.tree_util.tree_map(place, tree)


def make_multihost_train_step(settings: RenderSettings, mesh: Mesh):
    """The standard train step (parallel/sharding.py) jitted over the
    global mesh with rows sharded across (hosts, chips). Scene-parameter
    gradients all-reduce automatically (ICI within hosts, DCN across).

    The mesh is passed through to ``make_train_step`` so the Pallas trace
    backends run inside shard_map over BOTH mesh axes (rays sharded,
    scene replicated) — without it the step silently fell back to the
    ``auto_xla`` lockstep walk, measured 4.2x slower than the fused
    Pallas tile-walk on FlightHelmet (round-2 VERDICT item 3;
    tests/test_sharding.py::test_multihost_step_keeps_pallas_tracer)."""
    from hikari_tpu.parallel.sharding import make_train_step

    step = make_train_step(settings, sharded=True, mesh=mesh, axis=None)

    def wrapped(scene, camera, state, target):
        loss, grads, out, new_state = step(scene, camera, state, target)
        # Keep the output image row-sharded (XLA would otherwise be free
        # to gather it onto every device).
        image = jax.lax.with_sharding_constraint(
            out.image, row_sharding(mesh, out.image.ndim)
        )
        out = type(out)(
            **{
                **{f: getattr(out, f) for f in out.__dataclass_fields__},
                "image": image,
            }
        )
        return loss, grads, out, new_state

    return wrapped

"""Distributed tests (SURVEY.md §4 tier 4): the 8-virtual-device CPU mesh
stands in for a pod slice. Sharded rendering must equal unsharded
(allclose), and the multichip dry-run (the driver's contract) must pass."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hikari_tpu.config import RenderSettings, Taa, Upscale
from hikari_tpu.io.scenes import cornell_config
from hikari_tpu.parallel import (
    make_mesh,
    make_sharded_render,
    make_train_step,
    replicate,
    shard_state,
)
from hikari_tpu.render import initial_state, render_frame_jit
from hikari_tpu.scene import build_scene_buffers


@pytest.fixture(scope="module")
def setup():
    scene, cam, _ = cornell_config(size=32)
    settings = RenderSettings(
        width=32, height=32, upscale=Upscale.none(), denoise=True,
        taa=Taa.NONE, indirect_bounces=1,
    )
    return build_scene_buffers(scene), cam, settings


def test_eight_devices_available():
    assert len(jax.devices()) >= 8, jax.devices()


def test_sharded_matches_unsharded(setup):
    buffers, cam, settings = setup
    state = initial_state(settings)
    out_ref, _ = render_frame_jit(buffers, cam, state, settings)

    mesh = make_mesh(jax.devices()[:8])
    with mesh:
        b = replicate(buffers, mesh)
        c = replicate(cam, mesh)
        s = shard_state(state, mesh)
        step = make_sharded_render(settings, mesh)
        out_sh, _ = step(b, c, s)
    np.testing.assert_allclose(
        np.asarray(out_ref.image), np.asarray(out_sh.image), atol=2e-5
    )


def test_train_step_sharded(setup):
    buffers, cam, settings = setup
    state = initial_state(settings)
    mesh = make_mesh(jax.devices()[:8])
    target = jnp.zeros(settings.output_size + (3,))
    with mesh:
        b = replicate(buffers, mesh)
        s = shard_state(state, mesh)
        step = make_train_step(settings)
        loss, grads, out, new_state = step(b, cam, s, target)
    assert np.isfinite(float(loss))
    g = np.asarray(grads["mat_base_color"])
    assert np.isfinite(g).all() and np.abs(g).sum() > 0


def test_dryrun_multichip_contract():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_2d_tile_sharding_matches(setup):
    """2D (rows x cols) tile mesh: GSPMD handles both-axis halos; result
    must equal single-device."""
    from hikari_tpu.parallel import make_mesh_2d, shard_state_2d

    buffers, cam, settings = setup
    state = initial_state(settings)
    out_ref, _ = render_frame_jit(buffers, cam, state, settings)

    mesh = make_mesh_2d((2, 4))
    with mesh:
        b = jax.tree_util.tree_map(
            lambda x: jax.device_put(
                x, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
            ),
            buffers,
        )
        s = shard_state_2d(state, mesh)
        out_sh, _ = render_frame_jit(b, cam, s, settings)
    np.testing.assert_allclose(
        np.asarray(out_ref.image), np.asarray(out_sh.image), atol=2e-5
    )


def test_multihost_step_keeps_pallas_tracer(setup, monkeypatch):
    """Round-2 VERDICT item 3: make_multihost_train_step must hand the
    mesh to make_train_step so trace backends run under an active
    shard_tracing context spanning BOTH (hosts, chips) axes — without it
    the step silently rewrote tracer='auto' to 'auto_xla' and lost the
    fused Pallas tile-walk (measured 4.2x slower on FlightHelmet)."""
    import contextlib

    from hikari_tpu.parallel import multihost
    from hikari_tpu.trace import api as trace_api

    buffers, cam, settings = setup
    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = jax.sharding.Mesh(devices, multihost.HOST_AXES)

    seen = {}
    real = trace_api.shard_tracing

    @contextlib.contextmanager
    def spy(mesh_arg, axis=None):
        seen["mesh_axes"] = tuple(mesh_arg.axis_names)
        with real(mesh_arg, axis):
            seen["ctx_axes"] = tuple(trace_api._SHARD_CTX[-1][1])
            yield

    monkeypatch.setattr(trace_api, "shard_tracing", spy)
    step = multihost.make_multihost_train_step(settings, mesh)
    state = multihost.host_local_state(settings, mesh)
    target = jnp.zeros(settings.output_size + (3,))
    with mesh:
        b = multihost.replicate_host_local(buffers, mesh)
        loss, grads, out, _ = step(b, cam, state, target)
    assert np.isfinite(float(loss))
    g = np.asarray(grads["mat_base_color"])
    assert np.isfinite(g).all() and np.abs(g).sum() > 0
    # The context was entered with the host mesh and covers both axes.
    assert seen["mesh_axes"] == multihost.HOST_AXES
    assert seen["ctx_axes"] == multihost.HOST_AXES

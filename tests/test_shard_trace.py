"""shard_map dispatch for the Pallas tracer backends (trace.shard_tracing):
under a sharded pipeline, pallas_call has no GSPMD partitioning rule, so
the sharded entry points wrap it in shard_map — rays shard across the
mesh, the scene replicates, results must equal the unsharded trace
exactly (same kernel, same rays per shard)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hikari_tpu.config import RenderSettings, Taa, Upscale
from hikari_tpu.io.scenes import cornell_config
from hikari_tpu.parallel import make_mesh, make_sharded_render, replicate, shard_state
from hikari_tpu.render import initial_state, render_frame_jit
from hikari_tpu.scene import build_scene_buffers
from hikari_tpu.trace import shard_tracing, trace_rays


@pytest.fixture(scope="module")
def rays(cornell_buffers, rng):
    # 1000 rays: NOT a multiple of 8 devices -> exercises the pad path.
    R = 1000
    o = jnp.asarray(rng.uniform(-0.8, 0.8, (R, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(R, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


@pytest.mark.parametrize("method", ["pallas_tiled", "pallas", "scatter"])
def test_sharded_trace_matches_unsharded(cornell_buffers, rays, method):
    o, d = rays
    ref = trace_rays(cornell_buffers, o, d, method=method)

    mesh = make_mesh(jax.devices()[:8])
    with shard_tracing(mesh, "tiles"):
        sh = trace_rays(cornell_buffers, o, d, method=method)
    for f in ("t", "prim", "inst", "u", "v"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, f)), np.asarray(getattr(sh, f)), err_msg=f
        )


def test_sharded_trace_2d_mesh(cornell_buffers, rays):
    """Rays shard over BOTH axes of a ("hosts", "chips") mesh — the pod
    layout dryrun_multichip uses."""
    o, d = rays
    ref = trace_rays(cornell_buffers, o, d, method="pallas_tiled")
    mesh = jax.sharding.Mesh(
        np.array(jax.devices()[:8]).reshape(2, 4), ("hosts", "chips")
    )
    with shard_tracing(mesh):  # default: all mesh axes
        sh = trace_rays(cornell_buffers, o, d, method="pallas_tiled")
    np.testing.assert_array_equal(np.asarray(ref.prim), np.asarray(sh.prim))
    np.testing.assert_array_equal(np.asarray(ref.t), np.asarray(sh.t))


def test_sharded_trace_restricted_query(cornell_buffers, rays):
    """Per-ray primitive-range restriction + exclusion survive the wrap
    (the NEE target-ray contract, render/sampling.py)."""
    o, d = rays
    R = o.shape[0]
    lo = jnp.zeros((R,), jnp.int32)
    hi = jnp.full((R,), min(12, cornell_buffers.num_tris), jnp.int32)
    excl = jnp.full((R,), 2, jnp.int32)
    kw = dict(range_lo=lo, range_hi=hi, exclude_instance=excl)
    ref = trace_rays(cornell_buffers, o, d, method="pallas_tiled", **kw)
    mesh = make_mesh(jax.devices()[:8])
    with shard_tracing(mesh, "tiles"):
        sh = trace_rays(cornell_buffers, o, d, method="pallas_tiled", **kw)
    np.testing.assert_array_equal(np.asarray(ref.prim), np.asarray(sh.prim))


def test_sharded_pipeline_with_pallas_tracer():
    """Full sharded render step with tracer="pallas_tiled": the shard_map
    wrap must compose with GSPMD around it and match unsharded output."""
    scene, cam, _ = cornell_config(size=32)
    settings = RenderSettings(
        width=32, height=32, upscale=Upscale.none(), denoise=True,
        taa=Taa.NONE, indirect_bounces=1, tracer="pallas_tiled",
    )
    buffers = build_scene_buffers(scene)
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

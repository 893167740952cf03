"""Manual halo-exchange path (shard_map + ppermute): the hand-rolled
collectives must reproduce the dense single-device stencil exactly
(SURVEY.md §2.4 item 1)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hikari_tpu.parallel.halo import halo_exchange_rows, sharded_atrous_level
from hikari_tpu.utils import ATROUS_KERNEL


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:8]), ("tiles",))


def test_halo_exchange_rows(mesh, rng):
    H, W = 64, 16
    x = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
    r = 3
    from jax import shard_map

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("tiles", None),),
        out_specs=(P("tiles", None), P("tiles")),
        check_vma=False,
    )
    def f(x_loc):
        out, valid = halo_exchange_rows(x_loc, r)
        return out, valid

    out, valid = f(x)
    out = np.asarray(out)
    valid = np.asarray(valid)
    h_loc = H // 8
    out = out.reshape(8, h_loc + 2 * r, W)
    valid = valid.reshape(8, h_loc + 2 * r)
    xs = np.asarray(x)
    for i in range(8):
        center = out[i, r : r + h_loc]
        np.testing.assert_array_equal(center, xs[i * h_loc : (i + 1) * h_loc])
        if i > 0:
            np.testing.assert_array_equal(
                out[i, :r], xs[i * h_loc - r : i * h_loc]
            )
            assert valid[i, :r].all()
        else:
            assert not valid[i, :r].any()
        if i < 7:
            np.testing.assert_array_equal(
                out[i, r + h_loc :], xs[(i + 1) * h_loc : (i + 1) * h_loc + r]
            )
            assert valid[i, r + h_loc :].all()
        else:
            assert not valid[i, r + h_loc :].any()


def test_sharded_atrous_level_matches_dense(mesh, rng):
    H, W, step = 64, 32, 4
    irr = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0.2, 1.0, size=(H, W)).astype(np.float32))

    def weight_fn(center_g, tap_g, dy, dx):
        return jnp.exp(-jnp.abs(center_g["depth"] - tap_g["depth"]))

    out = sharded_atrous_level(
        irr, {"depth": depth}, step, mesh, ATROUS_KERNEL, weight_fn
    )

    # Dense reference with identical out-of-bounds skipping.
    acc = np.asarray(irr) * ATROUS_KERNEL[1][1]
    wsum = np.full((H, W), ATROUS_KERNEL[1][1], np.float32)
    d = np.asarray(depth)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == dx == 0:
                continue
            for y in range(H):
                yy = y + dy * step
                if not (0 <= yy < H):
                    continue
                xs0 = np.arange(W) + dx * step
                okx = (xs0 >= 0) & (xs0 < W)
                xs_c = np.clip(xs0, 0, W - 1)
                w = np.exp(-np.abs(d[y] - d[yy, xs_c])) * ATROUS_KERNEL[dy + 1][dx + 1]
                w = np.where(okx, w, 0.0)
                acc[y] += np.asarray(irr)[yy, xs_c] * w[:, None] * okx[:, None]
                wsum[y] += w
    dense = acc / np.maximum(wsum[..., None], 1e-4)
    np.testing.assert_allclose(np.asarray(out), dense, atol=1e-5)


def _sharded_setup():
    from hikari_tpu.config import RenderSettings, Taa, Upscale
    from hikari_tpu.io.scenes import cornell_config
    from hikari_tpu.render import initial_state
    from hikari_tpu.scene import build_scene_buffers

    scene, cam, _ = cornell_config(size=64)
    settings = RenderSettings(
        width=64, height=64, upscale=Upscale.none(), taa=Taa.NONE,
        denoise=True, indirect_bounces=1,
    )
    buffers = build_scene_buffers(scene)
    state = initial_state(settings)
    return buffers, cam, state, settings


def test_manual_halo_denoise_matches_gspmd(mesh):
    """The full pipeline with the shard_map manual-halo denoiser equals
    the GSPMD-resharded denoiser (same level body, different transport)."""
    from hikari_tpu.parallel import (
        make_sharded_render,
        replicate,
        shard_state,
    )

    buffers, cam, state, settings = _sharded_setup()
    with mesh:
        b = replicate(buffers, mesh)
        c = replicate(cam, mesh)
        s = shard_state(state, mesh)
        auto = make_sharded_render(settings, mesh)
        manual = make_sharded_render(settings, mesh, manual_halo_denoise=True)
        out_a, _ = auto(b, c, s)
        out_m, _ = manual(b, c, s)
    np.testing.assert_allclose(
        np.asarray(out_a.image), np.asarray(out_m.image), atol=2e-5
    )


def test_halo_collective_volume(mesh):
    """Measure manual-halo vs GSPMD communication on the ISOLATED channel
    denoiser: the manual path ppermutes only (8+4+2+1)-row halos per field
    per level; GSPMD inserts collectives around every roll. Assert the
    manual denoiser's compiled collective volume is strictly smaller
    (HLO-level measurement — the VERDICT item 8 'measure vs GSPMD' gate,
    runnable without multi-chip hardware). Measured on this 8-way mesh at
    64x64: manual 38 collective-permutes / 44k elements vs GSPMD's
    102 / 75k."""
    import re

    from jax.sharding import NamedSharding

    from hikari_tpu.parallel.halo import denoise_channel_sharded
    from hikari_tpu.render.denoise import denoise_channel
    from hikari_tpu.render.types import GBuffer

    buffers, cam, state, settings = _sharded_setup()
    rh, rw = settings.render_size

    def shard(x):
        spec = P("tiles", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    rad = shard(jnp.ones((rh, rw, 3)) * 0.5)
    var = shard(jnp.ones((rh, rw)) * 0.1)
    alb = shard(jnp.ones((rh, rw, 3)) * 0.8)
    gb = jax.tree_util.tree_map(shard, GBuffer.zeros(settings.output_size))

    fn_auto = jax.jit(
        lambda r, v, a, g: denoise_channel(r, v, a, g, jnp.int32(3), settings)
    )
    fn_manual = jax.jit(
        lambda r, v, a, g: denoise_channel_sharded(
            r, v, a, g, jnp.int32(3), settings, mesh=mesh, axis_name="tiles"
        )
    )

    def collective_volume(fn):
        txt = fn.lower(rad, var, alb, gb).compile().as_text()
        total = 0
        for m in re.finditer(
            r"=\s*\(?[a-z0-9]+\[([0-9,]*)\][^\n]*?"
            r"\b(collective-permute|all-gather|all-to-all)[\w-]*\(",
            txt,
        ):
            dims = [int(d) for d in m.group(1).split(",") if d]
            n = 1
            for d in dims:
                n *= d
            total += n
        return total

    with mesh:
        vol_auto = collective_volume(fn_auto)
        vol_manual = collective_volume(fn_manual)
        # Numerics identical too.
        np.testing.assert_allclose(
            np.asarray(fn_auto(rad, var, alb, gb)),
            np.asarray(fn_manual(rad, var, alb, gb)),
            atol=1e-6,
        )
    print(f"collective elements: auto={vol_auto} manual={vol_manual}")
    assert vol_manual < vol_auto, (vol_manual, vol_auto)

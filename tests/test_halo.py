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

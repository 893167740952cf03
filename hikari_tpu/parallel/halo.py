"""Explicit halo exchange for row-sharded screen tiles (shard_map).

SURVEY.md §2.4: cross-tile stencils — the spatial-reuse spiral (<=20 px,
reference light.wgsl:250-252) and the à-trous kernel (<=8 px steps,
denoise.wgsl:101-114) — need neighbor rows when the pixel grid shards
across chips. The default pipeline path lets GSPMD insert these
collectives automatically (tested equal to single-device in
tests/test_sharding.py); this module is the hand-rolled alternative:
``jax.lax.ppermute`` ring exchanges over the ``tiles`` mesh axis moving
exactly the halo rows over ICI, for kernels that want manual control of
communication (and as the substrate for fully halo-local pipelines).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def halo_exchange_rows(x, radius: int, axis_name: str = "tiles"):
    """Inside shard_map: pad a row-sharded block with ``radius`` rows from
    each neighbor shard. x: (h_loc, ...) -> (h_loc + 2*radius, ...),
    plus a validity mask (h_loc + 2*radius,) — halo rows beyond the first/
    last shard are zero-filled and masked invalid (matching the
    reference's skip-out-of-bounds stencil taps)."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    # Send my bottom rows downward (i -> i+1): received block is the
    # ABOVE-neighbor's bottom rows.
    perm_down = [(i, i + 1) for i in range(n - 1)]
    from_above = jax.lax.ppermute(x[-radius:], axis_name, perm=perm_down)
    # Send my top rows upward (i -> i-1): received block is the BELOW-
    # neighbor's top rows.
    perm_up = [(i, i - 1) for i in range(1, n)]
    from_below = jax.lax.ppermute(x[:radius], axis_name, perm=perm_up)

    out = jnp.concatenate([from_above, x, from_below], axis=0)

    h_loc = x.shape[0]
    valid_top = jnp.broadcast_to(idx > 0, (radius,))
    valid_bottom = jnp.broadcast_to(idx < n - 1, (radius,))
    valid = jnp.concatenate(
        [valid_top, jnp.ones((h_loc,), dtype=bool), valid_bottom]
    )
    return out, valid


def denoise_channel_sharded(
    radiance,
    variance,
    albedo_rr,
    gbuffer,
    frame_number,
    settings,
    mesh: Mesh,
    axis_name: str = "tiles",
):
    """The full SVGF channel denoiser with MANUAL halo exchange: each of
    the 4 à-trous levels runs shard-locally after one ppermute of exactly
    ``step`` rows per side per field, instead of letting GSPMD re-shard
    whole arrays around every jnp.roll. Numerically identical to
    render/denoise.denoise_channel — the level body is shared
    (render/denoise.atrous_level); only the tap transport differs.
    Communication: 2 ppermutes x 5 fields x 4 levels moving
    (8+4+2+1)-row halos, vs GSPMD's collective-permutes of full shards
    per roll (measured in tests/test_halo.py::test_halo_collective_volume).
    """
    from hikari_tpu.config import F32_EPSILON
    from hikari_tpu.render.denoise import (
        STEP_SIZES,
        _deferred_maps,
        demodulate,
        filtered_variance,
    )

    depth, normal, grad, inst = _deferred_maps(gbuffer, settings, frame_number)
    background = depth < F32_EPSILON

    irradiance = demodulate(radiance, albedo_rr)
    var = filtered_variance(variance)

    for step in STEP_SIZES:
        irradiance = _halo_atrous_level(
            irradiance, var, depth, normal, grad, inst, settings, step,
            mesh, axis_name,
        )

    out = irradiance * albedo_rr
    return jnp.where(background[..., None], 0.0, out)


def _halo_atrous_level(
    irradiance, var, depth, normal, grad, inst, settings, step: int,
    mesh: Mesh, axis_name: str,
):
    from jax import shard_map

    from hikari_tpu.render.denoise import atrous_level

    def spec(x):
        return P(axis_name, *([None] * (x.ndim - 1)))

    args = (irradiance, var, depth, normal, grad, inst)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=tuple(spec(a) for a in args),
        out_specs=P(axis_name, None, None),
        check_vma=False,
    )
    def level(irr_l, var_l, depth_l, normal_l, grad_l, inst_l):
        r = step
        h_loc, w = irr_l.shape[0], irr_l.shape[1]
        padded = {}
        irr_p, row_valid = halo_exchange_rows(irr_l, r, axis_name)
        padded["irr"] = irr_p
        for name, f in (("normal", normal_l), ("depth", depth_l), ("inst", inst_l)):
            padded[name], _ = halo_exchange_rows(f, r, axis_name)

        def tap(name, dy, dx):
            ys = r + dy * step
            t = jax.lax.dynamic_slice_in_dim(padded[name], ys, h_loc, 0)
            rv = jax.lax.dynamic_slice_in_dim(row_valid, ys, h_loc, 0)
            t = jnp.roll(t, -dx * step, axis=1)
            xs = jnp.arange(w)[None, :] + dx * step
            col_ok = (xs >= 0) & (xs < w)
            return t, rv[:, None] & col_ok

        return atrous_level(
            irr_l, var_l, (depth_l, normal_l, grad_l, inst_l), settings, tap
        )

    return level(*args)


def sharded_atrous_level(
    irradiance,  # (H, W, 3) row-sharded
    weight_maps,  # dict of (H, W[,C]) row-sharded guide images
    step: int,
    mesh: Mesh,
    kernel,
    weight_fn,
    axis_name: str = "tiles",
):
    """One edge-aware à-trous level computed shard-locally after a single
    halo exchange of ``step`` rows per side. ``weight_fn(center_guides,
    tap_guides, dy, dx) -> (h, w)`` supplies the edge-stopping weight;
    ``kernel`` is the 3x3 coefficient table. Demonstrates the
    halo-exchange formulation; numerically identical to the dense level
    (tests/test_halo.py)."""
    from jax import shard_map

    names = sorted(weight_maps)
    guide_list = [weight_maps[k] for k in names]

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis_name, None, None),)
        + tuple(
            P(axis_name, *([None] * (g.ndim - 1))) for g in guide_list
        ),
        out_specs=P(axis_name, None, None),
        check_vma=False,
    )
    def level(irr_loc, *guides_loc):
        r = step
        irr_h, valid_rows = halo_exchange_rows(irr_loc, r, axis_name)
        guides_h = [
            halo_exchange_rows(g, r, axis_name)[0] for g in guides_loc
        ]
        h_loc, w = irr_loc.shape[0], irr_loc.shape[1]

        center_g = {k: g[r : r + h_loc] for k, g in zip(names, guides_h)}
        acc = irr_loc * kernel[1][1]
        wsum = jnp.full((h_loc, w), kernel[1][1])
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                ys = r + dy * step
                tap_irr = jax.lax.dynamic_slice_in_dim(irr_h, ys, h_loc, 0)
                tap_g = {
                    k: jax.lax.dynamic_slice_in_dim(g, ys, h_loc, 0)
                    for k, g in zip(names, guides_h)
                }
                row_ok = jax.lax.dynamic_slice_in_dim(
                    valid_rows, ys, h_loc, 0
                )[:, None]
                # Horizontal taps stay local (row sharding): shift + mask.
                tap_irr = jnp.roll(tap_irr, -dx * step, axis=1)
                tap_g = {k: jnp.roll(g, -dx * step, axis=1) for k, g in tap_g.items()}
                xs = jnp.arange(w)[None, :] + dx * step
                col_ok = (xs >= 0) & (xs < w)
                ok = row_ok & col_ok
                wgt = weight_fn(center_g, tap_g, dy, dx) * kernel[dy + 1][dx + 1]
                wgt = jnp.where(ok, wgt, 0.0)
                acc = acc + tap_irr * wgt[..., None]
                wsum = wsum + wgt
        return acc / jnp.maximum(wsum[..., None], 1e-4)

    return level(irradiance, *guide_list)

"""Shared shader-library math — jnp equivalents of the reference's WGSL
utility module (src/shaders/utils.wgsl:1-66) plus small linear-algebra
helpers. Everything is shape-polymorphic over leading batch dims and pure,
so it vectorizes across the pixel grid for free.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

TAU = 6.283185307
INV_TAU = 0.159154943
PI = 3.1415926


def luminance(v):
    """Rec.709 luminance (reference src/shaders/utils.wgsl:62-65).
    ``v``: (..., 3) -> (...)."""
    return (
        0.2126 * v[..., 0] + 0.7152 * v[..., 1] + 0.0722 * v[..., 2]
    )


def saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def dot3(a, b):
    """Batched vec3 dot: (...,3),(...,3) -> (...)."""
    return jnp.sum(a * b, axis=-1)


def normalize(v, eps: float = 0.0):
    """Normalize last axis. With eps=0 mirrors WGSL ``normalize``
    (undefined on zero vectors — produces inf/nan like the GPU would).
    With eps>0 the guard goes INSIDE the sqrt: ``sqrt(max(|v|^2, eps^2))``
    — guarding after (``max(sqrt(n2), eps)``) leaves d(sqrt)/d(n2) = inf
    at n2 = 0, and 0 * inf = NaN in the backward pass."""
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    if eps:
        n2 = jnp.maximum(n2, eps * eps)
    return v / jnp.sqrt(n2)


def safe_normalize(v):
    return normalize(v, eps=1e-18)


def safe_sqrt0(x):
    """``sqrt(max(x, 0))`` with a FINITE backward at 0 (zero
    subgradient). d(sqrt)/dx is inf at x == 0; flat image regions make
    neighborhood variances EXACTLY 0, and the chain's zero cotangent
    times inf poisons the backward with NaN — measured as 25% cotangent
    NaN-scrub engagement at the SMAA/tonemap firewalls on cornell
    (tools/clip_engagement.py, round 4) before this guard."""
    pos = x > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def length(v):
    return jnp.sqrt(jnp.sum(v * v, axis=-1))


def distance(a, b):
    return length(a - b)


def cross(a, b):
    return jnp.cross(a, b)


def reflect(i, n):
    """WGSL ``reflect``: i - 2*dot(n,i)*n."""
    return i - 2.0 * dot3(n, i)[..., None] * n


def mix(a, b, t):
    return a + (b - a) * t


def fract(x):
    return x - jnp.floor(x)


def nan_to_zero(x):
    return jnp.where(jnp.isnan(x), 0.0, x)


def any_is_nan_vec(x):
    """(...,C) -> (...) bool; reference utils.wgsl:7-13."""
    return jnp.any(jnp.isnan(x), axis=-1)


def pcg_hash(value):
    """Integer hash (reference src/shaders/utils.wgsl:15-25)."""
    state = jnp.asarray(value, dtype=jnp.uint32)
    state = state ^ jnp.uint32(2747636419)
    state = state * jnp.uint32(2654435769)
    state = state ^ (state >> 16)
    state = state * jnp.uint32(2654435769)
    state = state ^ (state >> 16)
    state = state * jnp.uint32(2654435769)
    return state


def random_float(value):
    """u32 -> [0,1] float (reference src/shaders/utils.wgsl:27-29)."""
    return pcg_hash(value).astype(jnp.float32) / 4294967295.0


def clip_to_uv(clip):
    """Clip space (...,4) -> uv in [0,1]^2, y down
    (reference src/shaders/utils.wgsl:31-36)."""
    uv = clip[..., :2] / clip[..., 3:4]
    uv = (uv + 1.0) * 0.5
    return jnp.stack([uv[..., 0], 1.0 - uv[..., 1]], axis=-1)


def coords_to_uv(coords, size_hw):
    """Integer pixel coords (...,2) [x,y] + (h, w) -> uv center
    (reference src/shaders/utils.wgsl:38-40; size there is (w,h))."""
    h, w = size_hw
    wh = jnp.asarray([w, h], dtype=jnp.float32)
    return (coords.astype(jnp.float32) + 0.5) / wh


def uv_grid(size_hw):
    """Pixel-center uv grid for an (h, w) image -> (h, w, 2) [u, v]."""
    h, w = size_hw
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    return jnp.stack([(xs + 0.5) / w, (ys + 0.5) / h], axis=-1)


def normal_basis(n):
    """Branchless orthonormal tangent frame (reference
    src/shaders/utils.wgsl:42-49, the Duff et al. method).
    ``n``: (...,3) -> (...,3,3) whose COLUMNS are (t, b, n), so
    ``basis @ v`` maps local (tangent-space) vectors to world space,
    matching WGSL ``mat3x3(t, b, n) * v``."""
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    s = jnp.minimum(jnp.sign(nz) * 2.0 + 1.0, 1.0)
    u = -1.0 / (s + nz)
    v = nx * ny * u
    t = jnp.stack([1.0 + s * nx * nx * u, s * v, -s * nx], axis=-1)
    b = jnp.stack([v, s + ny * ny * u, -ny], axis=-1)
    return jnp.stack([t, b, n], axis=-1)  # columns


def halton(base: int, index: int) -> float:
    """Scalar Halton sequence term (host-side; reference utils.wgsl:52-59)."""
    result, f = 0.0, 1.0
    i = index
    while i > 0:
        f /= base
        result += f * (i % base)
        i //= base
    return result


def halton23_sequence(count: int) -> np.ndarray:
    """(count, 2) Halton(2,3) points — the reference's jitter table
    (src/view.rs:130-139 packs 16 of these into 8 vec4s)."""
    return np.array(
        [[halton(2, i), halton(3, i)] for i in range(count)], dtype=np.float32
    )


# The reference's 3x3 à-trous kernel (src/view.rs:125-129).
ATROUS_KERNEL = np.array(
    [
        [0.0625, 0.125, 0.0625],
        [0.125, 0.25, 0.125],
        [0.0625, 0.125, 0.0625],
    ],
    dtype=np.float32,
)

# 16 Halton(2,3) jitter points (reference src/view.rs:130-139, HALTON const).
HALTON_JITTER = halton23_sequence(16)


def gather_channels(table, idx):
    """Gather rows of ``table`` (N,) or (N, C) at ``idx`` (...,).

    Multi-channel rows are fetched in ONE row gather: measured on v5e
    (tools/bench_gather.py), a TPU gather costs ~7.5 ns per OUTPUT ROW
    almost regardless of row width (2M scalar rows 15.7 ms; 2M 4-wide
    rows 12 ms; 16-wide 49 ms), so C per-channel plane gathers cost ~C
    times one packed row gather. The round-1 channel-plane loop (kept
    for ndim==1) predates this measurement; the (R, C) result's lane
    padding is transient and far cheaper than C full gathers.

    Differentiable tables with few rows should use ``mxu_table_gather``
    (one-hot-matmul VJP; 5x the scatter transpose on v5e)."""
    idx = jnp.asarray(idx)
    if table.ndim == 1:
        return table[idx]
    rows = table.reshape(-1, table.shape[-1])[idx.reshape(-1)]
    return rows.reshape(idx.shape + (table.shape[-1],))


import functools as _functools
import jax as _jax

# Small-table gathers in the differentiable path: the default transpose of
# a gather is an XLA scatter-add, which the TPU executes ~5x slower than a
# blocked one-hot matmul riding the MXU (measured v5e, 2M rows x 25 ch
# into 40 rows: scatter 16.0 ms vs one-hot 3.2 ms). Only worthwhile when
# the table is small (the one-hot is (block, K)); callers gate on K.
MXU_GATHER_MAX_ROWS = 4096
_MXU_BLOCK = 131072


@_jax.custom_vjp
def _mxu_gather_rows(table, idx):
    return table[idx]


def _mxu_gather_rows_fwd(table, idx):
    return table[idx], (idx, table.shape)


def _mxu_gather_rows_bwd(res, g):
    idx, tshape = res
    K = tshape[0]
    gf = g.reshape(-1, tshape[1])
    flat_idx = idx.reshape(-1)
    n = gf.shape[0]
    npad = -(-n // _MXU_BLOCK) * _MXU_BLOCK
    if npad != n:
        gf = jnp.concatenate(
            [gf, jnp.zeros((npad - n, gf.shape[1]), gf.dtype)]
        )
        flat_idx = jnp.concatenate(
            [flat_idx, jnp.zeros((npad - n,), flat_idx.dtype)]
        )
        # Padded rows carry zero cotangent, so index 0 receives nothing.
    idx_b = flat_idx.reshape(-1, _MXU_BLOCK)
    g_b = gf.reshape(-1, _MXU_BLOCK, gf.shape[1])

    def body(acc, xb):
        ib, gb = xb
        oh = (ib[:, None] == jnp.arange(K)[None, :]).astype(gb.dtype)
        return acc + oh.T @ gb, None

    acc, _ = _jax.lax.scan(
        body, jnp.zeros((K, gf.shape[1]), gf.dtype), (idx_b, g_b)
    )
    return acc, None


_mxu_gather_rows.defvjp(_mxu_gather_rows_fwd, _mxu_gather_rows_bwd)


def mxu_table_gather(table, idx):
    """``gather_channels`` with a one-hot-matmul VJP: the table cotangent
    is a blocked segment-sum on the MXU instead of an XLA scatter-add
    (5x faster on v5e for few-row tables — see MXU_GATHER_MAX_ROWS).
    Falls back to the plain gather for large tables (the one-hot matmul
    scales with K) or non-2D tables."""
    idx = jnp.asarray(idx)
    if table.shape[0] > MXU_GATHER_MAX_ROWS:
        return gather_channels(table, idx)
    if table.ndim == 1:
        rows = _mxu_gather_rows(table[:, None], idx.reshape(-1))
        return rows.reshape(idx.shape)
    rows = _mxu_gather_rows(
        table.reshape(table.shape[0], -1), idx.reshape(-1)
    )
    return rows.reshape(idx.shape + table.shape[1:])


def gather_pixels(img, y, x):
    """Gather image texels: img (H, W) or (H, W, C) at integer grids
    y/x (...,) -> (...,) or (..., C). One row gather for all channels
    (see gather_channels for the measured cost model)."""
    h, w = img.shape[0], img.shape[1]
    flat_idx = (y * w + x).reshape(-1)
    out_shape = jnp.shape(y)
    if img.ndim == 2:
        return img.reshape(h * w)[flat_idx].reshape(out_shape)
    rows = img.reshape(h * w, img.shape[-1])[flat_idx]
    return rows.reshape(out_shape + (img.shape[-1],))


def rgb_to_ycocg(rgb):
    """(...,3) RGB -> YCoCg (reference src/shaders/taa.wgsl:20-26)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = r / 4.0 + g / 2.0 + b / 4.0
    co = r / 2.0 - b / 2.0
    cg = -r / 4.0 + g / 2.0 - b / 4.0
    return jnp.stack([y, co, cg], axis=-1)


def ycocg_to_rgb(ycocg):
    """(reference src/shaders/taa.wgsl:28-34) — clamps to [0,1]."""
    y, co, cg = ycocg[..., 0], ycocg[..., 1], ycocg[..., 2]
    r = y + co - cg
    g = y + cg
    b = y - co - cg
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 1.0)

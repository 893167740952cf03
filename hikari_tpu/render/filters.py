"""Texture-sampling primitives: the jnp analogues of the reference's
nearest/linear samplers and ``textureGather`` (used throughout
src/shaders/{taa,smaa,denoise}.wgsl). Clamp-to-edge addressing, image
layout (h, w, c), uv = (u right, v down) like WGSL."""

from __future__ import annotations

import jax.numpy as jnp

from hikari_tpu.utils import gather_pixels


def _uv_to_xy(img, uv):
    h, w = img.shape[0], img.shape[1]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    return x, y, h, w


def nearest_sample(img, uv):
    """textureSampleLevel(..., nearest) — (...,2) uv -> (..., c)."""
    h, w = img.shape[0], img.shape[1]
    x = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    return gather_pixels(img, y, x)


def edge_shift(img, dy: int, dx: int):
    """out[y, x] = img[clip(y + dy), clip(x + dx)] — a static shift with
    exact clamp-to-edge addressing, built from pad(edge) + slice: zero
    gathers (TPU gathers cost ~7.5 ns per output row; rolls/slices are
    ~20x cheaper — tools/bench_gather.py)."""
    h, w = img.shape[0], img.shape[1]
    ay, by = max(-dy, 0), max(dy, 0)
    ax, bx = max(-dx, 0), max(dx, 0)
    pad = [(ay, by), (ax, bx)] + [(0, 0)] * (img.ndim - 2)
    padded = jnp.pad(img, pad, mode="edge")
    return padded[dy + ay : dy + ay + h, dx + ax : dx + ax + w]


def _padded_planes(img, dys, dxs):
    """ONE 2D edge pad per channel plane, sized for the (dys x dxs) tap
    window; every tap is then a pure static slice of a padded plane.

    Keeping each pad rank-2 is load-bearing on TPU: a materialized
    (H, W, 1) pad output bitcasts to a (1, H*W) buffer whose size-1 minor
    dim lane-pads 1 -> 128 (~1 GB per 1080p plane — the round-2 driver
    bench OOM, BENCH_r02.json / VERDICT.md item 1). 2D (H, W) planes tile
    (8, 128) on (rows, cols) with negligible padding.

    Returns (planes, (pad_top, pad_left), (h, w))."""
    h, w = img.shape[0], img.shape[1]
    dys, dxs = list(dys), list(dxs)
    pt, pb = max(-min(dys), 0), max(max(dys), 0)
    pl, pr = max(-min(dxs), 0), max(max(dxs), 0)
    chans = [img] if img.ndim == 2 else [img[..., c] for c in range(img.shape[-1])]
    planes = [jnp.pad(c, ((pt, pb), (pl, pr)), mode="edge") for c in chans]
    return planes, (pt, pl), (h, w)


def pack_rows(parts):
    """Pack K same-shape 2D planes into a (H*W, K) row table whose rows a
    single gather can fetch.

    Layout discipline (the round-2/3 OOM lesson, BENCH_r02.json +
    tools/tpu_gate.py): any stack/concat whose operands carry a SIZE-1
    dim invites XLA to materialize operand copies with the unit dim in
    the LANE position — measured on both ``stack(parts, -1)`` (operands
    (H*W, 1)) and ``stack(parts, 0)`` (operands bitcast (1, H*W),
    layout {0,1}) — each copy lane-padding 1 -> 128 to ~1 GB at 1080p
    (90-128 GB of pure padding across the step). So: concatenate the
    FLATTENED 1D planes (operands f32[H*W], no unit dim to abuse), then
    bitcast-reshape to (K, H*W) and pay ONE explicit transpose. With K at
    the 128-lane boundary both the transpose output and the gather rows
    pad zero."""
    K = len(parts)
    flat = jnp.concatenate([p.reshape(-1) for p in parts])  # (K*H*W,)
    return flat.reshape(K, -1).T  # (H*W, K)


def gather_packed_rows(packed_rows, w, ky, kx):
    """Fetch rows of a pack_rows table at integer pixel grids (ky, kx)
    of the source (h, w) image -> (..., K).

    The gathered rows are checkpoint-named so the pass-level remat
    policy (pipeline.py save_only_these_names) can SAVE them: the
    backward sweep then skips re-running the pack build + gather
    (~30-70 ms per image pass at 1080p) at the cost of keeping the
    (rows, K) table slice alive (~0.25-1 GB per pass, inside the 14 GiB
    gate budget)."""
    from jax.ad_checkpoint import checkpoint_name

    flat = (ky * w + kx).reshape(-1)
    rows = packed_rows[flat]
    rows = checkpoint_name(rows, "packed_rows")
    return rows.reshape(jnp.shape(ky) + (packed_rows.shape[-1],))


def _corner_pack(img):
    """Channels of the 2x2 quad at (y, x) as a (H*W, 4C) row table —
    [c00 | c10(x+1) | c01(y+1) | c11(y+1,x+1)], clamp-to-edge. One row
    gather fetches all four bilinear corners. Built from 2D per-channel
    pads + slices (see _padded_planes / pack_rows)."""
    planes, (pt, pl), (h, w) = _padded_planes(img, (0, 1), (0, 1))
    parts = [
        p[pt + dy : pt + dy + h, pl + dx : pl + dx + w]
        for (dy, dx) in ((0, 0), (0, 1), (1, 0), (1, 1))
        for p in planes
    ]
    return pack_rows(parts), w


def bilinear_sample(img, uv):
    """textureSampleLevel(..., linear) with clamp addressing. The 2x2
    corner quad is pre-packed into row channels (3 static edge-shifts)
    so the dynamic fetch is ONE row gather instead of four."""
    x, y, h, w = _uv_to_xy(img, uv)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    # At the high edge the packed c10/c01/c11 clamp to the same texel,
    # matching clip(x0i + 1, 0, w - 1).
    C = img.shape[-1] if img.ndim == 3 else 1
    packed, pw = _corner_pack(img)
    quad = gather_packed_rows(packed, pw, y0i, x0i)  # (..., 4C)
    c00, c10, c01, c11 = (
        quad[..., 0:C], quad[..., C:2 * C],
        quad[..., 2 * C:3 * C], quad[..., 3 * C:4 * C],
    )
    if img.ndim == 2:
        c00, c10, c01, c11 = (c[..., 0] for c in (c00, c10, c01, c11))
        fx, fy = fx[..., 0], fy[..., 0]
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def texture_gather(img, uv, component: int):
    """WGSL ``textureGather(component, ...)``: the 4 texels bilinear would
    blend, order (x, y, z, w) = (-+, ++, +-, --) quadrants — returns
    (..., 4). One row gather of the corner-packed component plane."""
    x, y, h, w = _uv_to_xy(img, uv)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    c = img[..., component] if img.ndim == 3 else img
    packed, pw = _corner_pack(c)
    quad = gather_packed_rows(packed, pw, y0, x0)  # (..., 4)
    c00, c10, c01, c11 = (
        quad[..., 0], quad[..., 1], quad[..., 2], quad[..., 3]
    )
    # WGSL gather order: (umin,vmax), (umax,vmax), (umax,vmin), (umin,vmin)
    return jnp.stack([c01, c11, c10, c00], axis=-1)


def cross(dys, dxs):
    """The full dys x dxs tap window as explicit (dy, dx) pairs."""
    return [(dy, dx) for dy in dys for dx in dxs]


def pack_window_gather(specs, ky, kx):
    """ONE row gather serving many taps around a shared base index.

    ``specs``: list of (img, taps) or (img, taps, chs): ``taps`` is a
    list of (dy, dx) pairs (see ``cross``; explicit pairs let callers
    trim unused window corners so the packed channel count stays at/below
    the 128-lane boundary), ``chs`` optionally selects source channels.
    For every image, the edge-clamped static shifts over its window are
    packed as row channels; the packed plane is gathered once at
    (ky, kx); the returned accessor ``at(slot, dy, dx)`` gives the tap
    back as a LIST of 2D channel planes.

    Rationale: a TPU gather costs ~7.5-17 ns per OUTPUT ROW and is only
    mildly width-dependent (2M rows: 16ch ~12 ms, 96ch ~27 ms, 224ch
    ~35 ms — tools/bench_gather.py), so 12 separate reprojection taps
    cost ~12x more than one wide gather of all their texels.

    Layout: every intermediate is a 2D plane (ONE pad per channel, taps
    are pure slices packed via pack_rows — major-axis stack + one
    transpose; accessor results are plane slices of the wide rows). Any
    lane-axis stack/pad materialization ((H, W, 1) or unit-channel concat
    operands) lane-pads 128x on TPU and OOMed the round-2/3 driver bench
    at 90-128 GB HBM (BENCH_r02.json, tools/tpu_gate.py) — see pack_rows.

    Clamp semantics: per-tap clamp-to-edge from the UNCLAMPED base
    (shared edge padding), provided the caller clamps (ky, kx) into the
    image — exact WGSL sampler behavior for any in-image base.

    A spec may carry a 4th element ``reduce=(ry, rx)``: each packed
    channel is then the elementwise MAX over the (ry, rx) sub-window
    starting at its tap offset, built as maxes of slices of the SAME
    edge-padded plane — so the clamp semantics compose exactly
    (max of per-texel-clamped values). This collapses any
    "OR over a window of monotone threshold tests" consumer (e.g. the
    SMAA disocclusion ratio test: cur/pd < 0.95 for ANY pd in the 2x2
    gather ⟺ cur/max(pd) < 0.95, IEEE division being monotone in the
    denominator) from ry*rx channels per tap to ONE — SMAA's depth
    window shrinks 64 -> 25 packed channels."""
    parts, index, off = [], {}, 0
    src_w = None
    for si, spec in enumerate(specs):
        img, taps = spec[0], list(spec[1])
        chs = spec[2] if len(spec) > 2 else None
        red = spec[3] if len(spec) > 3 else None
        h, w = img.shape[0], img.shape[1]
        if src_w is None:
            src_w = (h, w)
        assert (h, w) == src_w, "pack_window_gather: mixed source sizes"
        if img.ndim == 2:
            chans = [img]
        else:
            chs = range(img.shape[-1]) if chs is None else chs
            chans = [img[..., c] for c in chs]
        dys = [t[0] for t in taps]
        dxs = [t[1] for t in taps]
        ry, rx = red if red is not None else (1, 1)
        pt, pb = max(-min(dys), 0), max(max(dys) + ry - 1, 0)
        pl, pr = max(-min(dxs), 0), max(max(dxs) + rx - 1, 0)
        planes = [jnp.pad(c, ((pt, pb), (pl, pr)), mode="edge") for c in chans]
        C = len(planes)
        for dy, dx in taps:
            for p in planes:
                acc = None
                for ddy in range(ry):
                    for ddx in range(rx):
                        s = p[
                            pt + dy + ddy : pt + dy + ddy + h,
                            pl + dx + ddx : pl + dx + ddx + w,
                        ]
                        acc = s if acc is None else jnp.maximum(acc, s)
                parts.append(acc)
            index[(si, dy, dx)] = (off, C)
            off += C
    rows = gather_packed_rows(pack_rows(parts), src_w[1], ky, kx)

    def at(si, dy, dx):
        o, C = index[(si, dy, dx)]
        return [rows[..., o + c] for c in range(C)]

    return at


def identity_window_accessor(specs, base_dy: int = 0, base_dx: int = 0):
    """pack_window_gather's accessor for the case where the gather base
    (ky, kx) equals the pixel grid (plus a static offset): every tap is a
    static edge-clamped shift — zero pack builds, zero gathers, and a
    shift-only backward. Exact equivalence with pack_window_gather's
    clamp semantics (per-tap clamp from the unclamped base) holds because
    edge_shift clamps each tap independently."""

    def at(si, dy, dx):
        spec = specs[si]
        img = spec[0]
        chs = spec[2] if len(spec) > 2 else None
        red = spec[3] if len(spec) > 3 else None
        if img.ndim == 2:
            chans = [img]
        else:
            chs = range(img.shape[-1]) if chs is None else chs
            chans = [img[..., c] for c in chs]
        if red is None:
            return [edge_shift(c, base_dy + dy, base_dx + dx) for c in chans]
        ry, rx = red
        out = []
        for c in chans:
            acc = None
            for ddy in range(ry):
                for ddx in range(rx):
                    s = edge_shift(c, base_dy + dy + ddy, base_dx + dx + ddx)
                    acc = s if acc is None else jnp.maximum(acc, s)
            out.append(acc)
        return out

    return at


def reproject_mode(requested: str = "adaptive") -> str:
    """Resolve the reprojection transport mode, honoring the debug env
    overrides (HIKARI_FORCE_WINDOW_GATHER / _SHIFT — equivalence tests
    and ceiling measurements)."""
    import os

    if os.environ.get("HIKARI_FORCE_WINDOW_GATHER"):
        return "gather"
    if os.environ.get("HIKARI_FORCE_WINDOW_SHIFT"):
        return "shift"
    return requested


def cond_window_gather(
    identity_pred, make_shift_at, make_gather_at, body, mode: str = "adaptive"
):
    """Run ``body(at)`` with the cheapest EXACT accessor for a
    reprojected window fetch.

    ``identity_pred`` (traced bool scalar) asserts that the per-pixel
    gather base equals the static map ``make_shift_at`` implements —
    true whenever the reprojection velocity is zero in integer texels
    (static camera at steady state, the reference's own common case).
    Then every tap is a static shift: no (H*W, K) table build (~40 ms at
    1080p/128ch on v5e), no row gather (~6-12 ms), and the backward pass
    is shifts instead of scatter-adds. Otherwise the packed wide-row
    gather path (pack_window_gather) runs.

    ``mode``: "shift"/"gather" pick a branch STATICALLY — used by the
    pipeline's single frame-level lax.cond (render/pipeline.py), because
    ~10 per-pass conds cost ~11 ms each in lost fusion (measured:
    tools/bench_cond.py shows a bare cond is ~0.15 ms, but the full
    adaptive pipeline ran 375 ms vs 268 ms with branches picked
    statically). "adaptive" keeps a local lax.cond for standalone
    callers (unit tests, direct pass use).

    ``make_shift_at`` / ``make_gather_at`` are thunks so their setup ops
    (phase decompositions, pack builds) trace INSIDE the branch."""
    import jax as _jax

    mode = reproject_mode(mode)
    if mode == "gather":
        return body(make_gather_at())
    if mode == "shift":
        # Caller guarantees identity_pred (the frame-level cond's
        # predicate implies it; WRONG to force under motion).
        return body(make_shift_at())
    return _jax.lax.cond(
        identity_pred,
        lambda _: body(make_shift_at()),
        lambda _: body(make_gather_at()),
        0,
    )


def make_dyn_at(at, bit_y, bit_x):
    """Wrap a pack_window_gather accessor with per-axis offsets that are
    either static ints or (lo, hi) pairs selected by that axis's
    half-texel bit (frac >= 0.5 of the gather coordinate, a 2D plane).
    Returns taps as lists of 2D channel planes, like ``at``."""

    def dyn(slot, oy_opts, ox_opts):
        def pick(opts, bit, get):
            if isinstance(opts, int):
                return get(opts)
            lo, hi = get(opts[0]), get(opts[1])
            return [jnp.where(bit, b, a) for a, b in zip(lo, hi)]

        def row(oy):
            return pick(ox_opts, bit_x, lambda ox: at(slot, oy, ox))

        return pick(oy_opts, bit_y, row)

    return dyn


def quad_phase_sampler(img, j, pad: int = 4):
    """Sampler for SMAA TU4x's static-affine "quad uv" taps: every tap of
    the form nearest/gather at uv = ((2x + j + 0.5 + bx) / W, ...) lands on
    the out-res texel (2y + j + cy, 2x + j + cx) with STATIC integer
    (cy, cx) and only the frame-parity phase ``j`` dynamic. Returns
    ``tap(cy, cx)`` = one dynamic_slice of an edge-padded copy + a [::2]
    strided view — zero gathers (TPU gathers cost ~7.5 ns per output row;
    slices are ~20x cheaper — tools/bench_gather.py).

    Clamp semantics: the edge padding replicates borders, so
    tap(cy, cx)[y, x] == img[clip(2y + j + cy, 0, H-1), clip(...W-1)] —
    per-tap clamping from the UNCLAMPED base, which is what WGSL's
    clamp-to-edge sampler does for each gathered texel.

    Layout: pads and slices are per-channel 2D planes (rank-3 pad
    outputs with a small minor channel dim lane-pad up to 128x on TPU —
    see _padded_planes). ``tap(cy, cx, ch)`` returns the single 2D
    channel plane; ``tap(cy, cx)`` stacks all channels (2D images return
    2D)."""
    P = pad
    assert P % 2 == 0
    two_d = img.ndim == 2
    chans = [img] if two_d else [img[..., c] for c in range(img.shape[-1])]
    h2, w2 = img.shape[0], img.shape[1]
    h, w = h2 // 2, w2 // 2
    evenb = j == 1  # smaa_tu4x sets prev_j = 1 on even frames

    # Phase decomposition (the round-3 SMAA fix): ONE out-res edge pad +
    # ONE de-interleave per channel, then every tap is a static
    # contiguous slice of a quarter-res phase plane selected by frame
    # parity. The old formulation (dynamic_slice at the traced phase j +
    # a [::2, ::2] strided view PER TAP) measured ~6.5 ms/tap on v5e —
    # ~75 taps made smaa_tu4x 724 ms of a 1320 ms forward frame
    # (tools/bench_smaa_prims.py, tools/profile_prefix.py). Padding at
    # out-res BEFORE de-interleaving keeps clamp-to-edge exact: the
    # clamped out-res texel (whatever its parity) is what the edge pad
    # replicated.
    def phases(c2):
        # Four 2D quarter-res phase planes: phase[py][px][y, x] =
        # pd[2y + py, 2x + px], via STATIC strided slices. 2D (not a 4D
        # stack): their VJPs are 2D interior pads — the fast lowering
        # class — where the earlier 4D reshape+transpose formulation's
        # backward ran the SMAA window-fetch stage at ~60 ms
        # (tools/bench_smaa_iso.py --grad --stops, round 4).
        pd = jnp.pad(c2, ((P, P), (P, P)), mode="edge")
        return [[pd[py::2, px::2] for px in (0, 1)] for py in (0, 1)]

    # optimization_barrier: force ONE materialization of the de-interleave
    # (with ~80 tap consumers in the SMAA zero-velocity accessor, XLA
    # otherwise re-fuses the pad+deinterleave into every slice — measured
    # ~57 ms instead of ~3 ms for the window-fetch stage at 1080p).
    # HIKARI_NO_PHASE_BARRIER=1 disables (A/B knob).
    import os as _os

    import jax as _jax

    phased = [phases(c) for c in chans]
    if not _os.environ.get("HIKARI_NO_PHASE_BARRIER"):
        flat = _jax.lax.optimization_barrier(
            [p for quad in phased for row in quad for p in row]
        )
        phased = [
            [[flat[ci * 4 + 0], flat[ci * 4 + 1]],
             [flat[ci * 4 + 2], flat[ci * 4 + 3]]]
            for ci in range(len(chans))
        ]

    def tap(cy: int, cx: int, ch: int | None = None):
        assert -P <= cy + 1 <= P and -P <= cx + 1 <= P

        def one(t):
            outs = []
            for jj in (1, 0):  # (even-frame, odd-frame) static offsets
                ay, ax = P + jj + cy, P + jj + cx
                ay = min(max(ay, 0), 2 * P)  # dynamic_slice-clamp parity
                ax = min(max(ax, 0), 2 * P)
                py, px, sy, sx = ay & 1, ax & 1, ay >> 1, ax >> 1
                outs.append(t[py][px][sy : sy + h, sx : sx + w])
            return jnp.where(evenb, outs[0], outs[1])

        if ch is not None:
            return one(phased[ch])
        if two_d:
            return one(phased[0])
        return jnp.stack([one(t) for t in phased], axis=-1)

    return tap


def interleave2x2(q00, q01, q10, q11):
    """out[2y + a, 2x + b] = q_ab[y, x] — quad-slot interleave via
    interior-padded adds (lax.pad interior=1), ~3.5x faster than four
    strided ``.at[::2, ::2].set`` updates on TPU
    (tools/bench_smaa_prims.py: 3.9 vs 13.5 ms for 4 slots @1080p).
    (A custom reshape+transpose VJP was measured and REJECTED round 4:
    the natural interior-pad transpose — static strided slices — is
    faster; the round-3 strided pathology needed a DYNAMIC start.)"""
    import jax as _jax

    z = jnp.zeros((), dtype=q00.dtype)

    def put(q, a, b):
        return _jax.lax.pad(q, z, [(a, 1 - a, 1), (b, 1 - b, 1)])

    return put(q00, 0, 0) + put(q01, 0, 1) + put(q10, 1, 0) + put(q11, 1, 1)


def parity_shift(img, even, dy0: int, dx0: int, dy1: int, dx1: int):
    """select(even, edge_shift(img, dy0, dx0), edge_shift(img, dy1, dx1)) —
    a static shift whose offset depends only on frame parity."""
    a = edge_shift(img, dy0, dx0)
    b = edge_shift(img, dy1, dx1)
    e = jnp.reshape(even, (1,) * img.ndim)
    return jnp.where(e, a, b)


def shift2d(img, dy: int, dx: int):
    """Shift so out[y, x] = img[y + dy, x + dx]; returns (shifted, valid)
    where valid marks in-bounds source texels (the reference skips
    out-of-bounds stencil taps, denoise.wgsl:122-125)."""
    h, w = img.shape[0], img.shape[1]
    shifted = jnp.roll(jnp.roll(img, -dy, axis=0), -dx, axis=1)
    ys = jnp.arange(h)[:, None] + dy
    xs = jnp.arange(w)[None, :] + dx
    valid = (ys >= 0) & (ys < h) & (xs >= 0) & (xs < w)
    return shifted, valid

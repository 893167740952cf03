"""Microbench the SMAA/TAA primitive ops on the TPU: which lowering is
eating the 724 ms/frame the prefix profile attributes to smaa_tu4x
(tools/profile_prefix.py --stages ... smaa:*)?

Each candidate runs inside a jitted lax.scan whose body depends on the
carry (nothing hoistable) followed by a value fetch — the tunnel-honest
methodology (CLAUDE.md).

Usage: python tools/bench_smaa_prims.py [--n 8] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.expanduser("~/.cache/hikari_tpu_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp

    H, W = 1080, 1920
    h, w = H // 2, W // 2
    N = args.n

    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (H, W))
    imgs10 = jax.random.normal(key, (H, W, 10))
    small = jax.random.normal(key, (h, w))
    ky = jnp.clip(
        (jax.random.normal(key, (h, w)) * 3).astype(jnp.int32)
        + jnp.arange(h)[:, None] * 2, 0, H - 1,
    )
    kx = jnp.clip(
        (jax.random.normal(key, (h, w)) * 3).astype(jnp.int32)
        + jnp.arange(w)[None, :] * 2, 0, W - 1,
    )
    table = jax.random.normal(key, (H * W, 128))

    def timed(name, fn, *ops):
        @jax.jit
        def run(c0, *ops):
            def body(c, _):
                out = fn(c, *ops)
                return out, None

            cN, _ = jax.lax.scan(body, c0, None, length=N)
            return cN

        c = run(jnp.float32(0.0), *ops)
        _ = float(c)  # compile+warm
        best = float("inf")
        for _i in range(3):
            t0 = time.perf_counter()
            _ = float(run(jnp.float32(0.0), *ops))
            best = min(best, (time.perf_counter() - t0) / N)
        print(f"{name:42s} {best * 1e3:9.2f} ms", file=sys.stderr)
        return best

    j = jnp.int32(1)

    # 1. one dynamic_slice + [::2,::2] tap (quad_phase_sampler.tap)
    P = 4
    padded = jnp.pad(img, ((P, P), (P, P)), mode="edge")
    size = (2 * (h - 1) + 1, 2 * (w - 1) + 1)

    def tap(c, pd):
        win = jax.lax.dynamic_slice(pd, (P + j + (c > 1e9).astype(jnp.int32), P), size)
        return c + jnp.sum(win[::2, ::2])

    timed("dyn_slice + [::2,::2] tap x1", tap, padded)

    def tap25(c, pd):
        acc = c
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                win = jax.lax.dynamic_slice(
                    pd,
                    (P + dy + j + (c > 1e9).astype(jnp.int32), P + dx + j),
                    size,
                )
                acc = acc + jnp.sum(win[::2, ::2])
        return acc

    timed("dyn_slice + [::2,::2] tap x25", tap25, padded)

    # 2. static strided slice
    def sslice(c, im):
        sh = jnp.roll(im, (c > 1e9).astype(jnp.int32), axis=0)
        return c + jnp.sum(sh[::2, ::2])

    timed("roll + static [::2,::2]", sslice, img)

    # 3. interleave via .at[::2,::2].set x4
    def interleave(c, sm):
        smc = sm + c
        o = jnp.zeros((H, W))
        o = o.at[0::2, 0::2].set(smc)
        o = o.at[0::2, 1::2].set(smc + 1)
        o = o.at[1::2, 0::2].set(smc + 2)
        o = o.at[1::2, 1::2].set(smc + 3)
        return jnp.sum(o)

    timed(".at[strided].set interleave (4 slots)", interleave, small)

    # 4. pack_rows of 100 render-res planes (concat + transpose)
    from hikari_tpu.render.filters import pack_rows

    def packonly(c, im):
        parts = [im[i // 10 : i // 10 + H - 16, i % 10 : i % 10 + W - 16] + c
                 for i in range(100)]
        t = pack_rows(parts)
        return jnp.sum(t[::4097])

    timed("pack_rows 100ch @1080p (build only)", packonly, img)

    # 5. gather 2M rows x 128ch from prebuilt table
    def gatheronly(c, tb, yy, xx):
        fl = (yy * W + xx + (c > 1e9).astype(jnp.int32)).reshape(-1)
        rows = tb[fl]
        return c + jnp.sum(rows)

    timed("gather 518k rows x128ch (prebuilt)", gatheronly, table, ky, kx)

    # 6. full pack_window_gather (SMAA spec shape)
    from hikari_tpu.render.filters import cross, pack_window_gather

    def pwg(c, im10, yy, xx):
        at = pack_window_gather(
            [
                (im10 + c, cross(range(-3, 5), range(-3, 5)), (3,)),
                (im10, cross((-2, 0, 1, 3), (-2, 0, 1, 3)), (0,)),
                (im10, cross((0, 1), (0, 1)), (0, 1, 2)),
                (im10, cross((0, 1), (0, 1)), (4, 5)),
            ],
            yy,
            xx,
        )
        acc = c
        for t in ((0, -3, -3), (1, 0, 0), (2, 0, 1), (3, 1, 1)):
            acc = acc + sum(jnp.sum(p) for p in at(*t))
        return acc

    timed("pack_window_gather 100ch (SMAA shape)", pwg, imgs10, ky, kx)

    # 7. 2D pad (edge) of a 1080p plane x10
    def pads(c, im):
        acc = c
        for i in range(10):
            acc = acc + jnp.sum(jnp.pad(im + c * i, ((4, 4), (4, 4)), mode="edge"))
        return acc

    timed("jnp.pad edge 1080p x10", pads, img)

    # 8. interior-pad interleave alternative (lax.pad with interior=1)
    def interleave_pad(c, sm):
        smc = sm + c
        z = jnp.float32(0.0)
        cfg = ((0, H - 2 * h + 1, 1), (0, W - 2 * w + 1, 1))
        o = jax.lax.pad(smc, z, [(0, cfg[0][1], 1), (0, cfg[1][1], 1)])
        o2 = jax.lax.pad(smc + 1, z, [(0, cfg[0][1], 1), (1, cfg[1][1] - 1, 1)])
        o3 = jax.lax.pad(smc + 2, z, [(1, cfg[0][1] - 1, 1), (0, cfg[1][1], 1)])
        o4 = jax.lax.pad(smc + 3, z, [(1, cfg[0][1] - 1, 1), (1, cfg[1][1] - 1, 1)])
        return jnp.sum(o + o2 + o3 + o4)

    timed("lax.pad interior interleave (4 slots)", interleave_pad, small)


def more(args):
    """--more: second-tier suspects (reservoir reproject machinery)."""
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.expanduser("~/.cache/hikari_tpu_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import time

    import jax.numpy as jnp

    h, w = 540, 960
    N = args.n
    key = jax.random.PRNGKey(0)
    ky = jnp.clip(
        (jax.random.normal(key, (h, w)) * 3).astype(jnp.int32)
        + jnp.arange(h)[:, None], 0, h - 1,
    )
    kx = jnp.clip(
        (jax.random.normal(key, (h, w)) * 3).astype(jnp.int32)
        + jnp.arange(w)[None, :], 0, w - 1,
    )
    mask = jax.random.normal(key, (h, w)) > 0.9
    table25 = jax.random.normal(key, (h * w, 25))

    def timed(name, fn, *ops):
        @jax.jit
        def run(c0, *ops):
            def body(c, _):
                return fn(c, *ops), None

            cN, _ = jax.lax.scan(body, c0, None, length=N)
            return cN

        _ = float(run(jnp.float32(0.0), *ops))
        best = float("inf")
        for _i in range(3):
            t0 = time.perf_counter()
            _ = float(run(jnp.float32(0.0), *ops))
            best = min(best, (time.perf_counter() - t0) / N)
        print(f"{name:42s} {best * 1e3:9.2f} ms", file=sys.stderr)

    def scatter_min(c, yy, xx, m):
        keep = jnp.ones((h, w))
        shift = (c > 1e9).astype(jnp.int32)
        keep = keep.at[(yy + shift).reshape(-1), xx.reshape(-1)].min(
            jnp.where(m, 0.0, 1.0).reshape(-1)
        )
        return c + jnp.sum(keep)

    timed("scatter-min 518k -> (540,960)", scatter_min, ky, kx, mask)

    def scatter_min2(c, yy, xx, m):
        keep = jnp.ones((h, w, 2))
        shift = (c > 1e9).astype(jnp.int32)
        upd = jnp.stack(
            [jnp.where(m, 0.0, 1.0), jnp.where(m, 1.0, 0.0)], -1
        ).reshape(-1, 2)
        keep = keep.at[(yy + shift).reshape(-1), xx.reshape(-1)].min(upd)
        return c + jnp.sum(keep)

    timed("scatter-min 518k 2ch packed", scatter_min2, ky, kx, mask)

    def seg_min(c, yy, xx, m):
        shift = (c > 1e9).astype(jnp.int32)
        flat = ((yy + shift) * w + xx).reshape(-1)
        vals = jnp.where(m, 0.0, 1.0).reshape(-1)
        keep = jax.ops.segment_min(
            vals, flat, num_segments=h * w, indices_are_sorted=False
        )
        return c + jnp.sum(jnp.minimum(keep, 1.0))

    timed("segment_min 518k -> (540,960)", seg_min, ky, kx, mask)

    def resgather(c, tb, yy, xx):
        shift = (c > 1e9).astype(jnp.int32)
        fl = ((yy + shift) * w + kx).reshape(-1)
        return c + jnp.sum(tb[fl])

    timed("gather 518k rows x25ch (reservoir)", resgather, table25, ky, kx)

    # transpose (K, N) -> (N, K): plain XLA vs MXU identity-matmul
    H, W = 1080, 1920
    K = 128
    big = jax.random.normal(key, (K, H * W))

    def xpose(c, t):
        tt = (t + c).T
        return jnp.sum(tt[::4097])

    timed("transpose (128, 2M) -> (2M, 128) XLA", xpose, big)

    eye = jnp.eye(K, dtype=jnp.float32)

    def xpose_mxu(c, t, ee):
        tt = jax.lax.dot_general(
            t + c, ee, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # (N, K) = t^T @ I, exact for f32
        return jnp.sum(tt[::4097])

    timed("transpose (128, 2M) via MXU identity", xpose_mxu, big, eye)


def patches(args):
    """--patches: im2col window-table builds vs the slice+concat pack."""
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.expanduser("~/.cache/hikari_tpu_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import time

    import jax.numpy as jnp

    H, W = 1080, 1920
    N = args.n
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (H, W))

    def timed(name, fn, *ops):
        @jax.jit
        def run(c0, *ops):
            def body(c, _):
                return fn(c, *ops), None

            cN, _ = jax.lax.scan(body, c0, None, length=N)
            return cN

        _ = float(run(jnp.float32(0.0), *ops))
        best = float("inf")
        for _i in range(3):
            t0 = time.perf_counter()
            _ = float(run(jnp.float32(0.0), *ops))
            best = min(best, (time.perf_counter() - t0) / N)
        print(f"{name:42s} {best * 1e3:9.2f} ms", file=sys.stderr)

    # current formulation: 64 per-tap slices of a padded plane -> pack_rows
    from hikari_tpu.render.filters import pack_rows

    def slicepack(c, im):
        pd = jnp.pad(im + c, ((3, 4), (3, 4)), mode="edge")
        parts = [
            pd[3 + dy : 3 + dy + H, 3 + dx : 3 + dx + W]
            for dy in range(-3, 5)
            for dx in range(-3, 5)
        ]
        t = pack_rows(parts)
        return jnp.sum(t[::4097])

    timed("64-tap window: slice+pack_rows", slicepack, img)

    def patch64(c, im):
        pd = jnp.pad(im + c, ((3, 4), (3, 4)), mode="edge")
        p = jax.lax.conv_general_dilated_patches(
            pd[None, :, :, None],
            filter_shape=(8, 8),
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (1, H, W, 64)
        t = p.reshape(H * W, 64)
        return jnp.sum(t[::4097])

    timed("64-tap window: conv_patches", patch64, img)

    # and a 16-tap 4x4 window for the narrower specs
    def patch16(c, im):
        pd = jnp.pad(im + c, ((1, 2), (1, 2)), mode="edge")
        p = jax.lax.conv_general_dilated_patches(
            pd[None, :, :, None],
            filter_shape=(4, 4),
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        t = p.reshape(H * W, 16)
        return jnp.sum(t[::4097])

    timed("16-tap window: conv_patches", patch16, img)

    def slicepack16(c, im):
        pd = jnp.pad(im + c, ((1, 2), (1, 2)), mode="edge")
        parts = [
            pd[1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]
            for dy in range(-1, 3)
            for dx in range(-1, 3)
        ]
        t = pack_rows(parts)
        return jnp.sum(t[::4097])

    timed("16-tap window: slice+pack_rows", slicepack16, img)


if __name__ == "__main__":
    import sys as _s

    if "--more" in _s.argv or "--patches" in _s.argv:
        ap = argparse.ArgumentParser()
        ap.add_argument("--n", type=int, default=8)
        ap.add_argument("--cpu", action="store_true")
        ap.add_argument("--more", action="store_true")
        ap.add_argument("--patches", action="store_true")
        a = ap.parse_args()
        if a.patches:
            patches(a)
        else:
            more(a)
    else:
        main()

"""Cross-check bench.py's per-frame loop timing against a scan-folded
single-execution measurement (tools/, not shipped API).

Through the remote-TPU tunnel, block_until_ready can return early even
with one nominally-in-flight call once a loop gets going (CLAUDE.md).
The only bulletproof timing is ONE jitted executable that runs N frames
internally (lax.scan over the train step) followed by a VALUE FETCH —
there is nothing left to queue. This script runs both measurements and
prints the ratio; if the loop lies, the scan number is the truth.

Usage: python tools/verify_bench.py [--config cornell] [--frames 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="cornell")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--size", type=int, default=0, help="override square size")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.expanduser("~/.cache/hikari_tpu_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp

    from hikari_tpu.config import Taa, Upscale
    from hikari_tpu.io.scenes import CONFIGS
    from hikari_tpu.parallel import make_train_step
    from hikari_tpu.parallel.sharding import DIFF_LEAVES, render_loss
    from hikari_tpu.render import initial_state
    from hikari_tpu.scene import build_scene_buffers

    if args.size:
        width = height = args.size
    elif args.config == "cornell":
        width, height = 1920, 1080
    else:
        width, height = 512, 512
    scene, camera, settings = CONFIGS[args.config]()
    settings = settings.replace(
        width=width, height=height, upscale=Upscale.smaa_tu4x(2.0),
        taa=Taa.JASMINE, denoise=True, indirect_bounces=1,
    )
    buffers = build_scene_buffers(scene)
    state = initial_state(settings)
    target = jnp.zeros(settings.output_size + (3,))
    N = args.frames

    # --- measurement A: bench.py's loop (block every frame) ---
    train_step = make_train_step(settings)
    loss, grads, out, st = train_step(buffers, camera, state, target)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    st = state
    for _ in range(N):
        loss, grads, out, st = train_step(buffers, camera, st, target)
        jax.block_until_ready(loss)
    loop_dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    lv = float(loss)
    drain_dt = time.perf_counter() - t0
    print(
        f"# loop: {N} frames in {loop_dt:.4f}s ({loop_dt/N*1e3:.2f} ms/f); "
        f"post-loop value fetch took {drain_dt:.4f}s (loss={lv:.5f})",
        file=sys.stderr,
    )

    # --- measurement B: scan-folded single execution + fetch ---
    def split(sc):
        return {k: getattr(sc, k) for k in DIFF_LEAVES}

    def merge(sc, params):
        return type(sc)(**{
            **{f: getattr(sc, f) for f in sc.__dataclass_fields__}, **params,
        })

    params0 = split(buffers)

    @jax.jit
    def run_n(sc, cam, st0, tgt):
        p0 = split(sc)

        def frame(carry, _):
            st, acc = carry

            def loss_fn(p):
                return render_loss(merge(sc, p), cam, st, tgt, settings)

            (loss, (out, new_st)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(p0)
            gsum = sum(jnp.sum(jnp.abs(g)) for g in grads.values())
            return (new_st, acc + loss + 1e-12 * gsum), None

        (st_f, acc), _ = jax.lax.scan(
            frame, (st0, jnp.float32(0.0)), None, length=N
        )
        return acc, st_f

    acc, st_f = run_n(buffers, camera, state, target)
    jax.block_until_ready(acc)
    float(acc)  # warm fetch
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc, st_f = run_n(buffers, camera, state, target)
        v = float(acc)  # fetch forces completion
        dt = time.perf_counter() - t0
        best = min(best, dt)
        print(f"# scan: {N} frames in {dt:.4f}s ({dt/N*1e3:.2f} ms/f) "
              f"acc={v:.5f}", file=sys.stderr)
    print(
        f"# VERDICT: scan-folded {best/N*1e3:.2f} ms/frame vs loop "
        f"{loop_dt/N*1e3:.2f} ms/frame — ratio {best/loop_dt:.1f}x",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()

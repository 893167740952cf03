"""Benchmark: rays/sec/chip, forward + gradient, 1080p Cornell.

The BASELINE.json north-star metric. Runs on whatever accelerator JAX
finds (the driver provides a real TPU chip); prints ONE json line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Ray accounting (counted per frame from the active settings, matching the
reference's per-pixel work — src/light.rs:655-698):
  primary rays            : output_h * output_w      (G-buffer prepass)
  direct channel          : 1 shadow ray / render px (+ validation retrace
                            every direct_validate_interval frames)
  emissive channel        : 1 target + 1 shadow ray / render px
  indirect channel        : per bounce: 1 bounce + 1 NEE target + 1 NEE
                            shadow ray / render px
Backward-pass rays are 0 (fixed-topology gradients re-use forward hits),
so rays/s (fwd+grad) divides forward rays by the full fwd+bwd step time —
the honest definition.
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_RAYS_PER_SEC = 1.0e9  # nominal target: 1 Grays/s/chip fwd+grad


def rays_per_frame(settings, scene_buffers) -> float:
    oh, ow = settings.output_size
    rh, rw = settings.render_size
    primary = oh * ow
    per_px = 0.0
    # direct channel (+ amortized validation retrace)
    per_px += 1.0 * (1.0 + 1.0 / max(settings.direct_validate_interval, 1))
    if settings.emissive_lit and scene_buffers.num_emissives > 0:
        per_px += 2.0 * (1.0 + 1.0 / max(settings.emissive_validate_interval, 1))
    bounces = max(settings.indirect_bounces, 1)
    nee = 3.0 if scene_buffers.num_emissives > 0 else 2.0
    per_px += nee * bounces
    return primary + per_px * rh * rw


def enable_compile_cache():
    """Persistent compilation cache: first compile of the 1080p train step
    through the remote-TPU tunnel takes ~10 min; cached runs start fast."""
    import os

    import jax

    cache = os.path.expanduser("~/.cache/hikari_tpu_jax_cache")
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


def build_bench_case(config: str, frames: int):
    """The EXACT workload bench.py times, shared with tools/tpu_gate.py so
    the memory gate compiles (and caches) the same executable the driver
    bench then runs: a jitted lax.scan of ``frames`` fwd+grad train steps,
    grads coupled into the carried scalar so nothing is DCE'd.

    Returns (run_frames, (buffers, camera, state, target), settings)."""
    import jax
    import jax.numpy as jnp

    from hikari_tpu.config import Taa, Upscale
    from hikari_tpu.io.scenes import CONFIGS
    from hikari_tpu.parallel.sharding import DIFF_LEAVES, render_loss
    from hikari_tpu.render import initial_state
    from hikari_tpu.scene import build_scene_buffers

    if config == "cornell":
        width, height = 1920, 1080
    else:
        width, height = 512, 512
    scene, camera, settings = CONFIGS[config]()
    # The reference's default pipeline renders output at half internal
    # resolution (SMAA TU4x ratio 2.0, src/lib.rs:491-499) — benchmark
    # the same configuration for every scene.
    settings = settings.replace(
        width=width,
        height=height,
        upscale=Upscale.smaa_tu4x(2.0),
        taa=Taa.JASMINE,
        denoise=True,
        indirect_bounces=1,
    )
    # Reprojection specialization (config.py RenderSettings.reproject):
    # the bench workload is a static camera + scene at steady state, so
    # it compiles the "shift" static hint, which the pipeline maps to
    # each pass's measured-fastest EXACT transport (light/taa=shift,
    # smaa=gather — render/pipeline.py). tools/ab_bench.py rows on the
    # driver chip (1080p cornell fwd+grad, ms/frame) behind the default:
    #   round-5 first matrix: adaptive 690.4 | uniform-shift 644.6 |
    #     gather 631.6 (remat rows 777-817, rejected);
    #   per-pass matrix at the SMAA-reworked tree: gather-all 560.6 |
    #     light=shift 516.3 | taa=shift 494.4 | smaa=shift 691.5 |
    #     light+taa=shift 464.0  <- the shipped hint mapping.
    settings = settings.replace(
        reproject=os.environ.get("HIKARI_BENCH_REPROJECT", "shift"),
        channel_remat=os.environ.get("HIKARI_BENCH_CHANNEL_REMAT", "0")
        == "1",
    )
    if os.environ.get("HIKARI_BENCH_REMAT", "0") == "0":
        # No pass-level remat in the bench configs: with the round-4
        # static-frame fast paths the full-residual fwd+grad scan fits in
        # 10.2 GiB projected peak (tools/tpu_gate.py, budget 14), and the
        # backward sweep drops from 328 to 222 ms/frame at 1080p by NOT
        # recomputing each pass. Set HIKARI_BENCH_REMAT=1 to restore the
        # remat policy (needed if future configs exceed the gate budget).
        settings = settings.replace(remat=False)
    buffers = build_scene_buffers(scene)
    state = initial_state(settings)
    target = jnp.zeros(settings.output_size + (3,))

    def split(sc):
        return {k: getattr(sc, k) for k in DIFF_LEAVES}

    def merge(sc, params):
        return type(sc)(**{
            **{f: getattr(sc, f) for f in sc.__dataclass_fields__}, **params,
        })

    @jax.jit
    def run_frames(sc, cam, st0, tgt):
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
            frame, (st0, jnp.float32(0.0)), None, length=frames
        )
        return acc, st_f

    return run_frames, (buffers, camera, state, target), settings


def main():
    import jax

    enable_compile_cache()

    import argparse

    from hikari_tpu.io.scenes import CONFIGS

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--config", default="cornell", choices=sorted(CONFIGS),
        help="pipeline scene; the driver-run default (cornell @1080p) is "
        "the BASELINE north-star metric, the others add full-pipeline "
        "fwd+grad numbers on real geometry (scene=FlightHelmet 95k tris, "
        "city=procedural city) at 512p",
    )
    args = ap.parse_args()

    device = jax.devices()[0]
    print(f"# device={device.platform} ({device.device_kind})", file=sys.stderr)

    # HONEST timing (see tools/verify_bench.py and CLAUDE.md): through the
    # remote-TPU tunnel, block_until_ready NEVER reliably waits — a loop of
    # per-frame "blocked" train steps runs thousands of times faster than
    # the device can compute, and the queued work only drains on a VALUE
    # FETCH. The only bulletproof measurement is ONE jitted executable that
    # runs `frames` steps internally (lax.scan over the train step, grads
    # coupled into the carried scalar so nothing is DCE'd) followed by a
    # float() fetch. Round-1/2 loop-timed numbers (17.8 / 8.15 Grays/s)
    # were fiction from this; the real 1080p fwd+grad step is seconds.
    frames = 8  # ReSTIR approaches steady state (temporal reuse warmed)
    run_frames, (buffers, camera, state, target), settings = build_bench_case(
        args.config, frames
    )

    # Warmup / compile.
    acc, _ = run_frames(buffers, camera, state, target)
    _ = float(acc)

    # Compiled-executable introspection: FLOPs for a rate estimate.
    flops = None
    try:
        cost = (
            run_frames.lower(buffers, camera, state, target)
            .compile()
            .cost_analysis()
        )
        if isinstance(cost, list):
            cost = cost[0]
        flops = (float(cost.get("flops", 0.0)) or None)
        if flops:
            flops /= frames
    except Exception:
        pass

    best_dt = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        acc, _ = run_frames(buffers, camera, state, target)
        v = float(acc)  # value fetch = the only real sync on the tunnel
        dt_rep = time.perf_counter() - t0
        print(
            f"# rep {rep}: {frames} frames in {dt_rep:.4f}s "
            f"({dt_rep / frames * 1e3:.2f} ms/frame, acc={v:.6f})",
            file=sys.stderr,
        )
        best_dt = min(best_dt, dt_rep)
    loss = acc

    rays = rays_per_frame(settings, buffers) * frames
    rays_per_sec = rays / best_dt
    dt = best_dt

    # Large-scene rows (round-2 VERDICT item 4): on the default driver run
    # also measure the full pipeline on real geometry (FlightHelmet 95k
    # tris; procedural city 551k tris) and embed the results in the SAME
    # single JSON line under "extra". Strictly budgeted + exception-proof
    # so the cornell north-star number can never be jeopardized; the
    # compile cache is pre-warmed in-round so these are runtime-only.
    extra = None
    if args.config == "cornell" and os.environ.get(
        "HIKARI_BENCH_NO_EXTRA", "0"
    ) in ("0", ""):
        import signal

        class _ExtraTimeout(Exception):
            pass

        def _alarm(signum, frame):
            raise _ExtraTimeout("extra config exceeded hard timeout")

        extra = []
        budget_t0 = time.perf_counter()
        for cfg in ("scene", "city"):
            remaining = 900.0 - (time.perf_counter() - budget_t0)
            if remaining < 60.0:
                extra.append({"config": cfg, "skipped": "time budget"})
                continue
            # A tunnel stall during compile/fetch is a HANG, not an
            # Exception — bound each extra with signal.alarm so the
            # already-measured cornell record always gets emitted
            # (ADVICE r3: the north-star line printed only after extras).
            old_handler = signal.signal(signal.SIGALRM, _alarm)
            signal.alarm(int(min(remaining, 600.0)))
            try:
                xframes = 8
                xrun, xops, xsettings = build_bench_case(cfg, xframes)
                xacc, _ = xrun(*xops)
                _ = float(xacc)  # compile + warm
                xbest = float("inf")
                for _rep in range(2):
                    t0 = time.perf_counter()
                    xacc, _ = xrun(*xops)
                    _ = float(xacc)
                    xbest = min(xbest, time.perf_counter() - t0)
                xrays = rays_per_frame(xsettings, xops[0]) * xframes
                extra.append(
                    {
                        "config": cfg,
                        "metric": f"rays/sec/chip fwd+grad, 512p {cfg}",
                        "value": xrays / xbest,
                        "unit": "rays/s",
                        "ms_per_frame": xbest / xframes * 1e3,
                    }
                )
                print(
                    f"# extra {cfg}: {xbest / xframes * 1e3:.1f} ms/frame "
                    f"fwd+grad ({xrays / xbest / 1e6:.2f} Mrays/s)",
                    file=sys.stderr,
                )
            except _ExtraTimeout:
                extra.append({"config": cfg, "skipped": "hard timeout"})
            except Exception as e:  # never let extras break the bench
                extra.append({"config": cfg, "error": repr(e)[:200]})
            finally:
                signal.alarm(0)
                signal.signal(signal.SIGALRM, old_handler)

    record = {
        "metric": (
            "rays/sec/chip fwd+grad, 1080p Cornell"
            if args.config == "cornell"
            else (
                f"rays/sec/chip fwd+grad, "
                f"{settings.output_size[0]}p {args.config}"
            )
        ),
        "value": rays_per_sec,
        "unit": "rays/s",
        "vs_baseline": rays_per_sec / BASELINE_RAYS_PER_SEC,
    }
    if extra is not None:
        record["extra"] = extra
    print(json.dumps(record))
    # HBM peak + rough MFU (v5e peak: ~197 bf16 / ~49 f32 TFLOP/s).
    try:
        stats = device.memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        if peak is not None:
            print(f"# HBM peak: {peak / 2**30:.2f} GiB", file=sys.stderr)
    except Exception:
        pass
    if flops:
        achieved = flops / (best_dt / frames)
        # XLA cost-analysis FLOPs include lane-padded matmuls and remat
        # recompute — an upper bound on useful work, NOT an MFU basis.
        print(
            f"# step FLOPs (XLA cost-analysis, incl. padding/remat)="
            f"{flops:.3e}; naive rate {achieved / 1e12:.2f} TFLOP/s",
            file=sys.stderr,
        )
    print(
        f"# frames={frames} dt={dt:.3f}s loss={float(loss):.6f} "
        f"device={device.platform}",
        file=sys.stderr,
    )
    sys.stdout.flush()
    sys.stderr.flush()
    # Remote-TPU (tunnel) teardown can hang after results are in; exit hard.
    os._exit(0)


if __name__ == "__main__":
    main()

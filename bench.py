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


def main():
    import os

    import jax

    # Persistent compilation cache: first compile of the 1080p train step
    # through the remote-TPU tunnel takes ~10 min; cached runs start fast.
    cache = os.path.expanduser("~/.cache/hikari_tpu_jax_cache")
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from hikari_tpu.config import Upscale
    from hikari_tpu.io.scenes import cornell_config
    from hikari_tpu.parallel import make_train_step
    from hikari_tpu.render import initial_state
    from hikari_tpu.scene import build_scene_buffers

    width, height = 1920, 1080
    scene, camera, settings = cornell_config()
    # The reference's default pipeline renders 1080p output at half
    # internal resolution (SMAA TU4x ratio 2.0, src/lib.rs:491-499) —
    # benchmark the same configuration.
    from hikari_tpu.config import Taa

    settings = settings.replace(
        width=width,
        height=height,
        upscale=Upscale.smaa_tu4x(2.0),
        taa=Taa.JASMINE,
        denoise=True,
        indirect_bounces=1,
    )
    buffers = build_scene_buffers(scene)
    state = initial_state(settings)
    target = jnp.zeros(settings.output_size + (3,))

    train_step = make_train_step(settings)

    # Warmup / compile.
    loss, grads, out, state = train_step(buffers, camera, state, target)
    jax.block_until_ready(loss)

    # Repeat the timed loop and take the best: per-dispatch latency through
    # the remote-TPU tunnel is noisy, device compute is not.
    frames = 24
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(frames):
            loss, grads, out, state = train_step(buffers, camera, state, target)
        jax.block_until_ready(loss)
        best_dt = min(best_dt, time.perf_counter() - t0)

    rays = rays_per_frame(settings, buffers) * frames
    rays_per_sec = rays / best_dt
    dt = best_dt
    print(
        json.dumps(
            {
                "metric": "rays/sec/chip fwd+grad, 1080p Cornell",
                "value": rays_per_sec,
                "unit": "rays/s",
                "vs_baseline": rays_per_sec / BASELINE_RAYS_PER_SEC,
            }
        )
    )
    print(
        f"# frames={frames} dt={dt:.3f}s loss={float(loss):.6f} "
        f"device={jax.devices()[0].platform}",
        file=sys.stderr,
    )
    sys.stdout.flush()
    sys.stderr.flush()
    # Remote-TPU (tunnel) teardown can hang after results are in; exit hard.
    os._exit(0)


if __name__ == "__main__":
    main()

"""Measure the cost/benefit of settings.spatial_radiance_grads
(render/spatial.py policy): with the flag ON, reservoir radiance stays
attached through the spatial-reuse merge (selection stays detached), so
material/light gradients pick up the radiance-through-reuse term; with
it OFF (default) the whole spatial pass is a constant w.r.t. scene
parameters.

Reports, for each policy, over K random realizations (distinct warmed
frame counters -> distinct noise):
  - mean gradient magnitude (signal),
  - across-realization relative std of the gradient (estimator noise),
  - wall time per gradient and device peak memory (TPU only).

Usage: python tools/measure_spatial_grads.py [--cpu] [--size 64] [-k 6]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("-k", type=int, default=6)
    ap.add_argument("--warm", type=int, default=4)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.expanduser("~/.cache/hikari_tpu_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp
    import numpy as np

    from hikari_tpu.config import RenderSettings, Taa, Upscale
    from hikari_tpu.diff import replace_scene_field
    from hikari_tpu.io.scenes import cornell_config
    from hikari_tpu.render import initial_state, render_frame
    from hikari_tpu.scene import build_scene_buffers

    scene, cam, _ = cornell_config(size=args.size)
    base = RenderSettings(
        width=args.size, height=args.size, upscale=Upscale.none(),
        denoise=False, taa=Taa.NONE, indirect_bounces=1,
        indirect_spatial_reuse=True, emissive_spatial_reuse=True,
        reservoir_f16=False,
    )
    buffers = build_scene_buffers(scene)

    # Warm, then collect K states at consecutive frame counters: each is
    # a different realization of the same stationary estimator.
    states = []
    state = initial_state(base)
    step = jax.jit(lambda s: render_frame(buffers, cam, s, base)[1])
    for _ in range(args.warm):
        state = step(state)
    for _ in range(args.k):
        state = step(state)
        states.append(state)

    dev = jax.devices()[0]

    def measure(settings, field="mat_emissive"):
        def loss(value, st):
            b = replace_scene_field(buffers, **{field: value})
            out, _ = render_frame(b, cam, st, settings)
            return jnp.mean(out.image[..., :3])

        gfn = jax.jit(jax.grad(loss))
        x0 = getattr(buffers, field)
        g = jax.block_until_ready(gfn(x0, states[0]))  # compile+warm
        grads, dts = [], []
        for st in states:
            t0 = time.perf_counter()
            g = jax.block_until_ready(gfn(x0, st))
            _ = float(jnp.abs(g).sum())
            dts.append(time.perf_counter() - t0)
            grads.append(np.asarray(g))
        G = np.stack(grads)  # (K, ...)
        mean = G.mean(0)
        std = G.std(0)
        signal = np.abs(mean).sum()
        # relative estimator noise on the significant entries
        sig = np.abs(mean) > 0.05 * np.abs(mean).max()
        rel_noise = float((std[sig] / np.abs(mean)[sig]).mean())
        peak = None
        stats = getattr(dev, "memory_stats", lambda: None)()
        if stats:
            peak = stats.get("peak_bytes_in_use")
        return signal, rel_noise, min(dts), peak, mean

    rows = {}
    for flag in (False, True):
        s = base.replace(spatial_radiance_grads=flag)
        rows[flag] = measure(s)
        sig, noise, dt, peak, _ = rows[flag]
        peak_s = f"{peak/2**20:.0f} MiB" if peak else "n/a"
        print(
            f"spatial_radiance_grads={flag!s:5}  |grad|={sig:.4e}  "
            f"rel-noise={noise:.3f}  t/grad={dt*1e3:.1f} ms  peak={peak_s}",
            file=sys.stderr,
        )

    m_off, m_on = rows[False][4], rows[True][4]
    extra = np.abs(m_on - m_off).sum() / max(np.abs(m_off).sum(), 1e-30)
    print(
        f"# radiance-through-reuse term adds {100*extra:.1f}% "
        f"extra |grad| mass vs detached",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()

"""Isolated smaa_tu4x timing at bench shapes (960x540 render, 1080p
G-buffers, zero velocity): adaptive vs forced-gather vs truncated stops.
Scan-folded + value-fetch (tunnel-honest). Localizes the round-4 SMAA
regression independent of the pipeline."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    if "--force" in sys.argv:
        os.environ["HIKARI_FORCE_WINDOW_GATHER"] = "1"
    cache = os.path.expanduser("~/.cache/hikari_tpu_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import numpy as np

    from hikari_tpu.render.smaa import smaa_tu4x
    from hikari_tpu.render.types import GBuffer

    h, w = 540, 960
    oh, ow = 2 * h, 2 * w
    rng = np.random.default_rng(0)

    def arr(*shape):
        return jnp.asarray(rng.uniform(0.1, 1.0, size=shape).astype(np.float32))

    def gb():
        return GBuffer(
            position=arr(oh, ow, 4),
            normal=arr(oh, ow, 3),
            depth_gradient=arr(oh, ow, 2),
            instance=jnp.zeros((oh, ow), jnp.int32),
            material=jnp.zeros((oh, ow), jnp.int32),
            velocity_uv=jnp.concatenate(
                [jnp.zeros((oh, ow, 2)), arr(oh, ow, 2)], axis=-1
            ),
        )

    render = arr(h, w, 4)
    prev_up = arr(oh, ow, 4)
    g, pg = gb(), gb()
    REPS = 8

    stops = [None, "velq", "gather", "clip", "remix", "extrap"]
    if "--quick" in sys.argv:
        stops = [None, "gather", "clip"]

    grad_mode = "--grad" in sys.argv
    if grad_mode and "--stops" not in sys.argv:
        stops = [None]

    for stop in stops:

        def run():
            def step(carry, k):
                if grad_mode:
                    def loss(r, p):
                        out = smaa_tu4x(r, p, g, pg, k, stop=stop)
                        return jnp.sum(out[::64, ::64])

                    l, grads = jax.value_and_grad(loss, argnums=(0, 1))(
                        render + 1e-6 * k, prev_up
                    )
                    return carry + l + 1e-9 * sum(
                        jnp.sum(jnp.abs(gr)) for gr in grads
                    ), None
                out = smaa_tu4x(
                    render + 1e-6 * k, prev_up, g, pg, k, stop=stop
                )
                return carry + jnp.sum(out[::128, ::128]), None

            acc, _ = jax.lax.scan(
                step, jnp.float32(0.0), jnp.arange(REPS, dtype=jnp.int32)
            )
            return acc.reshape(1)

        f = jax.jit(run)
        _ = float(f()[0])
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(f()[0])
            best = min(best, (time.perf_counter() - t0) / REPS)
        print(f"smaa stop={str(stop):8s} {best * 1e3:9.2f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()

"""Measure lax.cond execution overhead on the TPU runtime: a scan of N
steps, each step doing elementwise work either directly or under a
data-dependent cond (predicate = a reduce of the array, always True).
Distinguishes fixed per-cond cost from operand-proportional cost.

Usage: python tools/bench_cond.py [--cpu]
"""

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
    cache = os.path.expanduser("~/.cache/hikari_tpu_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    REPS = 8

    def timed(name, fn):
        f = jax.jit(fn)
        _ = float(f()[0])
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(f()[0])
            best = min(best, (time.perf_counter() - t0) / REPS)
        print(f"{name:46s} {best * 1e3:9.3f} ms", file=sys.stderr)

    for MB, conds in [(8, 1), (8, 8), (64, 1), (64, 8)]:
        n = MB * 1024 * 1024 // 4
        x0 = jnp.arange(n, dtype=jnp.float32).reshape(-1, 1024) * 1e-6

        def work(x):
            return jnp.sin(x) * 1.0001 + 0.1

        def direct():
            def step(x, k):
                y = x
                for _ in range(conds):
                    y = work(y)
                return y, None

            y, _ = jax.lax.scan(step, x0, jnp.arange(REPS))
            return y.reshape(-1)[:1]

        def conded():
            def step(x, k):
                y = x
                for _ in range(conds):
                    pred = jnp.max(y) > -1e30  # data-dep, always True
                    y = jax.lax.cond(pred, work, lambda a: a * 2.0, y)
                return y, None

            y, _ = jax.lax.scan(step, x0, jnp.arange(REPS))
            return y.reshape(-1)[:1]

        timed(f"{MB:3d}MB x {conds} stages, no cond", direct)
        timed(f"{MB:3d}MB x {conds} stages, lax.cond", conded)


if __name__ == "__main__":
    main()

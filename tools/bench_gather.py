"""Microbenchmark TPU image-access primitives (tools/): dynamic 1D
gather vs roll vs identity-index gather vs strided slice at 1080p scale.
Explains where image-space pass time goes (fetch-synced timing)."""

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

    H, W = 1080, 1920
    n = H * W
    img = jnp.arange(n, dtype=jnp.float32).reshape(H, W)
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (n,), 0, n)
    # near-identity indices (reprojection-like: identity + small offset)
    near = jnp.clip(jnp.arange(n) + jax.random.randint(key, (n,), -3000, 3000), 0, n - 1)
    ident = jnp.arange(n)

    REPS = 32

    def timed(name, fn):
        f = jax.jit(fn)
        _ = float(f()[0])
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(f()[0])
            best = min(best, (time.perf_counter() - t0) / REPS)
        print(f"{name:34s} {best*1e3:9.3f} ms  ({n/best/1e9:6.2f} Gelem/s)",
              file=sys.stderr)

    def scan_of(body):
        def run():
            def step(acc, k):
                return acc + body(k), None
            acc, _ = jax.lax.scan(step, jnp.float32(0.0),
                                  jnp.arange(REPS, dtype=jnp.int32))
            return acc.reshape(1)
        return run

    flat = img.reshape(-1)
    timed("random 1D gather (2M of 2M)", scan_of(lambda k: flat[(idx + k) % n].sum()))
    timed("near-identity 1D gather", scan_of(lambda k: flat[jnp.clip(near + k, 0, n - 1)].sum()))
    timed("identity 1D gather", scan_of(lambda k: flat[jnp.clip(ident + k, 0, n - 1)].sum()))
    timed("jnp.roll (static shift)", scan_of(lambda k: jnp.roll(img, 3, axis=0).sum() * (k + 1)))
    timed("dynamic_slice row-shift", scan_of(
        lambda k: jax.lax.dynamic_slice(img, (k % 4, 0), (H - 4, W)).sum()))
    timed("elementwise a*b+c", scan_of(lambda k: (img * (k + 1.0) + 2.0).sum()))
    # 2D advanced indexing the way gather_pixels does it
    y = (jnp.arange(n) // W) % H
    x = (jnp.arange(n) * 7 + 13) % W
    timed("gather_pixels-style (y*W+x)", scan_of(
        lambda k: flat[((y + k) % H) * W + x].sum()))


def rowgather():
    import jax
    import jax.numpy as jnp
    import time, sys

    H, W = 1080, 1920
    n = H * W
    key = jax.random.PRNGKey(1)
    idx = jax.random.randint(key, (n,), 0, n)
    REPS = 8

    def timed(name, fn):
        f = jax.jit(fn)
        _ = float(f()[0])
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(f()[0])
            best = min(best, (time.perf_counter() - t0) / REPS)
        print(f"{name:34s} {best*1e3:9.3f} ms", file=sys.stderr)

    def scan_of(body):
        def run():
            def step(acc, k):
                return acc + body(k), None
            acc, _ = jax.lax.scan(step, jnp.float32(0.0),
                                  jnp.arange(REPS, dtype=jnp.int32))
            return acc.reshape(1)
        return run

    for K in (1, 4, 8, 16, 32, 128):
        tbl = jnp.arange(n * K, dtype=jnp.float32).reshape(n, K)
        timed(f"row gather (2M rows of {K})",
              scan_of(lambda k, tbl=tbl: tbl[(idx + k) % n].sum()))
    # take_along_axis variant
    tbl = jnp.arange(n * 16, dtype=jnp.float32).reshape(n, 16)
    timed("take_along_axis rows of 16", scan_of(
        lambda k, tbl=tbl: jnp.take_along_axis(
            tbl, ((idx + k) % n)[:, None], axis=0).sum()))
    # half-res scalar gather for linearity check
    n2 = n // 4
    flat2 = jnp.arange(n2, dtype=jnp.float32)
    idx2 = jax.random.randint(key, (n2,), 0, n2)
    timed("random 1D gather (0.5M of 0.5M)", scan_of(
        lambda k: flat2[(idx2 + k) % n2].sum()))


if __name__ == "__main__":
    if "--rows" in sys.argv:
        rowgather()
    else:
        main()

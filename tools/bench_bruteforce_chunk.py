"""A/B the brute-force ray-chunk size on the real chip: 2.07M-ray
cornell-scale primary trace, scan-folded + value-fetch timing (CLAUDE.md
tunnel doctrine). Patches the module constant trace/api.RAY_CHUNK (the
knob _trace_bruteforce actually reads) per sweep point; the fixed 8192
default runs 253 sequential scan iterations per trace. Round-4 verdict:
8192 = 21.0 ms/trace, 32768 = 21.3, 131072 = 31.9 — big chunks spill the
fused pair-test intermediates from VMEM to HBM; 8192 stays."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    cache = os.path.expanduser("~/.cache/hikari_tpu_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp

    from hikari_tpu.io.scenes import CONFIGS
    from hikari_tpu.scene import build_scene_buffers
    from hikari_tpu.trace import api

    scene, camera, base = CONFIGS["cornell"]()
    buffers = build_scene_buffers(scene)
    R = 1920 * 1080
    key = jax.random.PRNGKey(0)
    o = jnp.zeros((R, 3)) + jnp.asarray([0.0, 1.0, 3.0])
    d = jax.random.normal(key, (R, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    def one_trace(buffers, o, d):
        hit = api.trace_rays(
            buffers, o, d, max_distance=100.0, method="bruteforce",
            bruteforce_max_tris=1 << 20,
        )
        return jnp.where(hit.prim >= 0, hit.t, 0.0).sum() + hit.u.sum()

    def folded(n):
        def step(c, _):
            # couple the carry into the origin so iterations serialize
            acc = one_trace(buffers, o + c * 1e-30, d)
            return c + 1e-12 * acc, None

        def run(oo):
            c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
            return c

        return jax.jit(run)

    for label, chunk in [
        ("8192", 8192),
        ("32768", 32768),
        ("131072", 131072),
    ]:
        orig = api.RAY_CHUNK
        api.RAY_CHUNK = chunk
        try:
            n = 8
            f = folded(n)
            t0 = time.time()
            v = float(f(o))
            print(f"# {label}: compile+first {time.time()-t0:.1f}s v={v}")
            t0 = time.time()
            v = float(f(o))
            dt = time.time() - t0
            print(
                f"{label}: {n} traces in {dt:.3f}s = {dt/n*1e3:.1f} ms/trace "
                f"({R*n/dt/1e6:.1f} Mrays/s)"
            )
        finally:
            api.RAY_CHUNK = orig


if __name__ == "__main__":
    main()

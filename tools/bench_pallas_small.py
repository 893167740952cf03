"""A/B the Pallas stream kernel vs XLA dense on the cornell-class small
scene (2.07M rays, 32 valid tris in a 128-row padded buffer), scan-folded
+ value-fetch timing. Round-4 kernel rework: (a) pack_triangles trims the
static all-invalid tail (32 tris = 4 sublane tiles, not 16), (b) the
resident path processes RAY_ROWS=8 ray blocks per grid step (the 1-block
steps made 16k ~1.5 KB DMAs per trace)."""

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

    def make(method):
        def one_trace(o):
            hit = api.trace_rays(
                buffers, o, d, max_distance=100.0, method=method,
                bruteforce_max_tris=1 << 20,
            )
            return jnp.where(hit.prim >= 0, hit.t, 0.0).sum() + hit.u.sum()

        def step(c, _):
            acc = one_trace(o + c * 1e-30)
            return c + 1e-12 * acc, None

        def run(oo):
            c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=8)
            return c

        return jax.jit(run)

    for method in ["bruteforce", "pallas"]:
        f = make(method)
        t0 = time.time()
        v = float(f(o))
        print(f"# {method}: compile+first {time.time()-t0:.1f}s v={v:.3e}")
        t0 = time.time()
        v = float(f(o))
        dt = time.time() - t0
        print(
            f"{method}: 8 traces in {dt:.3f}s = {dt/8*1e3:.1f} ms/trace "
            f"({R*8/dt/1e6:.1f} Mrays/s)"
        )


if __name__ == "__main__":
    main()

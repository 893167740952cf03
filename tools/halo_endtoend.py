"""End-to-end manual-halo vs GSPMD decision harness (round-2 VERDICT
item 5): compile the FULL sharded render step both ways on an 8-virtual-
device mesh and compare (a) compiled collective volume/op count from the
HLO (hardware-independent — this is what rides ICI on a pod) and (b) CPU
wall time (mechanism-only; labeled as such). The default for
``make_sharded_render(manual_halo_denoise=...)`` follows the winner of
(a); README records the numbers.

Usage: python tools/halo_endtoend.py [--size 256] [--frames 4]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def collective_stats(compiled_text: str):
    """(op_count, total_elements) over collective-permute/all-gather/
    all-to-all/all-reduce ops in a compiled HLO dump."""
    total = 0
    count = 0
    for m in re.finditer(
        r"=\s*\(?[a-z0-9]+\[([0-9,]*)\][^\n]*?"
        r"\b(collective-permute|all-gather|all-to-all|all-reduce)[\w-]*\(",
        compiled_text,
    ):
        dims = [int(d) for d in m.group(1).split(",") if d]
        n = 1
        for d in dims:
            n *= d
        total += n
        count += 1
    return count, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--frames", type=int, default=4)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    import jax.numpy as jnp
    import numpy as np

    from hikari_tpu.config import RenderSettings, Taa, Upscale
    from hikari_tpu.io.scenes import cornell_config
    from hikari_tpu.parallel import (
        make_mesh,
        make_sharded_render,
        replicate,
        shard_state,
    )
    from hikari_tpu.render import initial_state
    from hikari_tpu.scene import build_scene_buffers

    scene, cam, _ = cornell_config(size=args.size)
    settings = RenderSettings(
        width=args.size, height=args.size,
        upscale=Upscale.smaa_tu4x(2.0), taa=Taa.JASMINE,
        denoise=True, indirect_bounces=1,
    )
    buffers = build_scene_buffers(scene)
    state = initial_state(settings)
    mesh = make_mesh(jax.devices()[:8])

    results = {}
    with mesh:
        b = replicate(buffers, mesh)
        c = replicate(cam, mesh)
        s = shard_state(state, mesh)
        for name, manual in (("gspmd", False), ("manual-halo", True)):
            step = make_sharded_render(
                settings, mesh, manual_halo_denoise=manual
            )
            lowered = step.lower(b, c, s)
            compiled = lowered.compile()
            ops, vol = collective_stats(compiled.as_text())
            # Wall time (CPU; mechanism-only — not pod performance).
            out, ns = step(b, c, s)
            jax.block_until_ready(out.image)
            t0 = time.perf_counter()
            st = s
            for _ in range(args.frames):
                out, st = step(b, c, st)
            jax.block_until_ready(out.image)
            dt = (time.perf_counter() - t0) / args.frames
            results[name] = (ops, vol, dt, np.asarray(out.image))
            print(
                f"{name:12s} collectives: {ops:4d} ops, {vol / 1e6:8.2f} M "
                f"elements; cpu wall {dt * 1e3:8.1f} ms/frame "
                f"(mechanism-only)"
            )

    np.testing.assert_allclose(
        results["gspmd"][3], results["manual-halo"][3], atol=2e-5
    )
    print("outputs identical (atol 2e-5)")
    g, m = results["gspmd"], results["manual-halo"]
    print(
        f"manual/gspmd: ops {m[0] / max(g[0], 1):.2f}x, "
        f"volume {m[1] / max(g[1], 1):.2f}x, wall {m[2] / g[2]:.2f}x"
    )


if __name__ == "__main__":
    main()

"""Ablation for the fused tile-walk's tuning knobs (tools/, not
shipped API): measures rays/s per {use_skip on|off} x tile_r combo so
each knob's cost/benefit is isolated on real hardware. The supercluster
phase-1 variant this script originally measured was REJECTED (coarser
ordering ~halves throughput) and removed; results are recorded in
pallas_tiled.py's use_skip note and STATUS.md.
Usage: python tools/ablate_tiled.py [--cpu] [--configs skip[:tile],...]"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--rays", type=int, default=1 << 20)
    ap.add_argument("--scenes", default="cornell,city-8,helmet")
    ap.add_argument("--configs", default="0,1",
                    help="comma list of skip[:tile_r]")
    ap.add_argument("--stress", action="store_true",
                    help="use the ~1M-triangle terrain scene set")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import os  # noqa: F811

    cache = os.path.expanduser("~/.cache/hikari_tpu_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp
    import numpy as np

    from bench_trace import build_scenes, make_rays
    from hikari_tpu.scene import build_scene_buffers
    from hikari_tpu.trace.api import _morton3
    from hikari_tpu.trace.pallas_tiled import (
        TILE_R,
        pack_clusters,
        trace_pallas_tiled,
    )

    scenes = build_scenes(stress=args.stress)
    if args.stress:
        args.scenes = ",".join(scenes)
    for name in args.scenes.split(","):
        scene = scenes[name]
        b = build_scene_buffers(scene)
        P = int(b.num_tris)
        cluster = 64
        while -(-(P) // cluster) > 16384:
            cluster *= 2
        n = min(args.rays, max(1 << 16, int(4e12) // max(P, 1)))
        n = -(-n // TILE_R) * TILE_R
        o, d = make_rays(b, n)
        maxd = jnp.full((n,), 1e30, jnp.float32)
        early = jnp.zeros((n,), jnp.float32)
        excl = jnp.full((n,), -1, jnp.int32)
        lo = jnp.zeros((n,), jnp.int32)
        hi = jnp.full((n,), P, jnp.int32)

        octant = (
            (d[:, 0] < 0).astype(jnp.int32) * 4
            + (d[:, 1] < 0).astype(jnp.int32) * 2
            + (d[:, 2] < 0).astype(jnp.int32)
        )
        smin = b.inst_min.min(axis=0)
        smax = b.inst_max.max(axis=0)
        cell = jnp.clip(
            (o - smin) / jnp.maximum(smax - smin, 1e-6) * 63.0, 0.0, 63.0
        ).astype(jnp.int32)
        key = (octant << 18) | _morton3(cell)
        order = jnp.argsort(key, stable=True)
        o, d = o[order], d[order]
        packed, cmin, cmax, cvalid = pack_clusters(b, cluster)
        interpret = jax.default_backend() != "tpu"

        print(f"# {name}: {P} tris, cluster={cluster}, rays={n}",
              file=sys.stderr)
        for cfg in args.configs.split(","):
            parts = [int(x) for x in cfg.split(":")]
            sk = parts[0]
            tr = parts[1] if len(parts) > 1 else TILE_R
            fn = jax.jit(
                lambda *a, sk=sk, tr=tr: trace_pallas_tiled(
                    *a, interpret=interpret, cluster=cluster,
                    use_skip=bool(sk), tile_r=tr,
                )
            )
            out = fn(packed, cmin, cmax, cvalid, o, d, maxd, early,
                     excl, lo, hi)
            jax.block_until_ready(out)
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn(packed, cmin, cmax, cvalid, o, d, maxd, early,
                         excl, lo, hi)
                jax.block_until_ready(out)
                # honest tunnel timing: fetch a value
                float(out[0][0])
                reps.append(time.perf_counter() - t0)
            best = min(reps)
            print(
                f"  skip={sk} tile={tr:4d}"
                f"  {n/best/1e6:8.2f} Mrays/s"
                f"   reps={['%.3f' % r for r in reps]}",
                file=sys.stderr,
            )


if __name__ == "__main__":
    main()

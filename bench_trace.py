"""Tracer-backend benchmark: rays/s for bruteforce vs bvh vs pallas at
three scene sizes (VERDICT round-1 item 2 — the hot-loop measurement the
Cornell pipeline bench can't provide; reference hot loop:
src/shaders/light.wgsl:400-486).

Scenes:
  cornell          32 triangles (padded 128)   — MXU bruteforce class
  city-8           ~8k triangles               — crossover class
  city-24 | helmet >=100k triangles            — BVH-walk class

Each backend traces coherent primary rays + incoherent bounce rays
(the two workload shapes the light passes issue). Prints one JSON line
per (scene, backend) to stdout; a summary table to stderr.

Usage: python bench_trace.py [--rays 1048576] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def build_scenes(stress: bool = False):
    from hikari_tpu.io.scenes import (
        cornell_box_scene,
        procedural_city,
        procedural_terrain,
        _sun_from_euler,
    )
    from hikari_tpu.scene.compile import Scene

    if stress:
        # Million-triangle class only (pair it with --backends to pick
        # the tracers that can take it).
        return {
            "terrain-1m": procedural_terrain(
                Scene(
                    materials=[],
                    directional_light=_sun_from_euler(-1.0, 0.6, 0.0),
                ),
                n=708,
            )
        }

    scenes = {"cornell": cornell_box_scene()}
    scenes["city-8"] = procedural_city(
        Scene(materials=[], directional_light=_sun_from_euler(-1.0, 0.6, 0.0)),
        blocks=8,
    )
    helmet = "/root/reference/assets/models/FlightHelmet/FlightHelmet.gltf"
    if os.path.exists(helmet):
        from hikari_tpu.io.gltf import load_gltf

        scenes["helmet"] = load_gltf(
            helmet,
            Scene(materials=[], directional_light=_sun_from_euler(-1.0, 0.6, 0.0)),
        )
    else:
        scenes["city-24"] = procedural_city(
            Scene(materials=[], directional_light=_sun_from_euler(-1.0, 0.6, 0.0)),
            blocks=24,
        )
    # Reference-scale acceptance geometry (round-2 VERDICT item 7):
    # 16x16 blocks of window-facade towers, ~551k tris / 256 instances.
    scenes["city-551k"] = procedural_city(
        Scene(materials=[], directional_light=_sun_from_euler(-1.0, 0.6, 0.0)),
        blocks=16,
        detail=True,
    )
    return scenes


def make_rays(buffers, n, seed=0):
    """Half coherent (camera-style grid into the scene), half incoherent
    (random origins in the scene AABB, random directions)."""
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(seed)
    lo = np.asarray(buffers.inst_min).min(0)
    hi = np.asarray(buffers.inst_max).max(0)
    center = 0.5 * (lo + hi)
    diag = float(np.linalg.norm(hi - lo))

    nc = n // 2
    side = int(np.sqrt(nc))
    nc = side * side
    ys, xs = np.meshgrid(
        np.linspace(-0.5, 0.5, side), np.linspace(-0.5, 0.5, side), indexing="ij"
    )
    eye = center + np.array([0.0, 0.25 * diag, 1.2 * diag], np.float32)
    d_coh = np.stack(
        [xs.ravel(), ys.ravel() - 0.2, -np.ones(nc)], axis=-1
    ).astype(np.float32)
    d_coh /= np.linalg.norm(d_coh, axis=-1, keepdims=True)
    o_coh = np.broadcast_to(eye, (nc, 3)).astype(np.float32)

    ni = n - nc
    o_inc = rng.uniform(lo, hi, (ni, 3)).astype(np.float32)
    d_inc = rng.normal(size=(ni, 3)).astype(np.float32)
    d_inc /= np.linalg.norm(d_inc, axis=-1, keepdims=True)

    o = jnp.asarray(np.concatenate([o_coh, o_inc]))
    d = jnp.asarray(np.concatenate([d_coh, d_inc]))
    return o, d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 20)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--backends",
        default="bruteforce,bvh,pallas,tiled,pallas_tiled,scatter",
    )
    ap.add_argument(
        "--stress", action="store_true",
        help="bench the ~1M-triangle terrain instead of the 3-scene set",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.expanduser("~/.cache/hikari_tpu_jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import numpy as np

    from hikari_tpu.scene import build_scene_buffers
    from hikari_tpu.trace import trace_rays

    device = jax.devices()[0].platform
    print(f"# device={device}", file=sys.stderr)

    rows = []
    for name, scene in build_scenes(stress=args.stress).items():
        buffers = build_scene_buffers(scene)
        o, d = make_rays(buffers, args.rays)
        print(f"# {name}: {buffers.num_tris} triangles", file=sys.stderr)
        for method in args.backends.split(","):
            # The remote-TPU tunnel kills single executions over ~30 s AND
            # wedges the client afterwards — size each call to stay well
            # under (dense pair budget ~4e10 pairs ~ 6 s; lockstep walk is
            # far slower per ray on big scenes).
            if method == "bvh":
                budget = args.rays if buffers.num_tris <= 10_000 else 1 << 16
            elif method == "pallas_tiled":
                # per-tile early exit: kernel cost scales with visited
                # clusters, but the XLA phase-1 entry pass is rays x
                # (tris/cluster) AABB tests — cap those pairs
                budget = max(1 << 16, int(5.1e11) // max(buffers.num_tris, 1))
            elif method == "scatter":
                # exact entered-pair cost, but the item arrays are
                # items_per_ray * R wide — cap the footprint
                budget = 1 << 18
            else:
                budget = max(1 << 16, int(4e10) // max(buffers.num_tris, 1))
            n_rays = min(args.rays, 1 << max(budget, 2).bit_length() - 1)
            n_rays = max(n_rays, 1 << 14)
            ob, db = o[:n_rays], d[:n_rays]

            def run(oo=ob, dd=db):
                h = trace_rays(buffers, oo, dd, method=method)
                return h.t

            try:
                import jax.numpy as jnp

                fn = jax.jit(run)
                t = jax.block_until_ready(fn())  # compile+warm
                # HONEST timing: a VALUE FETCH is the only sync the tunnel
                # honors (block_until_ready can return without waiting —
                # CLAUDE.md, tools/verify_bench.py). For sub-second calls,
                # fold repetitions into ONE jitted lax.scan (origins
                # perturbed per iteration to defeat CSE) so the ~25 ms
                # per-call tunnel overhead amortizes without queueing.
                t0 = time.perf_counter()
                _ = float(fn()[0])  # element fetch forces completion
                probe = time.perf_counter() - t0
                inner = int(max(1, min(64, 0.5 / max(probe, 1e-3))))
                if inner > 1:

                    def run_scan(oo=ob, dd=db):
                        def body(acc, k):
                            h = trace_rays(
                                buffers,
                                oo + 1e-7 * k,
                                dd,
                                method=method,
                            )
                            return acc + h.t.sum(), None

                        acc, _ = jax.lax.scan(
                            body,
                            jnp.float32(0.0),
                            jnp.arange(inner, dtype=jnp.float32),
                        )
                        return acc

                    fn = jax.jit(lambda: run_scan().reshape(1))
                    _ = float(fn()[0])  # compile+warm
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    _ = float(fn()[0])  # fetch = the only real sync
                    best = min(best, (time.perf_counter() - t0) / inner)
                rps = n_rays / best
                hit_frac = float(np.isfinite(np.asarray(t)).mean())
                rows.append((name, buffers.num_tris, method, rps))
                print(
                    json.dumps(
                        {
                            "metric": f"trace rays/s [{name}/{method}]",
                            "value": rps,
                            "unit": "rays/s",
                            "tris": buffers.num_tris,
                        }
                    )
                )
            except Exception as e:
                print(f"# {name}/{method} FAILED: {e}", file=sys.stderr)

    print(f"\n# {'scene':<10} {'tris':>8} {'backend':<12} {'Mrays/s':>10}", file=sys.stderr)
    for name, tris, method, rps in rows:
        print(f"# {name:<10} {tris:>8} {method:<12} {rps / 1e6:>10.1f}", file=sys.stderr)
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


if __name__ == "__main__":
    main()

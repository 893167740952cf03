"""Split the city trace cost on TPU: phase 1 (entries + argsort) vs the
full pallas tile-walk, on the EXACT primary rays of the city config at
512p. Tunnel-honest scan+fetch timing."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    import jax, jax.numpy as jnp, numpy as np
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.expanduser("~/.cache/hikari_tpu_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from hikari_tpu.io.scenes import CONFIGS
    from hikari_tpu.scene import build_scene_buffers
    from hikari_tpu.trace.tiled import _cluster_bounds, tile_cluster_entries, safe_inv_dir
    from hikari_tpu.trace.api import trace_rays
    from hikari_tpu.trace.pallas_tiled import pack_clusters, trace_pallas_tiled

    if "--helmet" in sys.argv:
        from bench_trace import build_scenes, make_rays
        buffers = build_scene_buffers(build_scenes()["helmet"])
        o, d = make_rays(buffers, 1 << 18)  # mixed coherent/incoherent
        o = jnp.asarray(o); d = jnp.asarray(d)
    elif "--scene" in sys.argv:
        # The scene config's EXACT 512p primary rays (the gbuffer trace
        # that is 62.5 of the 75 ms scene prepass, round-5 ladder).
        scene, cam, settings = CONFIGS["scene"]()
        buffers = build_scene_buffers(scene)
        o, d = cam.pixel_rays((512, 512), None)
        o = o.reshape(-1, 3); d = d.reshape(-1, 3)
    else:
        scene, cam, settings = CONFIGS["city"]()
        buffers = build_scene_buffers(scene)
        h = w = 512
        o, d = cam.pixel_rays((h, w), None)
        o = o.reshape(-1, 3); d = d.reshape(-1, 3)
    R = o.shape[0]
    maxd = jnp.full((R,), 1e30, jnp.float32)
    REPS = 8

    def timed(name, fn):
        f = jax.jit(fn)
        _ = float(f()[0])
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(f()[0]); best = min(best, (time.perf_counter() - t0) / REPS)
        print(f"{name:44s} {best*1e3:9.2f} ms", file=sys.stderr)

    def scan_of(body):
        def run():
            def step(acc, k):
                return acc + body(k), None
            acc, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(REPS, dtype=jnp.int32))
            return acc.reshape(1)
        return run

    cmin, cmax, cvalid = _cluster_bounds(buffers)
    TILE_R = 512
    ot = o.reshape(-1, TILE_R, 3); maxdt = maxd.reshape(-1, TILE_R)

    def phase1(k):
        iv = safe_inv_dir(ot + k * 0.0)
        e, rm = tile_cluster_entries(cmin, cmax, cvalid, ot, iv, maxdt)
        order = jnp.argsort(e, axis=1)
        return jnp.sum(order[:, 0].astype(jnp.float32)) + jnp.sum(rm[:, 0])

    timed("phase1: entries + argsort (512 tiles)", scan_of(phase1))

    def phase1_noargsort(k):
        iv = safe_inv_dir(ot + k * 0.0)
        e, rm = tile_cluster_entries(cmin, cmax, cvalid, ot, iv, maxdt)
        return jnp.sum(e[:, 0]) + jnp.sum(rm[:, 0])

    timed("phase1: entries only", scan_of(phase1_noargsort))

    def full(k):
        hit = trace_rays(buffers, o + k * 0.0, d, max_distance=jnp.float32(1e30),
                         method="pallas_tiled")
        return jnp.sum(hit.t * (hit.prim >= 0))

    timed("full pallas_tiled trace (262k primary)", scan_of(full))

    # Sweep cluster size / skip through the kernel directly (morton-sorted
    # rays like the production wrapper).
    from hikari_tpu.trace.api import _morton3
    octant = ((d[:, 0] < 0).astype(jnp.int32) * 4
              + (d[:, 1] < 0).astype(jnp.int32) * 2
              + (d[:, 2] < 0).astype(jnp.int32))
    smin = buffers.inst_min.min(axis=0); smax = buffers.inst_max.max(axis=0)
    cell = jnp.clip((o - smin) / jnp.maximum(smax - smin, 1e-6) * 63.0,
                    0.0, 63.0).astype(jnp.int32)
    key = (octant << 18) | _morton3(cell)
    order = jnp.argsort(key, stable=True)
    os_, ds_ = o[order], d[order]
    zeros = jnp.zeros((R,))
    for cl in (64, 128, 256, 512):
        for skip in (False, True):
            def walk(k, cl=cl, skip=skip):
                # pack INSIDE the jit: a closed-over packed constant
                # (282 MB at cluster=64) blows the tunnel's payload cap
                packed, cmi, cma, cva = pack_clusters(buffers, cl)
                t, prim, u, v = trace_pallas_tiled(
                    packed, cmi, cma, cva, os_ + k * 0.0, ds_,
                    jnp.full((R,), 1e30, jnp.float32), zeros,
                    jnp.full((R,), -1.0), zeros, jnp.full((R,), 1e9),
                    cluster=cl, use_skip=skip)
                return jnp.sum(t * (prim >= 0))
            timed(f"kernel cluster={cl:4d} skip={int(skip)}", scan_of(walk))

if __name__ == "__main__":
    main()

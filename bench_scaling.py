"""Multi-host scaling benchmark: rays/s at 1..N processes + efficiency.

BASELINE north star: >=90% linear rays/s scaling from 1 to 4 hosts on a
v5e pod slice. This harness measures the real multi-process code path
(jax.distributed process group, ("hosts","chips") mesh, host-local data,
cross-process collectives). On a pod, run one process per host with no
--cpu flags and cluster auto-detection; on this single machine it runs
CPU dryrun processes (gloo playing DCN) — same program, same shardings.

Usage (parent orchestrates everything):
  python bench_scaling.py --procs 2 --chips 4 --size 256 --frames 6

Prints one JSON line:
  {"metric": "scaling efficiency", "value": eff, ...}
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def worker(args) -> None:
    from hikari_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.procs,
        process_id=args.worker,
        cpu_devices_per_process=args.chips if args.cpu else None,
    )
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.expanduser("~/.cache/hikari_tpu_jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from bench import rays_per_frame
    from hikari_tpu.config import Taa, Upscale
    from hikari_tpu.io.scenes import cornell_config
    from hikari_tpu.scene import build_scene_buffers

    # Host-local scene compile (each process builds its replica, like each
    # pod host uploading the same scene buffers).
    scene, camera, settings = cornell_config(size=args.size)
    settings = settings.replace(
        upscale=Upscale.smaa_tu4x(2.0),
        taa=Taa.JASMINE,
        denoise=True,
        indirect_bounces=1,
    )
    buffers = build_scene_buffers(scene)

    mesh = multihost.host_mesh()
    buffers = multihost.replicate_host_local(buffers, mesh)
    camera = multihost.replicate_host_local(camera, mesh)
    state = multihost.host_local_state(settings, mesh)
    target = multihost.host_local_image(
        mesh,
        settings.output_size + (3,),
        lambda lo, hi: np.zeros((hi - lo, settings.width, 3), np.float32),
    )
    step = multihost.make_multihost_train_step(settings, mesh)

    loss, grads, out, state = step(buffers, camera, state, target)
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for _ in range(args.frames):
        loss, grads, out, state = step(buffers, camera, state, target)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    rays = rays_per_frame(settings, buffers) * args.frames
    if jax.process_index() == 0:
        print(
            json.dumps(
                {
                    "procs": args.procs,
                    "devices": jax.device_count(),
                    "rays_per_sec": rays / dt,
                    "dt": dt,
                    "loss": float(loss),
                }
            ),
            flush=True,
        )
    jax.distributed.shutdown()


def run_group(procs: int, args, port: int) -> dict:
    """Spawn a process group of size ``procs``; return proc 0's stats."""
    children = []
    for i in range(procs):
        cmd = [
            sys.executable,
            os.path.abspath(__file__),
            "--worker", str(i),
            "--procs", str(procs),
            "--chips", str(args.chips),
            "--size", str(args.size),
            "--frames", str(args.frames),
            "--port", str(port),
        ]
        if args.cpu:
            cmd.append("--cpu")
        children.append(
            subprocess.Popen(
                cmd,
                stdout=subprocess.PIPE if i == 0 else subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
                text=True,
            )
        )
    out0, _ = children[0].communicate(timeout=3000)
    for c in children[1:]:
        c.wait(timeout=300)
    line = [l for l in out0.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--chips", type=int, default=4, help="devices per process")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--port", type=int, default=12399)
    ap.add_argument("--cpu", action="store_true", default=True)
    ap.add_argument("--worker", type=int, default=None)
    args = ap.parse_args()

    if args.worker is not None:
        worker(args)
        return

    base = run_group(1, args, args.port)
    multi = run_group(args.procs, args, args.port + 1)
    # Linear-scaling efficiency: rays/s per device, N procs vs 1 proc.
    per_dev_1 = base["rays_per_sec"] / base["devices"]
    per_dev_n = multi["rays_per_sec"] / multi["devices"]
    eff = per_dev_n / per_dev_1
    result = {
        "metric": f"scaling efficiency {args.procs}x{args.chips} vs 1x{args.chips}",
        "value": eff,
        "unit": "fraction of linear",
        "rays_per_sec_1host": base["rays_per_sec"],
        f"rays_per_sec_{args.procs}host": multi["rays_per_sec"],
    }
    if args.cpu:
        # CPU dryrun processes OVERSUBSCRIBE the same physical cores, so
        # the efficiency number here only validates the mechanism (mesh,
        # host-local data, cross-process collectives), not pod scaling.
        result["note"] = "cpu-dryrun: mechanism validation only"
    print(json.dumps(result))


if __name__ == "__main__":
    main()

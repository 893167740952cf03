"""Bench-level A/B harness for default/backend flips (VERDICT r4 item 8).

Runs the REAL driver bench (bench.py, tunnel-honest scan+fetch) once per
configuration — each config expressed as env overrides — in separate
subprocesses so env-read-at-trace-time knobs take effect, and prints one
line per cell: config, ms/frame, Mrays/s. Any commit that flips a
pipeline default MUST quote this tool's two relevant rows (the round-4
static-path switch landed as a 697→754 ms regression because only an
isolated microbench was consulted).

Usage:
  python tools/ab_bench.py                    # the remat x reproject matrix
  python tools/ab_bench.py --config city      # matrix on another scene
  python tools/ab_bench.py --cells KEY=V[,KEY=V...] [KEY=V...]
      # explicit cells, e.g.:
      #   --cells HIKARI_BENCH_REPROJECT=shift HIKARI_BENCH_REPROJECT=adaptive
Each cell runs bench.py --config <scene> with HIKARI_BENCH_NO_EXTRA=1 and
parses the JSON line; ms/frame is derived from the rays/s value and the
per-frame ray count embedded in the stderr rep lines.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT_MATRIX = [
    {"HIKARI_BENCH_REMAT": r, "HIKARI_BENCH_REPROJECT": m}
    for r in ("0", "1")
    for m in ("adaptive", "shift", "gather")
]


def run_cell(overrides: dict, config: str, timeout: float) -> dict:
    env = dict(os.environ)
    env.update(overrides)
    env["HIKARI_BENCH_NO_EXTRA"] = "1"
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--config", config],
            env=env, cwd=REPO, capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return {"overrides": overrides, "error": f"timeout {timeout}s"}
    wall = time.time() - t0
    out = {"overrides": overrides, "wall_s": round(wall, 1)}
    # ms/frame from the stderr rep lines (best rep), value from the JSON.
    ms = [
        float(m.group(1))
        for m in re.finditer(r"\(([\d.]+) ms/frame", proc.stderr)
    ]
    if ms:
        out["ms_per_frame"] = min(ms)
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                rec = json.loads(line)
                out["rays_per_s"] = rec.get("value")
                out["vs_baseline"] = rec.get("vs_baseline")
            except json.JSONDecodeError:
                pass
    if proc.returncode != 0 and "ms_per_frame" not in out:
        out["error"] = (proc.stderr or "")[-500:]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="cornell")
    ap.add_argument(
        "--cells", nargs="*", default=None,
        help="explicit cells as comma-joined KEY=V overrides; default is "
        "the remat x reproject matrix",
    )
    ap.add_argument("--timeout", type=float, default=1800.0)
    args = ap.parse_args()

    if args.cells:
        cells = []
        for cell in args.cells:
            cells.append(dict(kv.split("=", 1) for kv in cell.split(",")))
    else:
        cells = DEFAULT_MATRIX

    results = []
    for overrides in cells:
        label = ",".join(f"{k.replace('HIKARI_BENCH_', '')}={v}"
                         for k, v in overrides.items())
        print(f"# running {label} ...", file=sys.stderr, flush=True)
        r = run_cell(overrides, args.config, args.timeout)
        results.append(r)
        msg = (
            f"{label}: {r['ms_per_frame']:.1f} ms/frame"
            if "ms_per_frame" in r
            else f"{label}: ERROR {r.get('error', '?')[:200]}"
        )
        print(msg, flush=True)
    print(json.dumps({"config": args.config, "cells": results}))


if __name__ == "__main__":
    main()

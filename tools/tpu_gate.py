"""TPU memory gate: AOT-compile the EXACT driver-bench executable (the
1080p cornell fwd+grad scan from bench.py:build_bench_case) on the real
TPU and fail if the projected HBM peak exceeds the budget.

Run this BEFORE committing any image-pass or perf rework (CLAUDE.md):
round 2's last three commits were validated CPU-only and the driver bench
then OOMed on 20+ lane-padded (1, 2073600) remat temps (BENCH_r02.json).
Compilation happens server-side through the tunnel (~minutes cold, cached
afterwards — the compiled HLO is shared with bench.py, so a green gate
also pre-warms the driver bench's compile cache).

Usage:
  python tools/tpu_gate.py [--config cornell] [--frames 8] [--budget-gib 14]

Exit 0 = under budget; exit 1 = over budget or compile OOM (the XLA
allocation breakdown is printed either way).
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="cornell")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--budget-gib", type=float, default=14.0)
    ap.add_argument(
        "--cpu", action="store_true",
        help="compile for CPU instead (layout checks only, no HBM gate)",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import bench

    bench.enable_compile_cache()
    dev = jax.devices()[0]
    print(f"# gate device: {dev.platform} ({dev.device_kind})", file=sys.stderr)

    run, ops, settings = bench.build_bench_case(args.config, args.frames)
    lowered = run.lower(*ops)
    try:
        compiled = lowered.compile()
    except Exception as e:  # RESOURCE_EXHAUSTED carries the breakdown
        msg = str(e)
        print("GATE FAIL: compile raised", file=sys.stderr)
        print(msg[-8000:], file=sys.stderr)
        _summarize_padding(msg)
        return 1

    mem = compiled.memory_analysis()
    gib = 2.0**30
    total = None
    try:
        arg = mem.argument_size_in_bytes
        out = mem.output_size_in_bytes
        tmp = mem.temp_size_in_bytes
        alias = getattr(mem, "alias_size_in_bytes", 0)
        total = arg + out + tmp - alias
        print(
            f"args={arg / gib:.2f} out={out / gib:.2f} temp={tmp / gib:.2f} "
            f"alias={alias / gib:.2f} GiB -> projected peak {total / gib:.2f} GiB"
        )
    except Exception as e:
        print(f"memory_analysis fields unavailable: {e}", file=sys.stderr)

    # Scan the post-optimization HLO for pathologically lane-padded buffers
    # ((X, 1)/(1, X) f32 planes pad 128x on TPU) regardless of peak.
    bad = _padded_suspects(compiled)
    for s in bad[:12]:
        print(f"  suspect lane-padded temp: {s}", file=sys.stderr)

    if total is not None and total > args.budget_gib * gib:
        print(
            f"GATE FAIL: projected peak {total / gib:.2f} GiB "
            f"> budget {args.budget_gib} GiB"
        )
        return 1
    if args.cpu:
        print("GATE (cpu): compile ok (no HBM budget check)")
        return 0
    print(f"GATE PASS: projected peak under {args.budget_gib} GiB budget")
    return 0


def _padded_suspects(compiled):
    """Grep compiled HLO for rank-2 f32 buffers with a size-1 minor dim at
    image scale — the exact shape class behind the round-2 OOM."""
    try:
        hlo = compiled.as_text()
    except Exception:
        return []
    pat = re.compile(r"f32\[(\d+),(\d+)\]\{0,1[^}]*\}")
    out = set()
    for m in pat.finditer(hlo):
        a, b = int(m.group(1)), int(m.group(2))
        if a == 1 and b >= 1 << 20:
            out.add(m.group(0))
    return sorted(out)


def _summarize_padding(msg: str):
    pat = re.compile(r"Extra memory due to padding: ([\d.]+)([MG]) \(([\d.]+)x")
    tot = 0.0
    n = 0
    for m in pat.finditer(msg):
        v = float(m.group(1)) * (1024 if m.group(2) == "G" else 1)
        tot += v
        n += 1
    if n:
        print(
            f"# {n} padded allocations in breakdown, "
            f"{tot / 1024:.2f} GiB padding total",
            file=sys.stderr,
        )


if __name__ == "__main__":
    sys.exit(main())

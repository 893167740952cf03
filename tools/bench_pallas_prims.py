"""Microbench Pallas TPU candidates for the round-4 op-category change
(docs/ROOFLINE.md §3): (1) a fused pack kernel that builds the
(H*W, K) window tables by streaming the source planes once, (2) in-kernel
dynamic_gather (jnp.take_along_axis -> tpu.dynamic_gather) as the building
block for tile-local reprojection gathers.

All pack candidates are consumed by the SAME row gather the pipeline
does (a sum alone lets XLA reassociate the transpose away — measured:
the "pack" then costs 2.3 ms because it never materializes).

Tunnel-honest timing: jitted lax.scan of REPS invocations folded into a
carried scalar, synced by a value fetch (CLAUDE.md "Timing on the
tunnel").

Usage: python tools/bench_pallas_prims.py [--cpu] [--full-errors]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.expanduser("~/.cache/hikari_tpu_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    interpret = jax.devices()[0].platform == "cpu"
    REPS = 16

    def timed(name, fn, check=None):
        f = jax.jit(fn)
        try:
            out = f()
            v = float(out[0])
        except Exception as e:
            if "--full-errors" in sys.argv:
                traceback.print_exc()
            print(f"{name:44s} FAILED: {repr(e)[:160]}", file=sys.stderr)
            return
        if check is not None and abs(v - check) > abs(check) * 1e-4 + 1e-3:
            print(f"{name:44s} WRONG: {v} != {check}", file=sys.stderr)
            return
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(f()[0])
            best = min(best, (time.perf_counter() - t0) / REPS)
        print(f"{name:44s} {best * 1e3:9.3f} ms", file=sys.stderr)

    def scan_of(body):
        def run():
            def step(acc, k):
                return acc + body(k), None

            acc, _ = jax.lax.scan(
                step, jnp.float32(0.0), jnp.arange(REPS, dtype=jnp.int32)
            )
            return acc.reshape(1)

        return run

    # ---------------------------------------------------------------
    # 1. Window-table pack + row gather (the real pipeline pattern).
    # ---------------------------------------------------------------
    H, W = 1080, 1920
    N = H * W
    K = 128
    C = 8
    planes = [
        jnp.sin(jnp.arange(N, dtype=jnp.float32) * 1e-5 * (1 + c)).reshape(H, W)
        for c in range(C)
    ]
    DXS = list(range(16))
    PADW = 128  # pad W 1920 -> 2048 for mosaic-friendly lane dims
    key = jax.random.PRNGKey(0)
    # reprojection-like near-identity row indices
    gidx = jnp.clip(
        jnp.arange(N) + jax.random.randint(key, (N,), -3000, 3000), 0, N - 1
    )

    def consume(table, k):
        return table[(gidx + k) % N].sum()

    def xla_pack(k):
        from hikari_tpu.render.filters import pack_rows

        parts = []
        for p in planes:
            pp = jnp.pad(p + k, ((0, 0), (0, PADW)), mode="edge")
            for dx in DXS:
                parts.append(pp[:, dx : dx + W])
        return consume(pack_rows(parts), k)

    timed("XLA pack 8x16 -> (2M,128) + gather", scan_of(xla_pack))

    # Pallas fused pack v2: grid (H//TB, TB). At s == 0 the kernel DMAs a
    # (TB + 4, Wp) slab of every plane into VMEM scratch (rows persist
    # across the TB minor steps); each s step assembles the K tap rows of
    # ONE image row as a (K, W) matrix and writes its transposed (W, K)
    # table block — out blocks stay ~1 MB so double-buffering fits VMEM.
    TB = 16
    MD = 2  # row halo for dy taps (probe taps are dx-only; keep the DMA
    # shape of the real kernel anyway)
    Wp = W + PADW

    def pack_kernel_v2(*refs):
        ins = refs[:C]
        out = refs[C]
        slabs = refs[C + 1 : C + 1 + C]
        sem = refs[-1]
        t = pl.program_id(0)
        s = pl.program_id(1)

        def dma(ci):
            return pltpu.make_async_copy(
                ins[ci].at[pl.ds(t * TB, TB + 2 * MD), :],
                slabs[ci],
                sem.at[ci],
            )

        @pl.when(s == 0)
        def _():
            for ci in range(C):
                dma(ci).start()
            for ci in range(C):
                dma(ci).wait()

        rows = []
        for ci in range(C):
            for dx in DXS:
                rows.append(slabs[ci][pl.ds(s + MD, 1), dx : dx + W])
        mat = jnp.concatenate(rows, axis=0)  # (K, W)
        out[:] = mat.T

    def pallas_pack_v2(k):
        padded = [
            jnp.pad(p + k, ((MD, MD), (0, PADW)), mode="edge")
            for p in planes
        ]
        out = pl.pallas_call(
            pack_kernel_v2,
            out_shape=jax.ShapeDtypeStruct((N, K), jnp.float32),
            grid=(H // TB, TB),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * C,
            out_specs=pl.BlockSpec(
                (W, K), lambda t, s: (t * TB + s, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[pltpu.VMEM((TB + 2 * MD, Wp), jnp.float32)] * C
            + [pltpu.SemaphoreType.DMA((C,))],
            interpret=interpret,
        )(*padded)
        return consume(out, k)

    ref_val = None
    try:
        ref_val = float(jax.jit(scan_of(xla_pack))()[0])
    except Exception:
        pass
    timed(
        "pallas pack v2 (row blocks) + gather",
        scan_of(pallas_pack_v2),
        check=ref_val,
    )

    # ---------------------------------------------------------------
    # 2. In-kernel dynamic_gather probes.
    # ---------------------------------------------------------------
    M, Nc = 512, 512
    x = jnp.arange(M * Nc, dtype=jnp.float32).reshape(M, Nc) * 1e-4
    idx0 = jax.random.randint(key, (M, Nc), 0, M, dtype=jnp.int32)
    idx1 = jax.random.randint(key, (M, Nc), 0, Nc, dtype=jnp.int32)

    def make_g(axis, idx, mode=None):
        def g_kernel(x_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(
                x_ref[:], i_ref[:], axis=axis, mode=mode
            )

        def body(k):
            out = pl.pallas_call(
                g_kernel,
                out_shape=jax.ShapeDtypeStruct((M, Nc), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=interpret,
            )(x + k, idx)
            return out.sum()

        return body

    # tpu.dynamic_gather requires the gather dim to fit ONE vreg
    # (measured: 512-wide gather dims fail with "Multiple source vregs
    # along gather dimension"). Probe the supported shapes: axis=1 with a
    # 128-lane gather dim, axis=0 with an 8-sublane one.
    M1, N1 = 512, 128
    x1 = jnp.arange(M1 * N1, dtype=jnp.float32).reshape(M1, N1) * 1e-4
    j1 = jax.random.randint(key, (M1, N1), 0, N1, dtype=jnp.int32)

    def make_vreg_g(axis, xin, idx, reps_inner=32):
        Mv, Nv = xin.shape

        def g_kernel(x_ref, i_ref, o_ref):
            acc = jnp.zeros((Mv, Nv), jnp.float32)
            for r in range(reps_inner):
                acc = acc + jnp.take_along_axis(
                    x_ref[:] + r, i_ref[:], axis=axis
                )
            o_ref[:] = acc

        def body(k):
            out = pl.pallas_call(
                g_kernel,
                out_shape=jax.ShapeDtypeStruct((Mv, Nv), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=interpret,
            )(xin + k, idx)
            return out.sum()

        want = (
            REPS
            * float(
                sum(
                    float(jnp.take_along_axis(xin + 0.0, idx, axis=axis).sum())
                    + r * idx.size
                    for r in range(reps_inner)
                )
            )
            + sum(range(REPS)) * reps_inner * idx.size
        )
        return body, want

    b, w_ = make_vreg_g(1, x1, j1)
    timed("in-kernel 32x gather axis=1 (512x128)", scan_of(b), check=w_)
    b, w_ = make_vreg_g(1, x1, j1, reps_inner=128)
    timed("in-kernel 128x gather axis=1 (512x128)", scan_of(b), check=w_)
    b, w_ = make_vreg_g(1, x1, j1, reps_inner=1)
    timed("in-kernel 1x gather axis=1 (512x128)", scan_of(b), check=w_)
    M0, N0 = 8, 1024
    x0 = jnp.arange(M0 * N0, dtype=jnp.float32).reshape(M0, N0) * 1e-4
    j0 = jax.random.randint(key, (M0, N0), 0, M0, dtype=jnp.int32)
    b, w_ = make_vreg_g(0, x0, j0)
    timed("in-kernel 32x gather axis=0 (8x1024)", scan_of(b), check=w_)


if __name__ == "__main__":
    main()

"""Pallas intersection kernel: differential test against the XLA
brute-force backend (interpret mode on CPU; the same kernel compiles for
TPU via Mosaic)."""

import jax.numpy as jnp
import numpy as np

from hikari_tpu.trace.api import trace_rays


def test_pallas_matches_bruteforce(cornell_buffers, rng):
    b = cornell_buffers
    o = jnp.asarray(rng.uniform(-2, 2, size=(300, 3)).astype(np.float32))
    d = rng.normal(size=(300, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))

    hb = trace_rays(b, o, d, method="bruteforce")
    hp = trace_rays(b, o, d, method="pallas")
    np.testing.assert_allclose(np.asarray(hb.t), np.asarray(hp.t), rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(hb.prim), np.asarray(hp.prim))


def test_pallas_exclusion_and_range(cornell_buffers, rng):
    b = cornell_buffers
    o = jnp.asarray(rng.uniform(-0.5, 0.5, size=(128, 3)).astype(np.float32))
    d = rng.normal(size=(128, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    h0 = trace_rays(b, o, d, method="pallas")
    excl = h0.inst
    h1 = trace_rays(b, o, d, exclude_instance=excl, method="pallas")
    both = (np.asarray(h0.inst) >= 0) & (np.asarray(h1.inst) >= 0)
    assert (np.asarray(h1.inst)[both] != np.asarray(excl)[both]).all()

    lo = int(np.asarray(b.inst_prim_offset)[1])
    hi = lo + int(np.asarray(b.inst_prim_count)[1])
    h2 = trace_rays(b, o, d, range_lo=lo, range_hi=hi, method="pallas")
    p = np.asarray(h2.prim)
    ok = p >= 0
    assert ((p[ok] >= lo) & (p[ok] < hi)).all()


def test_pallas_triangle_streaming(cornell_buffers, monkeypatch):
    """Multiple triangle grid steps (TRI_TILE streaming) accumulate the
    same result as a single-tile pass — the unbounded-scene path."""
    import hikari_tpu.trace.pallas_kernel as pk
    from hikari_tpu.trace import trace_rays

    rng = np.random.default_rng(9)
    o = jnp.asarray(rng.uniform(-0.9, 0.9, (256, 3)).astype(np.float32))
    o = o.at[:, 1].add(1.0)
    d = jnp.asarray(rng.normal(size=(256, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    ref = trace_rays(cornell_buffers, o, d, method="bruteforce")
    monkeypatch.setattr(pk, "TRI_TILE", 64)  # cornell pads to 128 -> 2 steps
    multi = trace_rays(cornell_buffers, o, d, method="pallas")
    np.testing.assert_array_equal(np.asarray(ref.prim), np.asarray(multi.prim))
    np.testing.assert_allclose(np.asarray(ref.t), np.asarray(multi.t), atol=1e-4)

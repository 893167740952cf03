"""Reference-image correctness gate (BASELINE north star: frames allclose
vs the reference; VERDICT round-1 item 1).

Renders the cornell example with the reference's camera (calibrated to the
published screenshot's projective invariants — tools/compare_reference.py
documents the derivation) and asserts PSNR/SSIM against
/root/reference/assets/screenshots/cornell.png. This replaces the
self-referential golden as the truth anchor: it catches radiometric-scale,
emissive-convention, and tonemap errors that a self-golden cannot.

Rendered at 400x300 against the 2x-box-downsampled screenshot (converged
comparison at quarter cost; the full-res 800x600 harness lives in
tools/compare_reference.py — measured 23.6 dB / SSIM 0.81 full-res,
25.8 dB / 0.86 at ds4 on TPU).
"""

import os

import numpy as np
import pytest

SCREENSHOT = "/root/reference/assets/screenshots/cornell.png"


@pytest.mark.skipif(not os.path.exists(SCREENSHOT), reason="reference absent")
def test_cornell_matches_reference_screenshot():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.compare_reference import (
        downsample,
        matched_config,
        psnr,
        render_converged,
        ssim,
    )

    from hikari_tpu.io.image import read_png, to_srgb_u8

    scene, cam, settings, ref_path = matched_config("cornell")
    settings = settings.replace(width=400, height=300)
    ours = render_converged(scene, cam, settings, frames=48)
    ours = to_srgb_u8(ours).astype(np.float32) / 255.0
    ref = downsample(read_png(ref_path), 2)

    p = psnr(ours, ref)
    s = ssim(ours, ref)
    print(f"cornell vs reference screenshot: PSNR={p:.2f}dB SSIM={s:.4f}")
    # Measured-minus-noise thresholds (round-2 VERDICT item 6): the
    # exact-RNG bank makes the render deterministic; this test measures
    # 23.58 dB / SSIM 0.806 (2026-08, CPU == TPU to float tolerance).
    # 1.5 dB / 0.025 headroom covers platform float drift only — a real
    # quality regression fails.
    assert p > 22.0, f"PSNR {p:.2f} dB vs reference screenshot"
    assert s > 0.78, f"SSIM {s:.4f} vs reference screenshot"
    # Exposure: mean brightness within 5%.
    assert abs(float(ours.mean()) - float(ref.mean())) < 0.05 * float(ref.mean())

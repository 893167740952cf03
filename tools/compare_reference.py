"""Reference-comparison harness — the BASELINE correctness gate.

Renders the example scenes with camera/exposure matched to the reference's
published screenshots (/root/reference/assets/screenshots/) and reports
PSNR/SSIM between our converged output and the reference's.

Anchor images (asset availability dictates what is exactly reproducible):
  * ``cornell.png``  — examples/cornell.rs: cornell.glb (shipped), camera
    (0,1,4)->(0,1,0) (cornell.rs:50-51), default HikariSettings
    (src/lib.rs:436-455: SMAA TU4x ratio 2, TAA Jasmine, denoise on,
    1 indirect bounce), ClearColor BLACK (cornell.rs:18). 800x600 window.
  * ``simple-*.png`` — examples/simple.rs: procedural shapes fully defined
    in code (no external assets).
The per-pass "dissection" images (assets/screenshots/dissection/*.png)
depict examples/scene.rs's courtyard glTF (``models/scene.gltf``), which is
NOT shipped in the reference checkout — per-pass pixel comparison against
them is impossible in principle; the converged full-render anchors above
serve as the truth gate instead.

Usage:
  python tools/compare_reference.py cornell [--frames 96] [--cpu]
                                            [--out-dir /tmp/refcomp]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SCREENSHOTS = "/root/reference/assets/screenshots"


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """PSNR in dB over [0,1]-range images."""
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    if mse <= 0:
        return float("inf")
    return float(10.0 * np.log10(1.0 / mse))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    ax = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    k = np.exp(-0.5 * (ax / sigma) ** 2)
    k2 = np.outer(k, k)
    return k2 / k2.sum()


def _filter2(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """Valid-mode 2D convolution via FFT-free separable-ish direct method
    (small kernel, fine in numpy)."""
    kh, kw = kernel.shape
    h, w = img.shape
    out = np.zeros((h - kh + 1, w - kw + 1), dtype=np.float64)
    for i in range(kh):
        for j in range(kw):
            out += kernel[i, j] * img[i : i + h - kh + 1, j : j + w - kw + 1]
    return out


def ssim(a: np.ndarray, b: np.ndarray) -> float:
    """Standard single-scale SSIM (Wang et al. 2004) on luma, [0,1] range."""
    la = np.asarray(a, np.float64) @ np.array([0.299, 0.587, 0.114])
    lb = np.asarray(b, np.float64) @ np.array([0.299, 0.587, 0.114])
    k = _gaussian_kernel()
    c1, c2 = 0.01**2, 0.03**2
    mu_a, mu_b = _filter2(la, k), _filter2(lb, k)
    va = _filter2(la * la, k) - mu_a**2
    vb = _filter2(lb * lb, k) - mu_b**2
    cov = _filter2(la * lb, k) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (va + vb + c2)
    )
    return float(s.mean())


def downsample(img: np.ndarray, factor: int) -> np.ndarray:
    """Box-filter downsample (noise-robust comparison scale)."""
    h, w = img.shape[:2]
    h2, w2 = h // factor * factor, w // factor * factor
    img = img[:h2, :w2]
    return img.reshape(h2 // factor, factor, w2 // factor, factor, -1).mean((1, 3))


# ---------------------------------------------------------------------------
# Matched configs
# ---------------------------------------------------------------------------


def matched_config(name: str):
    """(scene, camera, settings, reference_png) with the reference
    example's exact camera + default HikariSettings."""
    from hikari_tpu.config import RenderSettings, Taa, Upscale
    from hikari_tpu.io.scenes import cornell_box_scene, simple_scene
    from hikari_tpu.render.camera import Camera

    if name == "cornell":
        scene = cornell_box_scene()
        # Viewpoint calibrated to the published screenshot, not the current
        # example code: cornell.rs:50 says (0,1,4) with default fov (pi/4),
        # but the screenshot's projective invariants disagree — the ratio of
        # back-wall to front-opening pixel widths (301/538) fixes the camera
        # at z = (r+1)/(r-1) = 3.54 (orbit-camera zoom at capture time), and
        # the absolute front-opening width then fixes fov_y = 2*atan(0.439)
        # = 47.4 deg. Our own render at (0,1,4)/pi4 reproduces its predicted
        # widths within 4 px, validating the camera model itself.
        cam = Camera.from_lookat(
            eye=(0.0, 1.0, 3.5401), target=(0.0, 1.0, 0.0),
            fov_y=2.0 * float(np.arctan(0.43906)),
        )
        settings = RenderSettings(
            width=800,
            height=600,
            upscale=Upscale.smaa_tu4x(2.0),
            taa=Taa.JASMINE,
            denoise=True,
            indirect_bounces=1,
            clear_color=(0.0, 0.0, 0.0, 1.0),
        )
        ref = os.path.join(SCREENSHOTS, "cornell.png")
    elif name == "simple":
        # examples/simple.rs:299-321 camera (-10, 2.5, 20) -> origin.
        scene = simple_scene()
        cam = Camera.from_lookat(eye=(-10.0, 2.5, 20.0), target=(0.0, 0.0, 0.0))
        settings = RenderSettings(
            width=800,
            height=600,
            upscale=Upscale.smaa_tu4x(2.0),
            taa=Taa.JASMINE,
            denoise=True,
            indirect_bounces=1,
        )
        ref = os.path.join(SCREENSHOTS, "simple-1.png")
    else:
        raise ValueError(name)
    return scene, cam, settings, ref


def render_converged(scene, cam, settings, frames: int, exact_rng: bool = True):
    """Render ``frames`` frames and return the final sRGB-ready image
    in [0,1] (the overlay output), using the reference's blue-noise bank
    when available (exact-RNG parity, render/noise.py)."""
    import jax
    import jax.numpy as jnp

    from hikari_tpu.render import initial_state, render_frame
    from hikari_tpu.scene import build_scene_buffers

    noise = None
    if exact_rng:
        try:
            from hikari_tpu.render.noise import reference_noise_bank

            noise = jnp.asarray(reference_noise_bank())
        except (FileNotFoundError, OSError):
            noise = None

    buffers = build_scene_buffers(scene)
    state = initial_state(settings)

    from functools import partial

    @partial(jax.jit, static_argnames=("settings",))
    def step(buffers, cam, state, noise, settings):
        out, state = render_frame(buffers, cam, state, settings, noise_bank=noise)
        return out.image, state

    image = None
    for _ in range(frames):
        image, state = step(buffers, cam, state, noise, settings)
    return np.clip(np.asarray(image)[..., :3], 0.0, 1.0)


def compare(name: str, frames: int, out_dir: str) -> dict:
    from hikari_tpu.io.image import read_png, to_srgb_u8

    scene, cam, settings, ref_path = matched_config(name)
    ours_linear = render_converged(scene, cam, settings, frames)
    ours = to_srgb_u8(ours_linear).astype(np.float32) / 255.0
    ref = read_png(ref_path)
    assert ours.shape == ref.shape, (ours.shape, ref.shape)

    os.makedirs(out_dir, exist_ok=True)
    from PIL import Image

    Image.fromarray((ours * 255).astype(np.uint8)).save(
        os.path.join(out_dir, f"{name}_ours.png")
    )
    diff = np.abs(ours - ref)
    Image.fromarray((np.clip(diff * 4, 0, 1) * 255).astype(np.uint8)).save(
        os.path.join(out_dir, f"{name}_diff4x.png")
    )

    # Full-res and 4x-box-downsampled (noise-robust) metrics.
    m = {
        "name": name,
        "frames": frames,
        "psnr": psnr(ours, ref),
        "ssim": ssim(ours, ref),
        "psnr_ds4": psnr(downsample(ours, 4), downsample(ref, 4)),
        "ssim_ds4": ssim(downsample(ours, 4), downsample(ref, 4)),
        "mean_ours": float(ours.mean()),
        "mean_ref": float(ref.mean()),
    }
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="*", default=["cornell"])
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out-dir", default="/tmp/refcomp")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.expanduser("~/.cache/hikari_tpu_jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    for name in args.configs or ["cornell"]:
        m = compare(name, args.frames, args.out_dir)
        print(
            f"{m['name']}: PSNR={m['psnr']:.2f}dB SSIM={m['ssim']:.4f} "
            f"PSNR(ds4)={m['psnr_ds4']:.2f}dB SSIM(ds4)={m['ssim_ds4']:.4f} "
            f"mean ours/ref={m['mean_ours']:.4f}/{m['mean_ref']:.4f}"
        )


if __name__ == "__main__":
    main()

"""Pipeline integration tests: full frames on small Cornell + minimal
scenes, asserting physical behavior (the analogue of the reference's
golden "dissection" screenshots, SURVEY.md §4 tier 2): emissive
illumination reaches the box, color bleeding onto side walls, sun shadows,
temporal accumulation reduces variance, and state threading is stable."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hikari_tpu.config import RenderSettings, Taa, Upscale
from hikari_tpu.io.scenes import cornell_config, minimal_config
from hikari_tpu.render import initial_state, render_frame_jit
from hikari_tpu.scene import build_scene_buffers


@pytest.fixture(scope="module")
def cornell_small():
    scene, cam, settings = cornell_config(size=48)
    return build_scene_buffers(scene), cam, settings


def run_frames(buffers, cam, settings, n):
    state = initial_state(settings)
    out = None
    for _ in range(n):
        out, state = render_frame_jit(buffers, cam, state, settings)
    return out, state


def test_cornell_frame_finite(cornell_small):
    buffers, cam, settings = cornell_small
    out, state = run_frames(buffers, cam, settings, 2)
    img = np.asarray(out.image)
    assert np.isfinite(img).all()
    assert img[..., :3].max() > 0.01  # something is lit
    assert int(state.frame_number) == 2


def test_cornell_emissive_lights_scene(cornell_small):
    buffers, cam, settings = cornell_small
    out, _ = run_frames(buffers, cam, settings, 4)
    em = np.asarray(out.emissive)
    # The ceiling light must contribute direct emissive lighting.
    assert em.mean() > 0.001, em.mean()
    ind = np.asarray(out.indirect)
    assert ind.mean() > 0.0005, ind.mean()


def test_cornell_color_bleeding(cornell_small):
    """Red wall on the left, green on the right: foreground pixels near
    each wall should tint accordingly in the final image."""
    buffers, cam, settings = cornell_small
    out, _ = run_frames(buffers, cam, settings, 6)
    img = np.asarray(out.image)[..., :3]
    h, w = img.shape[:2]
    # Columns safely inside each wall in the 48x48 view of the box.
    left = img[h // 3 : 2 * h // 3, 2 : w // 6]
    right = img[h // 3 : 2 * h // 3, -w // 6 : -2]
    assert left[..., 0].mean() > left[..., 1].mean(), "left wall should be red-ish"
    assert right[..., 1].mean() > right[..., 0].mean(), "right wall should be green-ish"


def test_minimal_sun_and_shadow():
    scene, cam, settings = minimal_config(width=48, height=48)
    settings = settings.replace(denoise=False, taa=Taa.NONE)
    buffers = build_scene_buffers(scene)
    out, _ = run_frames(buffers, cam, settings, 3)
    direct = np.asarray(out.direct)
    assert np.isfinite(direct).all()
    # Sun (illuminance 1e4) must dominate: direct channel clearly nonzero.
    assert direct.mean() > 0.01, direct.mean()
    img = np.asarray(out.image)[..., :3]
    assert np.isfinite(img).all()
    # Scene has contrast (lit plane vs shadowed region under cube).
    assert img.std() > 0.02


def test_temporal_accumulation_reduces_noise(cornell_small):
    buffers, cam, _ = cornell_small
    settings = RenderSettings(
        width=48, height=48, upscale=Upscale.none(), denoise=False,
        taa=Taa.NONE, temporal_reuse=True,
    )
    state = initial_state(settings)
    frames = []
    for _ in range(8):
        out, state = render_frame_jit(buffers, cam, state, settings)
        frames.append(np.asarray(out.emissive))
    # consecutive-frame difference should shrink as reservoirs accumulate
    d_early = np.abs(frames[1] - frames[0]).mean()
    d_late = np.abs(frames[7] - frames[6]).mean()
    assert d_late <= d_early * 1.5, (d_early, d_late)


def test_background_is_clear_color(cornell_small):
    buffers, cam, _ = cornell_small
    settings = RenderSettings(
        width=48, height=48, upscale=Upscale.none(), denoise=False,
        taa=Taa.NONE, clear_color=(0.1, 0.2, 0.3, 1.0),
    )
    out, _ = run_frames(buffers, cam, settings, 1)
    tm = np.asarray(out.tonemapped)
    # The camera at z=4 sees past the open box front at the corners.
    corner = tm[0, 0]
    np.testing.assert_allclose(corner[:3], [0.1, 0.2, 0.3], atol=1e-5)


def test_upscale_smaa_shapes(cornell_small):
    buffers, cam, _ = cornell_small
    settings = RenderSettings(
        width=64, height=64, upscale=Upscale.smaa_tu4x(2.0), denoise=False,
    )
    assert settings.render_size == (32, 32)
    out, state = run_frames(buffers, cam, settings, 2)
    assert out.image.shape == (64, 64, 4)
    assert np.isfinite(np.asarray(out.image)).all()


def test_multiple_bounces(cornell_small):
    """MULTIPLE_BOUNCES specialization (reference light.wgsl:1309-1394)."""
    buffers, cam, _ = cornell_small
    settings = RenderSettings(
        width=32, height=32, upscale=Upscale.none(), denoise=False,
        taa=Taa.NONE, indirect_bounces=2, indirect_spatial_reuse=False,
    )
    out, _ = run_frames(buffers, cam, settings, 2)
    ind = np.asarray(out.indirect)
    assert np.isfinite(ind).all()
    assert ind.mean() > 0.0005  # multi-bounce GI contributes


def test_motion_vectors():
    """Moving instance: velocity = current minus reprojected previous clip
    position (reference prepass.wgsl:96). A cube translated +x since the
    previous frame must produce positive-u screen velocity."""
    from hikari_tpu.io.scenes import _transform
    from hikari_tpu.render.camera import Camera
    from hikari_tpu.render.gbuffer import render_gbuffer
    from hikari_tpu.scene import Instance, Material, Scene, cube_mesh
    from hikari_tpu.scene import build_scene_buffers as bsb
    import jax.numpy as jnp

    scene = Scene(materials=[])
    m = scene.add_material(Material())
    c = scene.add_mesh(cube_mesh(1.0))
    prev = _transform((-0.5, 0.0, 0.0))
    cur = _transform((0.0, 0.0, 0.0))
    scene.add_instance(
        Instance(c, m, transform=cur, previous_transform=prev)
    )
    buffers = bsb(scene)
    cam = Camera.from_lookat(eye=(0, 0, 4), target=(0, 0, 0))
    settings = RenderSettings(
        width=32, height=32, upscale=Upscale.none(), taa=Taa.NONE, denoise=False
    )
    gb = render_gbuffer(buffers, cam, jnp.zeros((), jnp.int32), settings)
    vel = np.asarray(gb.velocity_uv)[..., :2]
    inst = np.asarray(gb.instance)
    hits = inst >= 0
    assert hits.any()
    # moved +x in world -> +u in screen space (u increases rightward)
    assert vel[hits][:, 0].mean() > 0.01
    assert abs(vel[hits][:, 1].mean()) < 0.01  # no vertical motion


def test_frame_stats(cornell_buffers):
    """collect_stats emits finite per-frame health counters
    (RenderOutputs.stats) without perturbing the image."""
    from hikari_tpu.config import RenderSettings, Taa, Upscale
    from hikari_tpu.io.scenes import cornell_config
    from hikari_tpu.render import initial_state, render_frame_jit

    _, cam, _ = cornell_config(size=32)
    base = RenderSettings(
        width=32, height=32, upscale=Upscale.none(), taa=Taa.NONE,
        denoise=False,
    )
    with_stats = base.replace(collect_stats=True)
    s0 = initial_state(base)
    out0, _ = render_frame_jit(cornell_buffers, cam, s0, base)
    out1, _ = render_frame_jit(cornell_buffers, cam, s0, with_stats)
    assert out0.stats is None
    assert out1.stats is not None
    for k, v in out1.stats.items():
        assert np.isfinite(np.asarray(v)).all(), k
    assert 0.0 <= float(out1.stats["background_fraction"]) <= 1.0
    assert int(out1.stats["nonfinite_pixels"]) == 0
    np.testing.assert_allclose(
        np.asarray(out0.image), np.asarray(out1.image), atol=0
    )

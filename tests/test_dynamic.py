"""Dynamic-scene update path (scene/update.py): per-frame transform changes
as jit inputs, not host recompiles.

Reference behavior being matched: incremental TLAS/emissive/alias rebuild on
change events (src/mesh_material/instance.rs:130-175, 244-444) and the
two-frame transform history queue (src/transform.rs:32-44).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hikari_tpu.config import UniversalSettings
from hikari_tpu.io.scenes import simple_scene, _transform, _euler_xyz_matrix
from hikari_tpu.scene import build_scene_buffers, update_transforms
from hikari_tpu.scene.update import SceneUpdater


def _moved_models(buffers, delta=(0.3, 0.1, -0.2), rot_y=0.4, inst=2):
    models = np.asarray(buffers.inst_model).copy()
    r = np.eye(4, dtype=np.float32)
    r[:3, :3] = _euler_xyz_matrix(0.0, rot_y, 0.0)
    t = np.eye(4, dtype=np.float32)
    t[:3, 3] = delta
    models[inst] = t @ r @ models[inst]
    return models


@pytest.fixture(scope="module")
def dyn_scene():
    return simple_scene()


@pytest.fixture(scope="module")
def dyn_buffers(dyn_scene):
    return build_scene_buffers(dyn_scene)


def test_update_matches_recompile(dyn_scene, dyn_buffers):
    """Device update == full host recompile for the moved scene (same
    geometry/normals/instance data; BVH AABBs conservative)."""
    import copy

    models = _moved_models(dyn_buffers)
    updated = update_transforms(dyn_buffers, jnp.asarray(models))

    moved = copy.deepcopy(dyn_scene)
    for i, inst in enumerate(moved.instances):
        inst.transform = models[i]
        inst.previous_transform = np.asarray(dyn_buffers.inst_model)[i]
    recompiled = build_scene_buffers(moved)

    def mesh_order(b):
        # compile_scene stores triangles in BLAS DFS-leaf order, and the
        # recompiled (moved) scene builds a DIFFERENT tree -> different
        # permutation. Undo both to mesh order before comparing.
        n = b.num_tris
        tri = np.asarray(b.tri_world)[:n]
        gidx = (
            np.asarray(b.inst_prim_offset)[np.asarray(b.tri_inst)[:n]]
            + np.asarray(b.tri_mesh_index)[:n]
        )
        out = np.zeros_like(tri)
        out[gidx] = tri
        return out

    np.testing.assert_allclose(
        mesh_order(updated), mesh_order(recompiled), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(updated.vert_normal)[: len(np.asarray(recompiled.vert_normal))],
        np.asarray(recompiled.vert_normal),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(updated.inst_model), models, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(updated.inst_prev_model),
        np.asarray(dyn_buffers.inst_model),
        atol=1e-6,
    )
    # Emissive spheres follow the instances.
    np.testing.assert_allclose(
        np.asarray(updated.em_position),
        np.asarray(recompiled.em_position),
        atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(updated.em_surface_area),
        np.asarray(recompiled.em_surface_area),
        rtol=1e-4,
    )
    # Same treedef -> no retrace for downstream jitted steps.
    assert jax.tree_util.tree_structure(updated) == jax.tree_util.tree_structure(
        dyn_buffers
    )


def test_refit_aabbs_contain_children(dyn_buffers):
    """After refit every node AABB contains its children / its leaf
    triangle (the BVH invariant traversal correctness rests on)."""
    models = _moved_models(dyn_buffers, delta=(1.5, 0.0, 0.7), rot_y=1.1, inst=3)
    up = update_transforms(dyn_buffers, jnp.asarray(models))
    nmin = np.asarray(up.node_min)
    nmax = np.asarray(up.node_max)
    entry = np.asarray(up.node_entry)
    left = np.asarray(up.node_left)
    right = np.asarray(up.node_right)
    tri = np.asarray(up.tri_world)
    N = up.num_nodes
    for i in range(N):
        if entry[i] < 0:
            prim = -entry[i] - 1
            assert (nmin[i] <= tri[prim].min(0) + 1e-4).all()
            assert (nmax[i] >= tri[prim].max(0) - 1e-4).all()
        else:
            for ch in (left[i], right[i]):
                if ch >= 0:
                    assert (nmin[i] <= nmin[ch] + 1e-4).all(), i
                    assert (nmax[i] >= nmax[ch] - 1e-4).all(), i


def test_update_traces_correctly(dyn_scene, dyn_buffers):
    """BVH tracing against the updated scene == tracing the recompiled
    scene (hits agree), for both tracer backends."""
    import copy

    from hikari_tpu.trace import trace_rays

    models = _moved_models(dyn_buffers, delta=(0.0, 0.8, 0.0), rot_y=0.9, inst=2)
    updated = update_transforms(dyn_buffers, jnp.asarray(models))
    moved = copy.deepcopy(dyn_scene)
    for i, inst in enumerate(moved.instances):
        inst.transform = models[i]
    recompiled = build_scene_buffers(moved)

    rng = np.random.default_rng(3)
    o = jnp.asarray(rng.uniform(-6, 6, (256, 3)).astype(np.float32))
    o = o + jnp.asarray([0.0, 6.0, 0.0])
    d = jnp.asarray(rng.normal(size=(256, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    for method in ("bruteforce", "bvh"):
        h_up = trace_rays(updated, o, d, method=method)
        h_rc = trace_rays(recompiled, o, d, method=method)
        np.testing.assert_array_equal(
            np.asarray(h_up.inst), np.asarray(h_rc.inst), err_msg=method
        )
        np.testing.assert_allclose(
            np.asarray(h_up.t), np.asarray(h_rc.t), atol=1e-3, err_msg=method
        )


def test_universal_settings_pin_refit(dyn_buffers):
    """HikariUniversalSettings toggles gate the refit halves (reference
    src/lib.rs:375-389 gating BVH builds)."""
    models = _moved_models(dyn_buffers, delta=(2.0, 0.0, 0.0), inst=2)
    frozen = update_transforms(
        dyn_buffers,
        jnp.asarray(models),
        universal=UniversalSettings(
            build_mesh_acceleration_structure=False,
            build_instance_acceleration_structure=False,
        ),
    )
    np.testing.assert_array_equal(
        np.asarray(frozen.node_min), np.asarray(dyn_buffers.node_min)
    )
    moving = update_transforms(dyn_buffers, jnp.asarray(models))
    assert not np.array_equal(
        np.asarray(moving.node_min), np.asarray(dyn_buffers.node_min)
    )
    # TLAS-only pin: BLAS nodes move, TLAS rows stay.
    tl = update_transforms(
        dyn_buffers,
        jnp.asarray(models),
        universal=UniversalSettings(
            build_instance_acceleration_structure=False
        ),
    )
    T = dyn_buffers.num_tlas_nodes
    np.testing.assert_array_equal(
        np.asarray(tl.node_min)[:T], np.asarray(dyn_buffers.node_min)[:T]
    )
    assert not np.array_equal(
        np.asarray(tl.node_min)[T:], np.asarray(dyn_buffers.node_min)[T:]
    )


def test_scene_updater_alias_rebuild(dyn_scene, dyn_buffers):
    """Alias rows rebuild only when an emissive instance's linear part
    changes (reference cache-by-scale, instance.rs:386-400)."""
    up = SceneUpdater(dyn_scene, dyn_buffers)
    before = np.asarray(up.buffers.alias_prob).copy()

    # Pure translation: alias table untouched.
    em_inst = int(np.asarray(dyn_buffers.em_instance)[0])
    models = np.asarray(dyn_buffers.inst_model).copy()
    t = models[em_inst].copy()
    t[:3, 3] += [0.5, 0.0, 0.0]
    up.set_transforms({em_inst: t})
    np.testing.assert_array_equal(np.asarray(up.buffers.alias_prob), before)

    # Non-uniform scale: emissive alias rows update.
    s = t.copy()
    s[:3, :3] = s[:3, :3] @ np.diag([2.0, 1.0, 1.0]).astype(np.float32)
    up.set_transforms({em_inst: s})
    after = np.asarray(up.buffers.alias_prob)
    off = int(np.asarray(dyn_buffers.em_alias_offset)[0])
    cnt = int(np.asarray(dyn_buffers.em_alias_count)[0])
    assert not np.array_equal(after[off : off + cnt], before[off : off + cnt])
    # Probabilities remain a valid alias table (in [0,1]).
    assert after[off : off + cnt].min() >= 0.0
    assert after[off : off + cnt].max() <= 1.0 + 1e-6


def test_motion_temporal_reuse(dyn_scene):
    """Animate an instance across frames through the jitted pipeline:
    velocity is nonzero on the mover, temporal reuse survives elsewhere
    (reservoir counts keep accumulating on static pixels)."""
    from functools import partial

    from hikari_tpu.config import RenderSettings, Taa, Upscale
    from hikari_tpu.render import initial_state, render_frame
    from hikari_tpu.render.camera import Camera

    settings = RenderSettings(
        width=96,
        height=96,
        upscale=Upscale.none(),
        taa=Taa.NONE,
        denoise=False,
        indirect_bounces=0,
        emissive_lit=False,
        temporal_reuse=True,
    )
    cam = Camera.from_lookat(eye=(-10.0, 2.5, 20.0), target=(0.0, 0.0, 0.0))
    buffers = build_scene_buffers(dyn_scene)
    state = initial_state(settings)

    @partial(jax.jit, static_argnames=("settings",))
    def step(buffers, cam, state, settings):
        out, state = render_frame(buffers, cam, state, settings)
        return out, state

    # Warm static frames to accumulate temporal counts.
    for _ in range(4):
        out, state = step(buffers, cam, state, settings)
    counts_before = np.asarray(state.direct_temporal.count)

    # Move the pink cube (instance 2) — device update only, same step fn.
    models = _moved_models(buffers, delta=(0.6, 0.0, 0.0), rot_y=0.0, inst=2)
    buffers = update_transforms(buffers, jnp.asarray(models))
    out, state = step(buffers, cam, state, settings)
    counts_after = np.asarray(state.direct_temporal.count)

    # Temporal accumulation survives motion for the static majority.
    grew = counts_after >= counts_before
    assert grew.mean() > 0.5, grew.mean()
    # Velocity is nonzero somewhere (the mover's pixels). Miss pixels have
    # no reprojection (NaN velocity, like unrasterized texels) — mask them.
    gb_vel = np.asarray(state.prev_gbuffer.velocity_uv[..., :2])
    finite = gb_vel[np.isfinite(gb_vel)]
    assert np.abs(finite).max() > 1e-4


def test_camera_motion_reprojection(dyn_scene):
    """Move the CAMERA across frames (VERDICT round-1 weak #7: no test
    exercised reprojection under camera motion): velocity must reflect the
    motion, temporal reuse must survive for still-visible pixels, and the
    scatter-invalidation path must keep the render finite."""
    from functools import partial

    from hikari_tpu.config import RenderSettings, Taa, Upscale
    from hikari_tpu.render import initial_state, render_frame
    from hikari_tpu.render.camera import Camera

    settings = RenderSettings(
        width=96,
        height=96,
        upscale=Upscale.none(),
        taa=Taa.NONE,
        denoise=False,
        indirect_bounces=0,
        emissive_lit=False,
        temporal_reuse=True,
    )
    buffers = build_scene_buffers(dyn_scene)
    state = initial_state(settings)

    @partial(jax.jit, static_argnames=("settings",))
    def step(buffers, cam, state, settings):
        out, state = render_frame(buffers, cam, state, settings)
        return out, state

    eyes = [(-10.0 + 0.15 * i, 2.5, 20.0) for i in range(7)]
    prev_eye = eyes[0]
    out = None
    for i, eye in enumerate(eyes):
        cam = Camera.from_lookat(
            eye=eye, target=(0.0, 0.0, 0.0), prev_eye=prev_eye,
            prev_target=(0.0, 0.0, 0.0),
        )
        out, state = step(buffers, cam, state, settings)
        prev_eye = eye

    img = np.asarray(out.image)
    assert np.isfinite(img).all()
    # Velocity reflects the camera pan on foreground pixels.
    vel = np.asarray(state.prev_gbuffer.velocity_uv[..., :2])
    finite = np.isfinite(vel).all(-1) & (
        np.asarray(state.prev_gbuffer.instance) >= 0
    )
    assert np.abs(vel[finite][:, 0]).mean() > 1e-5
    # Temporal accumulation survives the slow pan: the majority of
    # foreground pixels keep multi-frame reservoirs.
    counts = np.asarray(state.direct_temporal.count)
    assert (counts > 1.5).mean() > 0.4, (counts > 1.5).mean()


# ---------------------------------------------------------------------------
# Instance streaming / visibility (update_activity): city.rs streams models
# in over time (examples/city.rs:23); instance.rs:269-283 retries unready
# assets; visibility events instance.rs:130-175. Here instances are
# pre-declared and toggled on device with no recompile.
# ---------------------------------------------------------------------------


def test_activity_trace_matches_exclusion(dyn_buffers):
    """Deactivating instance k must trace exactly like excluding it —
    for the dense, lockstep-walk and fused-Pallas backends."""
    from hikari_tpu.scene import update_activity
    from hikari_tpu.trace import trace_rays

    rng = np.random.default_rng(11)
    n = 512
    o = jnp.asarray(rng.uniform(-6, 6, (n, 3)).astype(np.float32))
    o = o.at[:, 1].set(jnp.abs(o[:, 1]) + 0.5)
    d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    k = 2  # pink cube
    active = np.ones(dyn_buffers.num_instances, dtype=bool)
    active[k] = False
    off = update_activity(dyn_buffers, jnp.asarray(active))
    excl = jnp.full((n,), k, jnp.int32)
    for method in ("bruteforce", "bvh", "pallas_tiled"):
        ref = trace_rays(dyn_buffers, o, d, exclude_instance=excl,
                         method=method)
        got = trace_rays(off, o, d, method=method)
        np.testing.assert_allclose(
            np.asarray(ref.t), np.asarray(got.t), atol=1e-4, err_msg=method
        )
        np.testing.assert_array_equal(
            np.asarray(ref.prim), np.asarray(got.prim), err_msg=method
        )


def test_activity_roundtrip_render(dyn_scene, dyn_buffers):
    """Deactivate -> image changes; re-activate -> image restored exactly
    (same treedef, same executable, streaming state fully reversible)."""
    from hikari_tpu.config import RenderSettings, Taa, Upscale
    from hikari_tpu.io.scenes import Camera
    from hikari_tpu.render import initial_state, render_frame_jit
    from hikari_tpu.scene import update_activity

    settings = RenderSettings(
        width=48, height=48, upscale=Upscale.none(), denoise=False,
        taa=Taa.NONE, indirect_bounces=1,
    )
    cam = Camera.from_lookat(eye=(-6.0, 3.0, 10.0), target=(0.0, 0.5, 0.0))
    state = initial_state(settings)

    base, _ = render_frame_jit(dyn_buffers, cam, state, settings)
    active = np.ones(dyn_buffers.num_instances, dtype=bool)
    active[2] = False  # pink cube
    active[4] = False  # bright emissive sphere
    off = update_activity(dyn_buffers, jnp.asarray(active))
    hidden, _ = render_frame_jit(off, cam, state, settings)
    assert not np.allclose(
        np.asarray(base.image), np.asarray(hidden.image), atol=1e-3
    ), "deactivation changed nothing"

    back = update_activity(off, jnp.ones(dyn_buffers.num_instances, bool))
    restored, _ = render_frame_jit(back, cam, state, settings)
    np.testing.assert_allclose(
        np.asarray(base.image), np.asarray(restored.image), atol=2e-5
    )


def test_deactivated_emissive_never_picked(dyn_buffers):
    """The light-candidate walk must never pick a streamed-out emissive:
    its sphere is parked at 1e30 with radius 0."""
    from hikari_tpu.render.sampling import _emissive_walk, NO_EMISSIVE
    from hikari_tpu.scene import update_activity

    # Points inside emissive A's (instance 4) influence sphere.
    pos = jnp.asarray(
        np.random.default_rng(3).uniform(-1, 1, (64, 3)).astype(np.float32)
    ) + jnp.asarray([0.0, 4.0, 0.0])
    rand = jnp.linspace(0.0, 1.0, 64)
    excl = jnp.full((64,), -1, jnp.int32)

    chosen, count = _emissive_walk(dyn_buffers, pos, excl, rand)
    em_inst = np.asarray(dyn_buffers.em_instance)
    assert (np.asarray(count) > 0).any()
    picked_inst = em_inst[np.maximum(np.asarray(chosen), 0)]
    assert (picked_inst[np.asarray(chosen) >= 0] == 4).any()

    active = np.ones(dyn_buffers.num_instances, dtype=bool)
    active[4] = False
    off = update_activity(dyn_buffers, jnp.asarray(active))
    chosen2, _ = _emissive_walk(off, pos, excl, rand)
    picked2 = em_inst[np.maximum(np.asarray(chosen2), 0)]
    ok2 = np.asarray(chosen2) >= 0
    assert not (picked2[ok2] == 4).any(), "inactive emissive was picked"


def test_activity_survives_transform_update(dyn_buffers):
    """update_transforms after deactivation must keep the instance out
    (the activity mask is part of the buffers, not transient)."""
    from hikari_tpu.scene import update_activity
    from hikari_tpu.trace import trace_rays

    k = 3
    active = np.ones(dyn_buffers.num_instances, dtype=bool)
    active[k] = False
    off = update_activity(dyn_buffers, jnp.asarray(active))
    moved = update_transforms(off, off.inst_model)  # identity transforms
    rng = np.random.default_rng(5)
    n = 256
    o = jnp.asarray(rng.uniform(-6, 6, (n, 3)).astype(np.float32))
    o = o.at[:, 1].set(jnp.abs(o[:, 1]) + 0.5)
    d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    hit = trace_rays(moved, o, d, method="bruteforce")
    inst = np.asarray(hit.inst)
    assert not (inst == k).any()

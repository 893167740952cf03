"""Camera model: view/projection matrices and primary-ray generation.

The reference consumes Bevy's ``View`` uniform (view_proj, world_position)
plus its own ``PreviousViewUniform`` for reprojection (src/view.rs:32-73).
Bevy 0.9 cameras use an infinite reversed-Z right-handed perspective
projection (near plane depth = 1, infinity = 0) — the G-buffer depth channel
the reference stores in ``position.w`` (src/shaders/prepass.wgsl:87) and
tests with ratios everywhere. We reproduce the same convention.

The TPU build has no rasterizer: the G-buffer comes from jittered primary
rays (SURVEY.md §2.2 prepass notes), so the camera also provides
``pixel_rays`` — inverse-projecting pixel centers into world-space rays.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from hikari_tpu.scene.buffers import static_field


def look_at_transform(eye, target, up=(0.0, 1.0, 0.0)) -> np.ndarray:
    """Camera world transform looking from ``eye`` at ``target``
    (Bevy ``Transform::looking_at``): -Z forward, +Y up, +X right."""
    eye = np.asarray(eye, dtype=np.float64)
    target = np.asarray(target, dtype=np.float64)
    up = np.asarray(up, dtype=np.float64)
    f = target - eye
    f = f / np.linalg.norm(f)  # forward (-Z axis direction)
    r = np.cross(f, up)
    r = r / np.linalg.norm(r)
    u = np.cross(r, f)
    m = np.eye(4, dtype=np.float64)
    m[:3, 0] = r
    m[:3, 1] = u
    m[:3, 2] = -f
    m[:3, 3] = eye
    return m.astype(np.float32)


def perspective_infinite_reverse(fov_y: float, aspect: float, near: float) -> np.ndarray:
    """Bevy 0.9's ``Mat4::perspective_infinite_reverse_rh``: ndc depth =
    near / -z_view, so depth(near)=1, depth(inf)=0 (reversed-Z,
    reference src/prepass.rs:251-266 uses GreaterEqual depth compare)."""
    f = 1.0 / np.tan(0.5 * fov_y)
    m = np.zeros((4, 4), dtype=np.float32)
    m[0, 0] = f / aspect
    m[1, 1] = f
    m[2, 3] = near
    m[3, 2] = -1.0
    return m


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Camera:
    """Camera state as a pytree (dynamic matrices, static intrinsics).

    ``world_from_view`` is the camera's world transform; previous-frame
    variants support motion vectors + reprojection (reference
    ``GlobalTransformQueue``/``PreviousViewUniform``, src/transform.rs:20,
    src/view.rs:32-40)."""

    world_from_view: jax.Array  # (4,4)
    prev_world_from_view: jax.Array  # (4,4)
    fov_y: float = static_field(default=float(np.pi / 4))
    near: float = static_field(default=0.1)

    @staticmethod
    def from_lookat(eye, target, up=(0.0, 1.0, 0.0), prev_eye=None, prev_target=None,
                    fov_y: float = float(np.pi / 4), near: float = 0.1) -> "Camera":
        cur = look_at_transform(eye, target, up)
        prev = (
            look_at_transform(prev_eye, prev_target, up)
            if prev_eye is not None
            else cur
        )
        return Camera(
            world_from_view=jnp.asarray(cur),
            prev_world_from_view=jnp.asarray(prev),
            fov_y=float(fov_y),
            near=float(near),
        )

    def projection(self, size_hw) -> jax.Array:
        h, w = size_hw
        return jnp.asarray(
            perspective_infinite_reverse(self.fov_y, w / h, self.near)
        )

    def view_proj(self, size_hw, previous: bool = False) -> jax.Array:
        """Clip-from-world matrix (Bevy ``view.view_proj``)."""
        world = self.prev_world_from_view if previous else self.world_from_view
        return self.projection(size_hw) @ jnp.linalg.inv(world)

    @property
    def position(self) -> jax.Array:
        return self.world_from_view[:3, 3]

    def pixel_rays(self, size_hw, jitter=None):
        """Primary rays through (jittered) pixel centers.

        jitter: (2,) offset in pixel units added to the pixel center (the
        reference adds Halton jitter in clip space, prepass.wgsl:52-71).
        Returns (origins (h,w,3), directions (h,w,3)) in world space.
        """
        h, w = size_hw
        ys, xs = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32),
            jnp.arange(w, dtype=jnp.float32),
            indexing="ij",
        )
        px = xs + 0.5
        py = ys + 0.5
        if jitter is not None:
            px = px + jitter[0]
            py = py + jitter[1]
        # ndc in [-1,1], y up.
        ndc_x = 2.0 * px / w - 1.0
        ndc_y = 1.0 - 2.0 * py / h
        f = 1.0 / jnp.tan(0.5 * self.fov_y)
        aspect = w / h
        # view-space direction (camera looks down -Z)
        dir_view = jnp.stack(
            [ndc_x * aspect / f, ndc_y / f, -jnp.ones_like(ndc_x)], axis=-1
        )
        rot = self.world_from_view[:3, :3]
        dir_world = dir_view @ rot.T
        dir_world = dir_world / jnp.linalg.norm(dir_world, axis=-1, keepdims=True)
        origin = jnp.broadcast_to(self.position, dir_world.shape)
        return origin, dir_world

    def depth_of(self, world_position) -> jax.Array:
        """Reversed-Z ndc depth of world points: near / view_distance.
        This is what the reference stores as G-buffer ``position.w``."""
        inv = jnp.linalg.inv(self.world_from_view)
        p_view = world_position @ inv[:3, :3].T + inv[:3, 3]
        return self.near / jnp.maximum(-p_view[..., 2], 1e-8)

"""Device-side dynamic scene updates: per-frame transform changes without a
host recompile.

The reference rebuilds TLAS / emissive BVH / alias tables incrementally on
ECS change events every frame (src/mesh_material/instance.rs:130-175,
244-444) and keeps a per-entity two-frame transform queue
(src/transform.rs:32-44). The TPU-native equivalent is a *jitted* update:
new per-instance model matrices are ordinary device inputs, and

  * world triangles are re-transformed from the local-space copy,
  * vertex normals are re-transformed by the inverse-transpose,
  * the stitched TLAS+BLAS node graph is REFIT bottom-up on device
    (fixed topology; AABBs recomputed leaves-up in ``refit_depth``
    parallel sweeps over the child arrays),
  * instance AABBs, emissive bounding spheres and surface areas are
    recomputed, and the emissive BVH is refit the same way,
  * ``inst_prev_model`` takes the old transforms (the transform-history
    queue), feeding motion vectors.

Alias tables are intentionally NOT updated here: triangle-area
*proportions* only change when an instance's linear part changes, so —
matching the reference's cache-by-scale (instance.rs:386-400) — the host
``SceneUpdater`` rebuilds an instance's alias rows only on scale change.

``HikariUniversalSettings``'s build toggles (src/lib.rs:375-389) gate the
two refit halves exactly like they gate the reference's BVH builds:
``build_mesh_acceleration_structure`` pins BLAS-node AABBs and
``build_instance_acceleration_structure`` pins TLAS-node AABBs.

All math runs in scalar (P,)-planes (no materialized small-minor-dim
gathers — see utils.gather_channels for why).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hikari_tpu.config import F32_MAX, UniversalSettings
from hikari_tpu.scene.buffers import SceneBuffers


def _apply_affine_planes(m16, inst_idx, x, y, z):
    """World = M @ local for per-element instance transforms, in planes.
    m16: (I, 16) row-major 4x4; inst_idx/x/y/z: (...,). Returns (X, Y, Z)."""

    def m(r, c):
        return m16[:, 4 * r + c][inst_idx]

    X = m(0, 0) * x + m(0, 1) * y + m(0, 2) * z + m(0, 3)
    Y = m(1, 0) * x + m(1, 1) * y + m(1, 2) * z + m(1, 3)
    Z = m(2, 0) * x + m(2, 1) * y + m(2, 2) * z + m(2, 3)
    return X, Y, Z


def _apply_linear_planes(m9, inst_idx, x, y, z):
    """(X,Y,Z) = M3 @ (x,y,z) in planes; m9: (I, 9) row-major 3x3."""

    def m(r, c):
        return m9[:, 3 * r + c][inst_idx]

    X = m(0, 0) * x + m(0, 1) * y + m(0, 2) * z
    Y = m(1, 0) * x + m(1, 1) * y + m(1, 2) * z
    Z = m(2, 0) * x + m(2, 1) * y + m(2, 2) * z
    return X, Y, Z


def _refit_planes(leaf_vals, leaf_mask, left, right, old_vals, pinned, depth, is_min):
    """Bottom-up AABB refit, one scalar plane at a time.

    leaf_vals/old_vals: dict c -> (N,) plane. ``pinned``: (N,) bool — nodes
    whose AABB must keep its old value (UniversalSettings gating).
    Each sweep recomputes every internal node from its children in
    parallel; after ``depth`` sweeps the values are exact.
    """
    has_l = left >= 0
    has_r = right >= 0
    l = jnp.maximum(left, 0)
    r = jnp.maximum(right, 0)
    combine = jnp.minimum if is_min else jnp.maximum

    def init_plane(c):
        v = jnp.where(leaf_mask, leaf_vals[c], old_vals[c])
        return jnp.where(pinned, old_vals[c], v)

    planes = [init_plane(c) for c in range(3)]

    def body(_, planes):
        out = []
        for c in range(3):
            p = planes[c]
            lv = p[l]
            rv = p[r]
            cv = jnp.where(has_r, combine(lv, rv), lv)
            v = jnp.where(leaf_mask, leaf_vals[c], jnp.where(has_l, cv, p))
            out.append(jnp.where(pinned, old_vals[c], v))
        return out

    planes = jax.lax.fori_loop(0, depth, body, planes)
    return planes


@partial(jax.jit, static_argnames=("universal",))
def update_transforms(
    scene: SceneBuffers,
    models: jax.Array,
    prev_models: jax.Array | None = None,
    universal: UniversalSettings = UniversalSettings(),
) -> SceneBuffers:
    """Return a SceneBuffers with new per-instance transforms applied —
    same shapes, same treedef, so downstream jitted render steps do NOT
    retrace. ``models``: (num_instances, 4, 4). ``prev_models`` defaults
    to the scene's current transforms (the two-frame history queue,
    reference src/transform.rs:32-44)."""
    I = scene.num_instances
    P = scene.tri_world.shape[0]
    models = jnp.asarray(models, jnp.float32).reshape(I, 4, 4)
    prev = scene.inst_model if prev_models is None else prev_models
    inv = jnp.linalg.inv(models)
    m16 = models.reshape(I, 16)

    # ---- world triangles from local ----
    ti = jnp.maximum(scene.tri_inst, 0)
    tl = scene.tri_local
    wx, wy, wz = [], [], []
    for k in range(3):
        X, Y, Z = _apply_affine_planes(
            m16, ti, tl[:, k, 0], tl[:, k, 1], tl[:, k, 2]
        )
        wx.append(X)
        wy.append(Y)
        wz.append(Z)
    tri_world = jnp.stack(
        [jnp.stack([wx[k], wy[k], wz[k]], axis=-1) for k in range(3)], axis=1
    )  # (P, 3, 3)

    from hikari_tpu.trace.intersect import precompute_triangles

    pre = precompute_triangles(tri_world)

    # ---- vertex normals: inverse-transpose, normalized ----
    vi = jnp.maximum(scene.vert_inst, 0)
    nrm9 = jnp.transpose(inv[:, :3, :3], (0, 2, 1)).reshape(I, 9)
    nl = scene.vert_normal_local
    NX, NY, NZ = _apply_linear_planes(nrm9, vi, nl[:, 0], nl[:, 1], nl[:, 2])
    nlen = jnp.sqrt(jnp.maximum(NX * NX + NY * NY + NZ * NZ, 1e-24))
    vert_normal = jnp.stack([NX / nlen, NY / nlen, NZ / nlen], axis=-1)

    # ---- instance activity (streaming/visibility mask) ----
    # Inactive instances trace/shade/sample as if absent: their triangles
    # are invalid, their AABBs are EMPTY boxes (min=+MAX, max=-MAX —
    # neutral under the min/max refit and segment reduces, so bounds
    # collapse and traversal skips them), their areas are 0, and their
    # emissive spheres are parked at 1e30 with radius 0 (never contain a
    # shading point, never picked by the light walk).
    active_tri = scene.inst_active[ti] & (scene.tri_inst >= 0)

    # ---- triangle AABB planes ----
    txyz = [wx, wy, wz]
    big = jnp.float32(F32_MAX)
    tmin = {
        c: jnp.where(
            active_tri,
            jnp.minimum(jnp.minimum(txyz[c][0], txyz[c][1]), txyz[c][2]),
            big,
        )
        for c in range(3)
    }
    tmax = {
        c: jnp.where(
            active_tri,
            jnp.maximum(jnp.maximum(txyz[c][0], txyz[c][1]), txyz[c][2]),
            -big,
        )
        for c in range(3)
    }

    # ---- instance AABBs (segment reduce; padded tris -> segment I, dropped)
    seg = jnp.where(scene.tri_inst >= 0, scene.tri_inst, I)
    inst_min = jnp.stack(
        [
            jax.ops.segment_min(tmin[c], seg, num_segments=I + 1)[:I]
            for c in range(3)
        ],
        axis=-1,
    )
    inst_max = jnp.stack(
        [
            jax.ops.segment_max(tmax[c], seg, num_segments=I + 1)[:I]
            for c in range(3)
        ],
        axis=-1,
    )

    # ---- stitched-graph refit ----
    node_min, node_max = scene.node_min, scene.node_max
    if (
        universal.build_mesh_acceleration_structure
        or universal.build_instance_acceleration_structure
    ):
        N = scene.node_entry.shape[0]
        leaf_mask = scene.node_entry < 0
        safe_prim = jnp.clip(-scene.node_entry - 1, 0, P - 1)
        leaf_min = {c: tmin[c][safe_prim] for c in range(3)}
        leaf_max = {c: tmax[c][safe_prim] for c in range(3)}
        is_tlas = jnp.arange(N) < scene.num_tlas_nodes
        pinned = jnp.zeros(N, dtype=bool)
        if not universal.build_mesh_acceleration_structure:
            pinned = pinned | ~is_tlas
        if not universal.build_instance_acceleration_structure:
            pinned = pinned | is_tlas
        old_min = {c: scene.node_min[:, c] for c in range(3)}
        old_max = {c: scene.node_max[:, c] for c in range(3)}
        mins = _refit_planes(
            leaf_min,
            leaf_mask,
            scene.node_left,
            scene.node_right,
            old_min,
            pinned,
            scene.refit_depth,
            is_min=True,
        )
        maxs = _refit_planes(
            leaf_max,
            leaf_mask,
            scene.node_left,
            scene.node_right,
            old_max,
            pinned,
            scene.refit_depth,
            is_min=False,
        )
        node_min = jnp.stack(mins, axis=-1)
        node_max = jnp.stack(maxs, axis=-1)

    # ---- emissives: spheres + surface areas + light-BVH refit ----
    em_position, em_radius = scene.em_position, scene.em_radius
    em_surface_area = scene.em_surface_area
    enode_min, enode_max = scene.enode_min, scene.enode_max
    if scene.num_emissives > 0:
        # Per-triangle world areas (0.5 |e1 x e2|) in planes.
        e1 = [txyz[c][1] - txyz[c][0] for c in range(3)]
        e2 = [txyz[c][2] - txyz[c][0] for c in range(3)]
        cxp = e1[1] * e2[2] - e1[2] * e2[1]
        cyp = e1[2] * e2[0] - e1[0] * e2[2]
        czp = e1[0] * e2[1] - e1[1] * e2[0]
        area = jnp.where(
            active_tri, 0.5 * jnp.sqrt(cxp * cxp + cyp * cyp + czp * czp), 0.0
        )
        inst_area = jax.ops.segment_sum(area, seg, num_segments=I + 1)[:I]

        em_inst = jnp.clip(scene.em_instance, 0, I - 1)
        active_em = scene.inst_active[em_inst]  # (E,)
        # Empty boxes of inactive instances are (+MAX, -MAX): guard the
        # center/diag math behind the activity select.
        e_min = jnp.where(active_em[:, None], inst_min[em_inst], 0.0)
        e_max = jnp.where(active_em[:, None], inst_max[em_inst], 0.0)
        center = 0.5 * (e_min + e_max)  # (E,3)
        diag = e_max - e_min
        emissive = scene.mat_emissive[scene.inst_material[em_inst]]  # (E,4)
        intensity = (
            255.0
            * emissive[:, 3]
            * jnp.linalg.norm(emissive[:, :3], axis=-1)
        )
        # Bounding sphere: 0.5*diag + sqrt(intensity)
        # (reference instance.rs:408-418).
        radius = 0.5 * jnp.linalg.norm(diag, axis=-1) + jnp.sqrt(
            jnp.maximum(intensity, 0.0)
        )
        em_position = jnp.where(active_em[:, None], center, 1e30)
        em_radius = jnp.where(active_em, radius, 0.0)
        em_surface_area = inst_area[em_inst]

        EN = scene.enode_entry.shape[0]
        eleaf = scene.enode_entry < 0
        safe_em = jnp.clip(-scene.enode_entry - 1, 0, scene.num_emissives - 1)
        s_min = center - radius[:, None]
        s_max = center + radius[:, None]
        eleaf_min = {c: s_min[safe_em, c] for c in range(3)}
        eleaf_max = {c: s_max[safe_em, c] for c in range(3)}
        no_pin = jnp.zeros(EN, dtype=bool)
        eold_min = {c: scene.enode_min[:, c] for c in range(3)}
        eold_max = {c: scene.enode_max[:, c] for c in range(3)}
        emins = _refit_planes(
            eleaf_min, eleaf, scene.enode_left, scene.enode_right,
            eold_min, no_pin, scene.erefit_depth, is_min=True,
        )
        emaxs = _refit_planes(
            eleaf_max, eleaf, scene.enode_left, scene.enode_right,
            eold_max, no_pin, scene.erefit_depth, is_min=False,
        )
        enode_min = jnp.stack(emins, axis=-1)
        enode_max = jnp.stack(emaxs, axis=-1)

    return dataclasses.replace(
        scene,
        tri_world=tri_world,
        tri_n=pre["n"],
        tri_eu=pre["eu"],
        tri_ev=pre["ev"],
        tri_cn=pre["cn"],
        tri_cu=pre["cu"],
        tri_cv=pre["cv"],
        tri_valid=pre["valid"] & active_tri,
        vert_normal=vert_normal,
        node_min=node_min,
        node_max=node_max,
        inst_min=inst_min,
        inst_max=inst_max,
        inst_model=models,
        inst_prev_model=prev,
        inst_inv_model=inv,
        em_position=em_position,
        em_radius=em_radius,
        em_surface_area=em_surface_area,
        enode_min=enode_min,
        enode_max=enode_max,
    )


def update_activity(
    scene: SceneBuffers,
    active,
    universal: UniversalSettings = UniversalSettings(),
) -> SceneBuffers:
    """Toggle per-instance visibility / streaming state on device — the
    analogue of the reference's asset streaming (city.rs:23 loads models
    in over time; instance.rs:269-283 retries unready assets) and
    visibility change events (instance.rs:130-175). Instances are
    pre-declared at compile time; flipping ``active`` masks triangles,
    collapses the instance's AABBs out of the BVHs (device refit), zeroes
    its surface areas and parks its emissive sphere — same shapes, same
    treedef, no recompile. ``active``: (num_instances,) bool."""
    scene = dataclasses.replace(
        scene, inst_active=jnp.asarray(active).astype(bool)
    )
    # Re-derive all activity-dependent arrays through the jitted transform
    # update at unchanged transforms (history preserved).
    return update_transforms(
        scene,
        scene.inst_model,
        prev_models=scene.inst_prev_model,
        universal=universal,
    )


class SceneUpdater:
    """Host-side orchestration of dynamic updates — the analogue of the
    reference's change-event systems (instance_event_system,
    src/mesh_material/instance.rs:130-175).

    Holds the host Scene + device SceneBuffers; ``set_transforms`` runs the
    jitted ``update_transforms`` and, matching the reference's alias-table
    cache keyed by transform scale (instance.rs:386-400), rebuilds an
    emissive instance's alias rows on the host ONLY when its linear part
    changed. Material edits (``set_material``) re-upload the small material
    arrays; emissive-set membership changes still need a full
    ``compile_scene`` (the reference likewise rebuilds on asset events).
    """

    def __init__(self, scene, buffers: SceneBuffers,
                 universal: UniversalSettings = UniversalSettings()):
        self.scene = scene
        self.buffers = buffers
        self.universal = universal
        self._linear_cache = {
            i: np.asarray(inst.transform[:3, :3]).copy()
            for i, inst in enumerate(scene.instances)
        }
        # instance id -> emissive slot (for alias rebuilds)
        self._em_slot = {
            int(e): k for k, e in enumerate(np.asarray(buffers.em_instance))
            if int(e) >= 0 and k < buffers.num_emissives
        }

    def set_transforms(self, new_models: dict[int, np.ndarray] | np.ndarray):
        """Apply new transforms. ``new_models``: full (I,4,4) array or a
        sparse {instance_id: 4x4} dict. Returns the updated buffers."""
        models = np.asarray(self.buffers.inst_model).copy()
        if isinstance(new_models, dict):
            for i, m in new_models.items():
                models[i] = np.asarray(m, dtype=np.float32)
        else:
            models = np.asarray(new_models, dtype=np.float32)

        self.buffers = update_transforms(
            self.buffers, jnp.asarray(models), universal=self.universal
        )
        self._maybe_rebuild_alias(models)
        for i, inst in enumerate(self.scene.instances):
            inst.previous_transform = inst.transform
            inst.transform = models[i]
        return self.buffers

    def set_active(self, changes: dict[int, bool]):
        """Stream instances in/out: {instance_id: active}. Device-only
        masking via ``update_activity`` — no recompile, no re-upload."""
        active = np.asarray(self.buffers.inst_active).copy()
        for i, a in changes.items():
            active[i] = bool(a)
        self.buffers = update_activity(
            self.buffers, jnp.asarray(active), universal=self.universal
        )
        return self.buffers

    def _maybe_rebuild_alias(self, models: np.ndarray):
        from hikari_tpu.scene.alias import build_alias_table

        changed_rows = {}
        for inst_id, slot in self._em_slot.items():
            lin = models[inst_id][:3, :3]
            if np.allclose(lin, self._linear_cache[inst_id], atol=1e-7):
                continue
            self._linear_cache[inst_id] = lin.copy()
            inst = self.scene.instances[inst_id]
            mesh = self.scene.meshes[inst.mesh]
            # triangle_areas is mesh-order; the buffers store triangles in
            # BLAS DFS-leaf order (compile_scene) — permute to match so
            # alias_index keeps meaning instance-local PERMUTED prim ids.
            po = int(np.asarray(self.buffers.inst_prim_offset)[inst_id])
            pc = int(np.asarray(self.buffers.inst_prim_count)[inst_id])
            perm = np.asarray(self.buffers.tri_mesh_index)[po : po + pc]
            areas = mesh.triangle_areas(models[inst_id])[perm]
            prob, index = build_alias_table(areas)
            changed_rows[slot] = (prob, index)
        if not changed_rows:
            return
        alias_prob = np.asarray(self.buffers.alias_prob).copy()
        alias_index = np.asarray(self.buffers.alias_index).copy()
        off = np.asarray(self.buffers.em_alias_offset)
        cnt = np.asarray(self.buffers.em_alias_count)
        for slot, (prob, index) in changed_rows.items():
            o, c = int(off[slot]), int(cnt[slot])
            assert c == len(prob), "alias count changed — host recompile needed"
            alias_prob[o : o + c] = prob
            alias_index[o : o + c] = index
        self.buffers = dataclasses.replace(
            self.buffers,
            alias_prob=jnp.asarray(alias_prob),
            alias_index=jnp.asarray(alias_index),
        )

    def set_material(self, mat_id: int, **fields):
        """Update material factors in place (device arrays are tiny).
        Changing emissive INTENSITY is allowed; toggling emissive on/off
        changes the emissive set -> raise (host recompile required)."""
        import dataclasses as dc

        mat = self.scene.materials[mat_id]
        was_emissive = 255.0 * mat.emissive[3] * float(
            np.linalg.norm(mat.emissive[:3])
        ) > 0.0
        for k, v in fields.items():
            setattr(mat, k, v)
        now_emissive = 255.0 * mat.emissive[3] * float(
            np.linalg.norm(mat.emissive[:3])
        ) > 0.0
        if was_emissive != now_emissive:
            raise ValueError(
                "emissive-set membership changed; rebuild with compile_scene"
            )
        b = self.buffers
        upd = {}
        arrmap = {
            "base_color": "mat_base_color",
            "emissive": "mat_emissive",
            "perceptual_roughness": "mat_perceptual_roughness",
            "metallic": "mat_metallic",
            "reflectance": "mat_reflectance",
        }
        for k in fields:
            if k not in arrmap:
                raise KeyError(f"unsupported dynamic material field {k!r}")
            arr = np.asarray(getattr(b, arrmap[k])).copy()
            arr[mat_id] = np.asarray(fields[k], dtype=np.float32)
            upd[arrmap[k]] = jnp.asarray(arr)
        # Emissive factor feeds bounding spheres; re-run the device update
        # with unchanged transforms to refresh spheres/radii.
        self.buffers = dc.replace(b, **upd)
        if "emissive" in fields:
            self.buffers = update_transforms(
                self.buffers, self.buffers.inst_model, universal=self.universal
            )
        return self.buffers

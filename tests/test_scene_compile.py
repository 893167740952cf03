"""Scene compiler integration: stitched node graph reachability, instance
subtree ranges, emissive detection/alias layout (reference pipeline:
src/mesh_material/instance.rs:244-444)."""

import numpy as np

from hikari_tpu.scene import compile_scene, build_scene_buffers


def test_cornell_compile(cornell_scene):
    arrays = compile_scene(cornell_scene)
    P = len(arrays.tri_world)
    N = len(arrays.node_entry)
    I = len(arrays.inst_material)
    assert P > 0 and I >= 6

    # Every triangle is referenced by exactly one leaf of the stitched graph.
    leaf_mask = arrays.node_entry < 0
    prims = -arrays.node_entry[leaf_mask] - 1
    assert sorted(prims.tolist()) == list(range(P))

    # Full walk terminates and visits all nodes.
    seen = np.zeros(N, dtype=bool)
    stack = [0]
    while stack:
        i = stack.pop()
        if i >= N or seen[i]:
            continue
        seen[i] = True
        if arrays.node_entry[i] >= 0:
            stack.append(int(arrays.node_entry[i]))
        stack.append(int(arrays.node_exit[i]))
    assert seen.all()

    # Instance-restricted walks stay within their prim range and terminate.
    for inst in range(I):
        start = int(arrays.inst_blas_start[inst])
        end = int(arrays.inst_blas_end[inst])
        lo = int(arrays.inst_prim_offset[inst])
        hi = lo + int(arrays.inst_prim_count[inst])
        found = set()
        stack = [start]
        visited = set()
        while stack:
            i = stack.pop()
            if i == end or i in visited or i >= N:
                continue
            visited.add(i)
            e = int(arrays.node_entry[i])
            if e < 0:
                p = -e - 1
                assert lo <= p < hi, (inst, p, lo, hi)
                found.add(p)
            else:
                stack.append(e)
            stack.append(int(arrays.node_exit[i]))
        assert found == set(range(lo, hi))

    # The light quad is detected as emissive; alias table covers its tris.
    assert len(arrays.em_instance) == 1
    e = 0
    assert arrays.em_alias_count[e] == arrays.inst_prim_count[arrays.em_instance[e]]
    assert arrays.em_surface_area[e] > 0
    # Radius >= half diag (reference instance.rs:408-418 adds sqrt(intensity))
    inst = arrays.em_instance[e]
    diag = np.linalg.norm(arrays.inst_max[inst] - arrays.inst_min[inst])
    assert arrays.em_radius[e] >= 0.5 * diag


def test_device_buffers(cornell_buffers):
    b = cornell_buffers
    assert b.num_tris > 0
    assert b.tri_world.shape[0] % 128 == 0
    assert b.tri_world.shape[0] >= b.num_tris
    # padded triangles are degenerate
    pad = np.asarray(b.tri_world)[b.num_tris :]
    assert (pad == 0).all()


def test_instance_world_aabbs(cornell_scene):
    arrays = compile_scene(cornell_scene)
    # instance AABBs contain all their triangles
    for i in range(len(arrays.inst_material)):
        lo = int(arrays.inst_prim_offset[i])
        hi = lo + int(arrays.inst_prim_count[i])
        tris = arrays.tri_world[lo:hi].reshape(-1, 3)
        assert (tris >= arrays.inst_min[i] - 1e-4).all()
        assert (tris <= arrays.inst_max[i] + 1e-4).all()


def test_city_reference_scale():
    """Round-2 VERDICT item 7: the City acceptance config must be
    reference-scale geometry (>=500k triangles, many streamable
    instances), not the 3.3k-tri toy fallback."""
    from hikari_tpu.io.scenes import city_config
    from hikari_tpu.scene import build_scene_buffers
    from hikari_tpu.trace.api import trace_rays

    scene, cam, settings = city_config()
    b = build_scene_buffers(scene)
    assert b.num_tris >= 500_000, b.num_tris
    assert len(scene.instances) >= 200
    assert b.num_emissives > 0  # street lamps: emissive channel exercised
    # A few rays actually hit the towers through the BVH walk.
    import jax.numpy as jnp
    import numpy as np

    n = 32
    o = jnp.tile(jnp.asarray([[30.0, 20.0, 30.0]]), (n, 1))
    t = np.stack(
        [np.linspace(-20, 20, n), np.zeros(n) + 5.0, np.linspace(-20, 20, n)],
        axis=-1,
    )
    d = t - np.asarray(o)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    hit = trace_rays(b, o, jnp.asarray(d), method="tiled")
    assert int(jnp.sum(hit.inst >= 0)) > n // 2


def test_texture_atlas_native_resolution():
    """The atlas must preserve native texture detail (round-3 VERDICT
    item 4: the old fixed 256² stack silently decimated FlightHelmet's
    512²+ maps). 1-px stripes at 512² survive only at native res."""
    import jax.numpy as jnp

    from hikari_tpu.render.texture import (
        build_texture_atlas,
        sample_texture_atlas,
    )

    check = np.zeros((512, 512, 4), np.uint8)
    check[::2, :, :3] = 255
    check[..., 3] = 255
    atlas, meta = build_texture_atlas([check])
    assert meta[0, 1] == 512 and meta[0, 2] == 512
    ys = (jnp.arange(8).astype(jnp.float32) + 0.5) / 512.0
    uv = jnp.stack([jnp.full((8,), 0.3), ys], axis=-1)
    out = sample_texture_atlas(
        jnp.asarray(atlas), jnp.asarray(meta), jnp.zeros((8,), jnp.int32), uv
    )
    np.testing.assert_allclose(
        np.asarray(out[..., 0]), [1, 0, 1, 0, 1, 0, 1, 0], atol=1e-3
    )
    # id -1 = white (reference NO_TEXTURE semantics)
    out2 = sample_texture_atlas(
        jnp.asarray(atlas), jnp.asarray(meta),
        jnp.full((8,), -1, jnp.int32), uv,
    )
    np.testing.assert_allclose(np.asarray(out2), 1.0)

"""Exact-RNG parity bank + glTF triangle-strip topology.

The reference embeds 16 blue-noise PNGs (src/lib.rs:189-219) and
triangulates TriangleStrip meshes with alternating winding
(src/mesh_material/mod.rs:433-452).
"""

import base64
import json
import os

import numpy as np
import pytest

REFERENCE_NOISE = "/root/reference/src/noise"


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE_NOISE), reason="reference checkout absent"
)
def test_reference_noise_bank_shape_and_range():
    from hikari_tpu.render.noise import reference_noise_bank

    bank = reference_noise_bank()
    assert bank.shape == (16, 64, 64, 4)
    assert bank.dtype == np.float32
    assert bank.min() >= 0.0 and bank.max() <= 1.0
    # LDR blue noise is close to uniform per channel: mean ~0.5.
    means = bank.mean(axis=(1, 2))
    assert np.all(np.abs(means - 0.5) < 0.05), means
    # The 16 textures are distinct.
    assert len({bank[i].tobytes() for i in range(16)}) == 16


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE_NOISE), reason="reference checkout absent"
)
def test_reference_noise_sampling_matches_texture_fetch():
    """sample_noise must reproduce the reference's nearest/repeat fetch:
    uv = (pixel + frame + 0.5)/64 (light.wgsl:1075-1078)."""
    import jax.numpy as jnp

    from hikari_tpu.render.noise import reference_noise_bank, sample_noise

    bank = reference_noise_bank()
    frame = jnp.asarray(7, dtype=jnp.int32)
    ys = jnp.asarray([0, 1, 63, 100])
    xs = jnp.asarray([0, 5, 63, 200])
    got = np.asarray(sample_noise(bank, frame, ys, xs))
    want = np.stack(
        [bank[7 % 16, (y + 7) % 64, (x + 7) % 64] for y, x in [(0, 0), (1, 5), (63, 63), (100, 200)]]
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_gltf_triangle_strip_mode():
    """mode=5 primitives triangulate with alternating winding."""
    from hikari_tpu.io.gltf import load_gltf

    # 4 vertices in a strip -> 2 triangles: [0,1,2], [2,1,3].
    pos = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], dtype=np.float32
    )
    blob = pos.tobytes()
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [
            {
                "primitives": [
                    {"attributes": {"POSITION": 0}, "mode": 5}
                ]
            }
        ],
        "accessors": [
            {
                "bufferView": 0,
                "componentType": 5126,
                "count": 4,
                "type": "VEC3",
            }
        ],
        "bufferViews": [{"buffer": 0, "byteOffset": 0, "byteLength": len(blob)}],
        "buffers": [
            {
                "byteLength": len(blob),
                "uri": "data:application/octet-stream;base64,"
                + base64.b64encode(blob).decode(),
            }
        ],
    }
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "strip.gltf")
        with open(path, "w") as f:
            json.dump(gltf, f)
        scene = load_gltf(path)
    mesh = scene.meshes[0]
    assert mesh.num_triangles == 2
    # Reference winding: even id -> [v0,v1,v2]; odd id -> [v1,v0,v2]
    # over windows (0,1,2), (1,2,3) => [[0,1,2],[2,1,3]].
    np.testing.assert_array_equal(mesh.indices, [[0, 1, 2], [2, 1, 3]])

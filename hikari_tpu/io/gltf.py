"""Minimal glTF 2.0 (.glb / .gltf) loader -> hikari_tpu Scene.

Plays the role of Bevy's glTF asset pipeline feeding the reference's scene
compile (examples/cornell.rs:39-42, examples/scene.rs:78-81 load glb scenes).
Supports: binary GLB and JSON glTF with external/.bin or data-URI buffers,
node hierarchies with TRS or matrix transforms, indexed/unindexed
triangle-list and triangle-strip primitives, pbrMetallicRoughness materials
with textures, KHR emissive_strength.
"""

from __future__ import annotations

import base64
import json
import os
import struct

import numpy as np

from hikari_tpu.scene.compile import Instance, Material, Scene
from hikari_tpu.scene.mesh import Mesh

_COMPONENT_DTYPE = {
    5120: np.int8,
    5121: np.uint8,
    5122: np.int16,
    5123: np.uint16,
    5125: np.uint32,
    5126: np.float32,
}
_TYPE_COUNT = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4, "MAT4": 16}


def _load_chunks(path: str) -> tuple[dict, list[bytes]]:
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] == b"glTF":
        magic, version, length = struct.unpack_from("<III", data, 0)
        off = 12
        gltf = None
        bin_chunk = b""
        while off < length:
            clen, ctype = struct.unpack_from("<II", data, off)
            off += 8
            chunk = data[off : off + clen]
            off += clen
            if ctype == 0x4E4F534A:  # JSON
                gltf = json.loads(chunk)
            elif ctype == 0x004E4942:  # BIN
                bin_chunk = chunk
        buffers = _resolve_buffers(gltf, os.path.dirname(path), bin_chunk)
        return gltf, buffers
    gltf = json.loads(data)
    return gltf, _resolve_buffers(gltf, os.path.dirname(path), b"")


def _resolve_buffers(gltf: dict, base_dir: str, bin_chunk: bytes) -> list[bytes]:
    out = []
    for buf in gltf.get("buffers", []):
        uri = buf.get("uri")
        if uri is None:
            out.append(bin_chunk)
        elif uri.startswith("data:"):
            out.append(base64.b64decode(uri.split(",", 1)[1]))
        else:
            with open(os.path.join(base_dir, uri), "rb") as f:
                out.append(f.read())
    return out


def _read_accessor(gltf: dict, buffers: list[bytes], idx: int) -> np.ndarray:
    acc = gltf["accessors"][idx]
    view = gltf["bufferViews"][acc["bufferView"]]
    dtype = _COMPONENT_DTYPE[acc["componentType"]]
    ncomp = _TYPE_COUNT[acc["type"]]
    count = acc["count"]
    itemsize = np.dtype(dtype).itemsize * ncomp
    stride = view.get("byteStride", itemsize)
    offset = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
    raw = buffers[view["buffer"]]
    if stride == itemsize:
        arr = np.frombuffer(raw, dtype=dtype, count=count * ncomp, offset=offset)
    else:
        rows = [
            np.frombuffer(raw, dtype=dtype, count=ncomp, offset=offset + i * stride)
            for i in range(count)
        ]
        arr = np.concatenate(rows)
    return arr.reshape(count, ncomp) if ncomp > 1 else arr


def _node_matrix(node: dict) -> np.ndarray:
    if "matrix" in node:
        return np.asarray(node["matrix"], dtype=np.float32).reshape(4, 4).T
    m = np.eye(4, dtype=np.float32)
    t = node.get("translation", [0, 0, 0])
    q = node.get("rotation", [0, 0, 0, 1])  # x, y, z, w
    s = node.get("scale", [1, 1, 1])
    x, y, z, w = q
    rot = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ],
        dtype=np.float32,
    )
    m[:3, :3] = rot * np.asarray(s, dtype=np.float32)[None, :]
    m[:3, 3] = t
    return m


def _convert_material(gmat: dict, tex_id) -> Material:
    pbr = gmat.get("pbrMetallicRoughness", {})
    base_color = tuple(pbr.get("baseColorFactor", [1, 1, 1, 1]))
    metallic = pbr.get("metallicFactor", 1.0)
    roughness = pbr.get("roughnessFactor", 1.0)
    emissive_rgb = gmat.get("emissiveFactor", [0, 0, 0])
    strength = (
        gmat.get("extensions", {})
        .get("KHR_materials_emissive_strength", {})
        .get("emissiveStrength", 1.0)
    )
    # Bevy maps emissiveFactor -> StandardMaterial.emissive with alpha 1;
    # the reference's radiance scale is 255*a*rgb (light.wgsl:594-596).
    emissive = (*[c * strength for c in emissive_rgb], 1.0)

    def slot(info):
        return tex_id(info["index"]) if info is not None else -1

    return Material(
        base_color=base_color,
        emissive=emissive,
        perceptual_roughness=roughness,
        metallic=metallic,
        reflectance=0.5,
        base_color_texture=slot(pbr.get("baseColorTexture")),
        emissive_texture=slot(gmat.get("emissiveTexture")),
        metallic_roughness_texture=slot(pbr.get("metallicRoughnessTexture")),
        normal_map_texture=slot(gmat.get("normalTexture")),
        occlusion_texture=slot(gmat.get("occlusionTexture")),
    )


def load_gltf(path: str, scene: Scene | None = None) -> Scene:
    """Load a .glb/.gltf file, appending its default scene into ``scene``."""
    gltf, buffers = _load_chunks(path)
    out = scene if scene is not None else Scene(materials=[])

    mat_ids = {}
    tex_cache: dict[int, int] = {}
    base_dir = os.path.dirname(path)

    def tex_id(gltf_texture_idx: int) -> int:
        """glTF texture index -> scene texture id (decoded + cached)."""
        if gltf_texture_idx in tex_cache:
            return tex_cache[gltf_texture_idx]
        tid = -1
        try:
            from io import BytesIO

            from PIL import Image

            source = gltf["textures"][gltf_texture_idx].get("source")
            img = gltf["images"][source]
            if "bufferView" in img:
                view = gltf["bufferViews"][img["bufferView"]]
                off = view.get("byteOffset", 0)
                raw = buffers[view["buffer"]][off : off + view["byteLength"]]
                pil = Image.open(BytesIO(raw))
            elif "uri" in img and not img["uri"].startswith("data:"):
                pil = Image.open(os.path.join(base_dir, img["uri"]))
            elif "uri" in img:
                pil = Image.open(
                    BytesIO(base64.b64decode(img["uri"].split(",", 1)[1]))
                )
            else:
                raise ValueError("image without source")
            arr = np.asarray(pil.convert("RGBA"))
            tid = out.add_texture(arr)
        except Exception:
            tid = -1  # graceful degradation like the fallback image
            # path in the reference (src/lib.rs:528-534)
        tex_cache[gltf_texture_idx] = tid
        return tid

    def material_id(idx: int | None) -> int:
        if idx not in mat_ids:
            mat = (
                _convert_material(gltf["materials"][idx], tex_id)
                if idx is not None
                else Material()
            )
            mat_ids[idx] = out.add_material(mat)
        return mat_ids[idx]

    # mesh+primitive -> hikari mesh id (each glTF primitive = one Mesh)
    prim_cache: dict[tuple[int, int], tuple[int, int]] = {}

    def mesh_prims(mesh_idx: int) -> list[tuple[int, int]]:
        prims = []
        for pi, prim in enumerate(gltf["meshes"][mesh_idx]["primitives"]):
            key = (mesh_idx, pi)
            if key not in prim_cache:
                attrs = prim["attributes"]
                pos = _read_accessor(gltf, buffers, attrs["POSITION"]).astype(
                    np.float32
                )
                if "NORMAL" in attrs:
                    nrm = _read_accessor(gltf, buffers, attrs["NORMAL"]).astype(
                        np.float32
                    )
                else:
                    nrm = np.zeros_like(pos)
                if "TEXCOORD_0" in attrs:
                    uv = _read_accessor(gltf, buffers, attrs["TEXCOORD_0"]).astype(
                        np.float32
                    )
                else:
                    uv = np.zeros((len(pos), 2), dtype=np.float32)
                mode = prim.get("mode", 4)  # 4=TRIANGLES, 5=TRIANGLE_STRIP
                if "indices" in prim:
                    idx = _read_accessor(gltf, buffers, prim["indices"]).astype(
                        np.int32
                    )
                else:
                    idx = np.arange(len(pos), dtype=np.int32)
                if mode == 5:
                    # Alternating-winding strip triangulation, matching
                    # GpuMesh::try_from's TriangleStrip arm
                    # (src/mesh_material/mod.rs:433-452).
                    mesh = Mesh.from_triangle_strip(pos, nrm, uv, idx.reshape(-1))
                elif mode == 4:
                    mesh = Mesh(pos, nrm, uv, idx.reshape(-1, 3))
                else:
                    # IncompatiblePrimitiveTopology (mod.rs:451)
                    raise ValueError(f"unsupported glTF primitive mode {mode}")
                mesh_id = out.add_mesh(mesh)
                prim_cache[key] = (mesh_id, material_id(prim.get("material")))
            prims.append(prim_cache[key])
        return prims

    def walk(node_idx: int, parent: np.ndarray):
        node = gltf["nodes"][node_idx]
        m = parent @ _node_matrix(node)
        if "mesh" in node:
            for mesh_id, mat_id in mesh_prims(node["mesh"]):
                out.add_instance(Instance(mesh=mesh_id, material=mat_id, transform=m))
        for child in node.get("children", []):
            walk(child, m)

    scene_idx = gltf.get("scene", 0)
    roots = gltf["scenes"][scene_idx]["nodes"]
    for r in roots:
        walk(r, np.eye(4, dtype=np.float32))
    return out
